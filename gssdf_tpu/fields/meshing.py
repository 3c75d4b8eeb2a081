"""SDF -> mesh extraction with occupancy masking and normal colors.

Reference analog: ``LocalMap::meshing_`` (local_map.cpp:329-447): x-slab
chunking sized by the vis batch budget, octree valid-mask (points outside
default to sdf 1e-6), marching cubes, boundary-artifact filter via the
27-neighbor valid mask, vertex colors from SDF normals; and
``mesher::Mesher::cull_mesh`` (mesher.cpp:76-160) frustum/depth culling.
"""

from __future__ import annotations

import functools
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.marching import compact_mesh, marching_tets
from .occupancy import OccupancyGrid, valid_mask
from .sdf_field import MapGeometry, SDFFieldSpec, sdf_apply, sdf_gradient_numerical

_OUTSIDE_SDF = 1e-6  # default for unobserved space (local_map.cpp:381)
# per-slab on-device triangle compaction capacity (see extract_mesh);
# module-level so tests can force the overflow fallback
_TRI_CAP = 1 << 16
# cap on the occupancy-compacted SDF eval bucket; module-level so tests can
# force the compacted branch (bucket < slab_elems) and the nv-overflow redo
_BUCKET_CAP = 1 << 18
# x-slabs extracted per fused device call (one host round-trip per batch)
_SLABS_PER_CALL = 8
# per-call marching cell budget: marching_tets temps pad to ~40 KB/cell on
# TPU (tiny trailing dims on the (8, 128) tile); module-level so tests can
# force the y-banded path
_CELL_BUDGET = 50_000


def extract_mesh(
    sdf_params,
    geom: MapGeometry,
    spec: SDFFieldSpec,
    grid: OccupancyGrid,
    resolution: float,
    bounds_lo: Optional[np.ndarray] = None,
    bounds_hi: Optional[np.ndarray] = None,
    slab_voxels: int = 64,
    with_colors: bool = True,
    _band: bool = True,   # internal: band recursion must not re-band
) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
    """Marching over the map cube at ``resolution``; returns
    (verts [V, 3] world, faces [F, 3], colors [V, 3] float 0-1)."""
    half = 0.5 * geom.map_size
    o = np.asarray(geom.origin)
    lo = o - half if bounds_lo is None else np.asarray(bounds_lo)
    hi = o + half if bounds_hi is None else np.asarray(bounds_hi)

    nx, ny, nz = [max(2, int(np.ceil((hi[i] - lo[i]) / resolution)) + 1)
                  for i in range(3)]
    # Bound per-call CELL count (_CELL_BUDGET). marching_tets materializes
    # [cells, 6, 2, 3, 3]-shaped temps whose tiny trailing dims pad to the
    # (8, 128) TPU tile — ~40 KB per cell of padded HLO temps (a
    # 409,600-cell slab compiled to a 16.94 GB program and OOM'd the final
    # reference-res export; the r04 run log has the buffer dump). ~50k
    # cells keeps the marching temps around 2 GB.
    # When ONE x-layer already exceeds the budget (reference-resolution
    # exports: 641x641 layers), band the Y axis and recurse per band with
    # a one-voxel overlap — same per-band grid coordinates up to f64
    # rounding of the band origin; bands concatenate like x-slabs do
    # (vertex weld is per-slab already, so no cross-band weld regression).
    if _band and (ny - 1) * (nz - 1) > _CELL_BUDGET:
        band = max(2, _CELL_BUDGET // max(nz - 1, 1))     # y voxels/band
        parts: list = []
        y0 = 0
        while y0 < ny - 1:
            yn = min(band, ny - 1 - y0) + 1
            b_lo = lo.copy()
            b_lo[1] = lo[1] + y0 * resolution
            b_hi = hi.copy()
            b_hi[1] = lo[1] + (y0 + yn - 1) * resolution
            # _band=False: fp rounding of band bounds can recompute ny one
            # voxel larger inside the recursion and re-trigger banding
            # forever (hit on the first chip run of this path); a band is
            # within ~1 layer of the budget by construction, so extract it
            # directly
            v, f, c = extract_mesh(
                sdf_params, geom, spec, grid, resolution,
                bounds_lo=b_lo, bounds_hi=b_hi,
                slab_voxels=slab_voxels, with_colors=False,
                _band=False,
            )
            if len(v):
                parts.append((v, f))
            y0 += yn - 1                                   # 1-voxel overlap
        if not parts:
            return (
                np.zeros((0, 3), np.float32),
                np.zeros((0, 3), np.int32),
                np.zeros((0, 3), np.float32),
            )
        nv = 0
        vs, fs = [], []
        for v, f in parts:
            vs.append(v)
            fs.append(f + nv)
            nv += len(v)
        verts = np.concatenate(vs)
        faces = np.concatenate(fs)
        if with_colors:
            colors = _normal_colors(sdf_params, geom, spec, verts, resolution)
        else:
            colors = np.full((len(verts), 3), 0.7, np.float32)
        return verts, faces, colors

    slab_voxels = int(
        max(2, min(slab_voxels, 1 + _CELL_BUDGET // ((ny - 1) * (nz - 1))))
    )

    ys = lo[1] + np.arange(ny) * resolution
    zs = lo[2] + np.arange(nz) * resolution
    # single source of truth for slab x sample positions: the fused path and
    # the dense fallback MUST evaluate the SDF at bit-identical float32
    # coordinates, or 1-ULP differences shift iso-crossing interpolation and
    # flip compact_mesh's quantized weld keys (overflow fallback then drops
    # vertices the fused path kept)
    xs_all = (lo[0] + np.arange(nx) * resolution).astype(np.float32)
    xs_all_j = jnp.asarray(xs_all)

    march = jax.jit(functools.partial(marching_tets, iso=0.0))
    ys_j = jnp.asarray(ys, jnp.float32)
    zs_j = jnp.asarray(zs, jnp.float32)

    def slab_pts(xs_j):
        gx, gy, gz = jnp.meshgrid(xs_j, ys_j, zs_j, indexing="ij")
        return jnp.stack([gx, gy, gz], -1).reshape(-1, 3)

    @jax.jit
    def slab_mask(xs_j):
        vm = valid_mask(grid, slab_pts(xs_j))
        return vm, jnp.sum(vm)

    @jax.jit
    def eval_full(xs_j, vm):
        pts = slab_pts(xs_j)
        sdf = sdf_apply(sdf_params, pts, geom, spec)[0][:, 0]
        sdf = jnp.where(vm, sdf, _OUTSIDE_SDF)
        return sdf.reshape(xs_j.shape[0], ny, nz)

    tri_cap = _TRI_CAP

    def slab_dense(xs0, xn):
        """Single-slab fallback: dense eval + dense triangle pull. Used for
        the partial tail slab and for fused-path overflows."""
        xs_j = jnp.asarray(xs_all[xs0 : xs0 + xn])
        vm, nv = slab_mask(xs_j)
        if int(nv) == 0:
            return None
        sdf_grid = eval_full(xs_j, vm)
        vm_grid = vm.reshape(xn, ny, nz)
        tri, mask = march(sdf_grid, corner_valid=vm_grid)
        return compact_mesh(
            np.asarray(tri), np.asarray(mask),
            lower=(lo[0] + xs0 * resolution, lo[1], lo[2]),
            res=resolution,
        )

    # Batched fused extraction: ONE jitted call per _SLABS_PER_CALL slabs
    # runs mask -> occupancy-compacted SDF eval (only the observed
    # truncation band is valid — typically <10% of grid points at export
    # resolution, and the hash-grid gather dominates eval cost) -> marching
    # tets -> on-device triangle compaction under a lax.map, returning only
    # the compacted triangles. The previous per-slab loop cost ~3 host
    # round-trips per slab through the tunnel (mask-count sync, eval
    # dispatch, ~100 MB dense triangle pull) — at 512 budget-resolution
    # slabs the RTTs and transfers alone were minutes. One fixed bucket
    # means one compile. Overflows (valid points > bucket, triangles >
    # cap) are detected from the returned counts and redone densely.
    slab_elems = slab_voxels * ny * nz
    bucket = min(_BUCKET_CAP, 1 << int(np.ceil(np.log2(slab_elems))))

    @jax.jit
    def fused_batch(starts):       # [K] int32 x-start voxel indices
        def one(xs0):
            xs_j = jax.lax.dynamic_slice(xs_all_j, (xs0,), (slab_voxels,))
            pts = slab_pts(xs_j)
            vm = valid_mask(grid, pts)
            nv = jnp.sum(vm)
            if bucket < slab_elems:
                idx = jnp.nonzero(vm, size=bucket,
                                  fill_value=pts.shape[0])[0]
                sdf_c = sdf_apply(
                    sdf_params, pts[jnp.minimum(idx, pts.shape[0] - 1)],
                    geom, spec,
                )[0][:, 0]
                in_r = jnp.arange(bucket) < nv
                sdf = jnp.full((pts.shape[0],), _OUTSIDE_SDF, jnp.float32)
                sdf = sdf.at[jnp.where(in_r, idx, pts.shape[0])].set(
                    sdf_c, mode="drop"
                )
            else:
                sdf = jnp.where(
                    vm, sdf_apply(sdf_params, pts, geom, spec)[0][:, 0],
                    _OUTSIDE_SDF,
                )
            sdf_grid = sdf.reshape(slab_voxels, ny, nz)
            vm_grid = vm.reshape(slab_voxels, ny, nz)
            # corner_valid: cells touching unobserved space emit no
            # triangles (replaces the reference's post-hoc 27-neighbor
            # vertex filter, local_map.cpp:410-417, which is fragile when
            # the surface grazes a voxel face)
            tri, mask = marching_tets(sdf_grid, iso=0.0,
                                      corner_valid=vm_grid)
            count = jnp.sum(mask)
            tidx = jnp.nonzero(mask, size=tri_cap, fill_value=0)[0]
            return (tri[tidx], jnp.arange(tri_cap) < count, count, nv)
        return jax.lax.map(one, starts)

    all_verts, all_faces, n_verts = [], [], 0
    # overlap slabs by one voxel layer so surfaces crossing slab borders close
    x_starts = list(range(0, nx - 1, slab_voxels - 1))
    main_starts = [s for s in x_starts
                   if min(slab_voxels, nx - s) == slab_voxels]
    tail_starts = [s for s in x_starts
                   if 2 <= min(slab_voxels, nx - s) < slab_voxels]
    # progress bar per slab batch (reference: tq::trange "Marching Cubes",
    # local_map.cpp:237-239)
    from ..utils.progress import ProgressBar

    K = _SLABS_PER_CALL
    batches = [main_starts[i : i + K] for i in range(0, len(main_starts), K)]
    results = []   # (xs0, verts, faces) in x order

    for batch in ProgressBar(batches, prefix="Marching Tets"):
        starts = np.asarray(batch, np.int32)
        padded = np.concatenate(
            [starts, np.repeat(starts[-1:], K - len(starts))]
        )
        tris, oks, counts, nvs = (
            np.asarray(a) for a in fused_batch(jnp.asarray(padded))
        )
        for j, xs0 in enumerate(batch):
            if nvs[j] == 0:
                continue   # fully unobserved slab: no surface
            if nvs[j] > bucket or counts[j] > tri_cap:
                r = slab_dense(xs0, slab_voxels)   # overflow: redo densely
            elif counts[j] == 0:
                continue   # observed but no iso crossing in this slab
            else:
                r = compact_mesh(
                    tris[j], oks[j],
                    lower=(lo[0] + xs0 * resolution, lo[1], lo[2]),
                    res=resolution,
                )
            if r is None or len(r[0]) == 0:
                continue
            results.append((xs0, r[0], r[1]))

    for xs0 in tail_starts:
        r = slab_dense(xs0, nx - xs0)
        if r is not None and len(r[0]) > 0:
            results.append((xs0, r[0], r[1]))

    for _, verts, faces in sorted(results, key=lambda t: t[0]):
        all_verts.append(verts)
        all_faces.append(faces + n_verts)
        n_verts += len(verts)

    if not all_verts:
        return (
            np.zeros((0, 3), np.float32),
            np.zeros((0, 3), np.int32),
            np.zeros((0, 3), np.float32),
        )
    verts = np.concatenate(all_verts)
    faces = np.concatenate(all_faces)

    if with_colors:
        colors = _normal_colors(sdf_params, geom, spec, verts, resolution)
    else:
        colors = np.full((len(verts), 3), 0.7, np.float32)
    return verts, faces, colors


def _normal_colors(sdf_params, geom, spec, verts, delta, chunk=1 << 14):
    """Vertex colors = 0.5 * (normal + 1) (local_map.cpp:421-435)."""
    out = []
    fn = jax.jit(
        lambda x: sdf_gradient_numerical(
            sdf_params, x, geom, spec, delta, with_hessian=False
        )[0]
    )
    for i in range(0, len(verts), chunk):
        g = np.asarray(fn(jnp.asarray(verts[i : i + chunk])))
        n = g / np.maximum(np.linalg.norm(g, axis=-1, keepdims=True), 1e-9)
        out.append(0.5 * (n + 1.0))
    return np.concatenate(out).astype(np.float32)


def cull_mesh_by_depth(
    verts: np.ndarray,
    faces: np.ndarray,
    cameras_K: np.ndarray,        # [3, 3]
    poses_c2w: np.ndarray,        # [N, 4, 4]
    depth_maps: list,             # list of [H, W, 1] float arrays (may be None)
    width: int,
    height: int,
    tolerance: float = 0.02,
) -> np.ndarray:
    """Keep-vertex mask: visible in >=1 frustum and not occluded by more than
    ``tolerance`` behind the measured depth (mesher.cpp:76-160)."""
    keep = np.zeros(len(verts), bool)
    K = np.asarray(cameras_K)
    from ..utils.progress import ProgressBar

    # reference: tq::trange "Culling mesh" (mesher.cpp:109-112)
    for pose, depth in ProgressBar(
        list(zip(poses_c2w, depth_maps)), prefix="Culling mesh"
    ):
        w2c = np.linalg.inv(pose)
        pc = verts @ w2c[:3, :3].T + w2c[:3, 3]
        z = pc[:, 2]
        front = z > 1e-6
        u = K[0, 0] * pc[:, 0] / np.where(front, z, 1.0) + K[0, 2]
        v = K[1, 1] * pc[:, 1] / np.where(front, z, 1.0) + K[1, 2]
        inside = front & (u >= 0) & (u < width) & (v >= 0) & (v < height)
        if depth is None:
            keep |= inside
            continue
        ui = np.clip(u.astype(np.int64), 0, width - 1)
        vi = np.clip(v.astype(np.int64), 0, height - 1)
        d = depth[vi, ui, 0]
        keep |= inside & (z < d + tolerance)
    return keep


def apply_vertex_mask(verts, faces, colors, keep_mask):
    """Drop faces touching removed vertices, reindex."""
    keep_face = keep_mask[faces].all(axis=1)
    faces = faces[keep_face]
    used = np.unique(faces) if len(faces) else np.zeros(0, np.int64)
    remap = -np.ones(len(verts), np.int64)
    remap[used] = np.arange(len(used))
    return (
        verts[used],
        remap[faces].astype(np.int32) if len(faces) else faces,
        colors[used] if colors is not None else None,
    )
