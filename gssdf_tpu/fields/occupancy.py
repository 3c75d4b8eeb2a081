"""Dense bit-packed occupancy grid + ray marching sampler.

Reference analog: the kaolin-wisp SPC octree (SubMap::update_octree_as,
sub_map.cpp:22-35; OctreeAS::raymarch/query used at local_map.cpp:449-516).

TPU-first redesign (SURVEY.md §2.2): the scene is a single cube of
``2^level`` voxels (level <= ~10), so a sparse octree buys nothing on TPU —
a dense bit-packed uint32 grid (512^3 -> 16 MiB) supports O(1) vectorized
query, and ray marching becomes fixed-step jittered sampling with masked
fixed-capacity compaction (jit-stable shapes) instead of a dynamic-length
sample pack.

The grid is built host-side once (numpy + scipy dilation = the reference's
``points_to_neighbors`` 27-neighborhood, sub_map.cpp:26-34) and shipped to
device.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .sdf_field import MapGeometry


_COARSE_BLOCK = 8  # fine voxels per coarse-block edge (two-level raymarch)


@dataclass
class OccupancyGrid:
    packed: jnp.ndarray      # [R, R, R//32] uint32, bit k of word = voxel z=k
    packed_core: jnp.ndarray  # erosion of packed: all 27 neighbors occupied
    packed_coarse: jnp.ndarray  # [Rc, Rc, Rc//32] max-pool by _COARSE_BLOCK
    resolution: int
    geom: MapGeometry

    @property
    def leaf(self) -> float:
        return self.geom.map_size / self.resolution

    @property
    def coarse_resolution(self) -> int:
        return self.resolution // _COARSE_BLOCK


def _pack_bits(grid: np.ndarray) -> np.ndarray:
    """[R, R, R] bool -> [R, R, R//32] uint32 (z packed into bits)."""
    r = grid.shape[-1]
    pad = (-r) % 32
    if pad:
        grid = np.pad(grid, ((0, 0), (0, 0), (0, pad)))
    b = grid.reshape(grid.shape[0], grid.shape[1], -1, 32).astype(np.uint32)
    shifts = np.arange(32, dtype=np.uint32)
    return (b << shifts).sum(axis=-1, dtype=np.uint32)


def build_occupancy_grid(
    points: np.ndarray,
    geom: MapGeometry,
    resolution: int,
    dilate: bool = True,
) -> OccupancyGrid:
    """Quantize world points into the cube, optionally dilating by the
    27-neighborhood (the reference's non-prior build, sub_map.cpp:29-34)."""
    from scipy import ndimage

    pts = np.asarray(points, dtype=np.float64)
    zp1 = (pts - np.asarray(geom.origin)) / geom.map_size + 0.5
    vox = np.floor(zp1 * resolution).astype(np.int64)
    inside = np.all((vox >= 0) & (vox < resolution), axis=-1)
    vox = vox[inside]
    grid = np.zeros((resolution,) * 3, dtype=bool)
    grid[vox[:, 0], vox[:, 1], vox[:, 2]] = True
    if dilate:
        grid = ndimage.binary_dilation(grid, structure=np.ones((3, 3, 3), bool))
    # "core" voxels: every one of the 27 neighbors occupied — used by the
    # meshing boundary-artifact filter (local_map.cpp:410-417)
    core = ndimage.binary_erosion(
        grid, structure=np.ones((3, 3, 3), bool), border_value=0
    )
    # coarse max-pool for the two-level march (the empty-space skip the
    # reference gets from the kaolin SPC octree hierarchy)
    b = _COARSE_BLOCK
    rc = resolution // b
    coarse = grid[: rc * b, : rc * b, : rc * b].reshape(
        rc, b, rc, b, rc, b
    ).any(axis=(1, 3, 5))
    return OccupancyGrid(
        packed=jnp.asarray(_pack_bits(grid)),
        packed_core=jnp.asarray(_pack_bits(core)),
        packed_coarse=jnp.asarray(_pack_bits(coarse)),
        resolution=resolution,
        geom=geom,
    )


def occupancy_query(
    grid_packed: jnp.ndarray,
    resolution: int,
    geom: MapGeometry,
    xyz: jnp.ndarray,
) -> jnp.ndarray:
    """[N, 3] world points -> bool occupied (OctreeAS::query analog,
    sub_map.cpp:77-81). Out-of-cube points are unoccupied."""
    zp1 = geom.xyz_to_zp1(xyz)
    vox = jnp.floor(zp1 * resolution).astype(jnp.int32)
    inside = jnp.all((vox >= 0) & (vox < resolution), axis=-1)
    vox = jnp.clip(vox, 0, resolution - 1)
    word = grid_packed[vox[..., 0], vox[..., 1], vox[..., 2] >> 5]
    bit = (word >> (vox[..., 2] & 31).astype(jnp.uint32)) & jnp.uint32(1)
    return (bit == 1) & inside


def valid_mask(grid: OccupancyGrid, xyz: jnp.ndarray, core: bool = False):
    packed = grid.packed_core if core else grid.packed
    return occupancy_query(packed, grid.resolution, grid.geom, xyz)


def _rank_compact(mask, vals, cap, fill=0.0):
    """First ``cap`` True entries per row, in order: [N, S] -> [N, cap]."""
    n = mask.shape[0]
    order = jnp.cumsum(mask, axis=1)  # 1-based rank among hits
    keep = mask & (order <= cap)
    slot = jnp.where(keep, order - 1, cap)  # dump overflow in slot `cap`
    out = jnp.full((n, cap + 1), fill, dtype=vals.dtype)
    out = out.at[jnp.arange(n)[:, None], slot].set(
        jnp.where(keep, vals, fill), mode="drop"
    )
    count = jnp.minimum(order[:, -1], cap)
    outm = jnp.arange(cap, dtype=jnp.int32)[None, :] < count[:, None]
    return out[:, :cap], outm


def raymarch(
    grid: OccupancyGrid,
    origins: jnp.ndarray,      # [N, 3]
    dirs: jnp.ndarray,         # [N, 3] unit
    t_max: jnp.ndarray,        # [N, 1] march no further than this (ray depth)
    key: jax.Array,
    max_steps: int,
    max_hits: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Two-level jittered march through occupied voxels.

    Level 1 probes the COARSE block grid (max-pool of _COARSE_BLOCK^3
    voxels) at half-block spacing and keeps the first ``max_hits`` occupied
    blocks; level 2 marches leaf-sized jittered steps only across those
    blocks' ray spans (AABB slab bounds). The coarse stage keeps
    ``max_blocks = 1.5 * max_hits`` blocks (a coarse cell is an 8^3 max-pool,
    so a ray can cross an "occupied" block while touching only empty fine
    voxels — extra block slots keep such false positives from starving
    later hits). This is the TPU dense-grid analog
    of the reference's sparse-octree empty-space skip (OctreeAS::raymarch
    "voxel" mode, local_map.cpp:467-475): per-voxel sampling density matches
    the single-level fixed-step march in expectation, at ~1/2 the occupancy
    lookups of a full-range leaf-step march (TPU gathers cost per ROW, so
    lookup count is the whole cost). Blocks whose ray segment is shorter
    than the half-block probe spacing can be missed stochastically — the
    same corner-clipping behavior a jittered fixed-step march has at leaf
    scale.

    Returns (t_hits [N, max_hits], hit_mask [N, max_hits]) — fixed shapes,
    first ``max_hits`` occupied-voxel crossings in front of ``t_max``.
    """
    n = origins.shape[0]
    leaf = grid.leaf
    b = _COARSE_BLOCK
    bsize = b * leaf
    rc = grid.coarse_resolution
    kc, kf = jax.random.split(key)

    # ---- level 1: coarse block probes at half-block spacing -------------
    sc = -(-(max_steps * 2) // b)
    jit_c = jax.random.uniform(kc, (n, sc))
    ts_c = (jnp.arange(sc, dtype=jnp.float32)[None, :] + jit_c) * (bsize / 2)
    pos_c = origins[:, None, :] + dirs[:, None, :] * ts_c[..., None]
    zp1 = grid.geom.xyz_to_zp1(pos_c.reshape(-1, 3))
    bc = jnp.floor(zp1 * rc).astype(jnp.int32)
    inside = jnp.all((bc >= 0) & (bc < rc), axis=-1)
    bcc = jnp.clip(bc, 0, rc - 1)
    word = grid.packed_coarse[bcc[:, 0], bcc[:, 1], bcc[:, 2] >> 5]
    occ_c = (
        ((word >> (bcc[:, 2] & 31).astype(jnp.uint32)) & jnp.uint32(1)) == 1
    ) & inside
    occ_c = occ_c.reshape(n, sc)
    bid = (
        (bcc[:, 0] * rc + bcc[:, 1]) * rc + bcc[:, 2]
    ).reshape(n, sc)
    # a block may start before t_max even when its probe lands past it
    probe_ok = ts_c < (t_max + bsize * 1.7321)
    occ_c = occ_c & probe_ok
    # dedupe consecutive probes inside the same block
    first = occ_c & jnp.concatenate(
        [
            jnp.ones((n, 1), bool),
            (bid[:, 1:] != bid[:, :-1]) | ~occ_c[:, :-1],
        ],
        axis=1,
    )
    max_blocks = max_hits + max_hits // 2
    blk, blk_mask = _rank_compact(first, bid, max_blocks, fill=-1)  # [N, B]

    # ---- slab bounds of each hit block along the ray ---------------------
    bz = blk % rc
    by = (blk // rc) % rc
    bx = blk // (rc * rc)
    corner = (
        jnp.stack([bx, by, bz], axis=-1).astype(jnp.float32) / rc - 0.5
    ) * grid.geom.map_size + jnp.asarray(
        grid.geom.origin, jnp.float32
    )                                                   # [N, H, 3] world lo
    d_safe = jnp.where(jnp.abs(dirs) > 1e-9, dirs, 1e-9)[:, None, :]
    ta = (corner - origins[:, None, :]) / d_safe
    tb = (corner + bsize - origins[:, None, :]) / d_safe
    t0 = jnp.maximum(jnp.max(jnp.minimum(ta, tb), axis=-1), 0.0)  # [N, H]
    t1 = jnp.min(jnp.maximum(ta, tb), axis=-1)

    # ---- level 2: leaf-step jittered march across each block span -------
    sf = int(np.ceil(b * np.sqrt(3.0))) + 1
    jit_f = jax.random.uniform(kf, (n, max_blocks, sf))
    ts_f = t0[..., None] + (
        jnp.arange(sf, dtype=jnp.float32)[None, None, :] + jit_f
    ) * leaf                                            # [N, H, Sf]
    ok_f = (
        blk_mask[..., None]
        & (ts_f < t1[..., None])
        & (ts_f < t_max[..., None])
    )
    pos_f = origins[:, None, None, :] + dirs[:, None, None, :] * ts_f[..., None]
    occ_f = occupancy_query(
        grid.packed, grid.resolution, grid.geom, pos_f.reshape(-1, 3)
    ).reshape(n, max_blocks, sf)
    hit = (occ_f & ok_f).reshape(n, max_blocks * sf)
    return _rank_compact(hit, ts_f.reshape(n, max_blocks * sf), max_hits)


def occupied_voxel_centers(grid: OccupancyGrid) -> np.ndarray:
    """World coordinates of occupied voxel centers (the ``as_occ_prior.ply``
    export path, neural_mapping.cpp:755-763). Host-side."""
    words = np.asarray(grid.packed)
    r = grid.resolution
    z_bits = ((words[..., :, None] >> np.arange(32, dtype=np.uint32)) & 1).astype(
        bool
    )
    occ = z_bits.reshape(r, r, -1)[:, :, :r]
    idx = np.argwhere(occ)
    zp1 = (idx + 0.5) / r
    return (zp1 - 0.5) * grid.geom.map_size + np.asarray(grid.geom.origin)
