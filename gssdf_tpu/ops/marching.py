"""Iso-surface extraction: marching tetrahedra, fixed-capacity, jit-friendly.

Reference analog: the vendored CuMCubes CUDA marching cubes
(include/mesher/cumcubes/, ``mc::marching_cubes(density, iso, lower, upper)``
called at local_map.cpp:402). TPU-first substitute: each cube is split into 6
tetrahedra; each tetra's 16 sign configurations are enumerated with a small
hand-derived table (no 256-case cube table), producing 0-2 triangles per
tetra. Outputs are fixed-capacity padded arrays; a host-side compaction
deduplicates vertices so downstream PLY export matches the reference's
vertex/face mesh format.

Marching tetrahedra yields the same iso-surface (denser triangulation) and is
watertight on shared faces since the cube diagonal choice is consistent.
"""

from __future__ import annotations

from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

# Cube corner offsets, index = bit order (x<<2 | y<<1 | z is NOT used; keep
# explicit table to stay readable).
_CUBE_CORNERS = np.array(
    [
        [0, 0, 0],
        [1, 0, 0],
        [1, 1, 0],
        [0, 1, 0],
        [0, 0, 1],
        [1, 0, 1],
        [1, 1, 1],
        [0, 1, 1],
    ],
    dtype=np.int32,
)

# Six tetrahedra sharing the main diagonal (corner 0 -> corner 6). Every
# neighbouring cube uses the same split, so shared faces triangulate
# consistently.
_TETS = np.array(
    [
        [0, 5, 1, 6],
        [0, 1, 2, 6],
        [0, 2, 3, 6],
        [0, 3, 7, 6],
        [0, 7, 4, 6],
        [0, 4, 5, 6],
    ],
    dtype=np.int32,
)

# The 6 edges of a tetrahedron as (corner_a, corner_b) local indices.
_TET_EDGES = np.array(
    [[0, 1], [0, 2], [0, 3], [1, 2], [1, 3], [2, 3]], dtype=np.int32
)


def _build_tet_tables():
    """Enumerate the 16 inside/outside cases of a tetrahedron.

    For each case: up to 2 triangles, each triangle = 3 edge indices into
    _TET_EDGES. Orientation: triangle normal points from inside (value < iso)
    to outside, computed by splitting on which corners are inside.
    """
    tri_table = -np.ones((16, 2, 3), dtype=np.int32)

    def edge_id(a, b):
        for i, (u, v) in enumerate(_TET_EDGES):
            if (u, v) == (a, b) or (u, v) == (b, a):
                return i
        raise AssertionError

    for case in range(16):
        inside = [i for i in range(4) if case & (1 << i)]
        outside = [i for i in range(4) if not case & (1 << i)]
        if len(inside) == 0 or len(inside) == 4:
            continue
        if len(inside) == 1:
            a = inside[0]
            b, c, d = outside
            tri_table[case, 0] = [edge_id(a, b), edge_id(a, c), edge_id(a, d)]
        elif len(inside) == 3:
            a = outside[0]
            b, c, d = inside
            # mirror of the 1-inside case with flipped winding
            tri_table[case, 0] = [edge_id(a, b), edge_id(a, d), edge_id(a, c)]
        else:  # 2 inside, 2 outside -> quad = 2 triangles
            a, b = inside
            c, d = outside
            e_ac, e_ad = edge_id(a, c), edge_id(a, d)
            e_bc, e_bd = edge_id(b, c), edge_id(b, d)
            tri_table[case, 0] = [e_ac, e_ad, e_bd]
            tri_table[case, 1] = [e_ac, e_bd, e_bc]
    return jnp.asarray(tri_table)


_TRI_TABLE = _build_tet_tables()


def marching_tets(
    density: jnp.ndarray,  # [X, Y, Z] sdf/density samples on the grid
    iso: float = 0.0,
    corner_valid: jnp.ndarray | None = None,  # [X, Y, Z] bool observed mask
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Extract triangles (in grid coordinates) from a dense scalar field.

    Returns (tri_verts [T, 3, 3] float32, tri_mask [T] bool) with
    T = (X-1)(Y-1)(Z-1) * 12 fixed capacity (6 tets x 2 triangles). Vertices
    are linearly interpolated edge crossings; masked-out rows are zeros.

    ``corner_valid`` suppresses cells with any unobserved corner — the
    boundary-artifact filter done at extraction time (cleaner than the
    reference's post-hoc 27-neighbor vertex filter, local_map.cpp:410-417,
    which depends on voxel/surface alignment).
    """
    X, Y, Z = density.shape
    cx, cy, cz = X - 1, Y - 1, Z - 1

    gx, gy, gz = jnp.meshgrid(
        jnp.arange(cx), jnp.arange(cy), jnp.arange(cz), indexing="ij"
    )
    base = jnp.stack([gx, gy, gz], -1).reshape(-1, 3)  # [C, 3]
    corners = base[:, None, :] + jnp.asarray(_CUBE_CORNERS)[None]  # [C, 8, 3]
    vals = density[corners[..., 0], corners[..., 1], corners[..., 2]]  # [C, 8]
    cell_ok = None
    if corner_valid is not None:
        cell_ok = jnp.all(
            corner_valid[corners[..., 0], corners[..., 1], corners[..., 2]],
            axis=-1,
        )  # [C]

    tets = jnp.asarray(_TETS)  # [6, 4]
    tet_vals = vals[:, tets]  # [C, 6, 4]
    tet_pos = corners[:, tets, :].astype(jnp.float32)  # [C, 6, 4, 3]

    inside = tet_vals < iso  # [C, 6, 4]
    case = (
        inside[..., 0].astype(jnp.int32)
        + 2 * inside[..., 1].astype(jnp.int32)
        + 4 * inside[..., 2].astype(jnp.int32)
        + 8 * inside[..., 3].astype(jnp.int32)
    )  # [C, 6]

    # interpolated crossing on each of the 6 tet edges
    ea = jnp.asarray(_TET_EDGES[:, 0])
    eb = jnp.asarray(_TET_EDGES[:, 1])
    va = tet_vals[..., ea]  # [C, 6, 6]
    vb = tet_vals[..., eb]
    denom = vb - va
    t = jnp.where(jnp.abs(denom) > 1e-12, (iso - va) / denom, 0.5)
    t = jnp.clip(t, 0.0, 1.0)[..., None]
    pa = tet_pos[:, :, ea, :]  # [C, 6, 6, 3]
    pb = tet_pos[:, :, eb, :]
    edge_pts = pa + t * (pb - pa)  # [C, 6, 6, 3]

    tri_edges = _TRI_TABLE[case]  # [C, 6, 2, 3] edge ids (-1 = none)
    valid = tri_edges[..., 0] >= 0  # [C, 6, 2]
    safe = jnp.maximum(tri_edges, 0)
    tri = jnp.take_along_axis(
        edge_pts[:, :, None, :, :],  # [C, 6, 1, 6, 3]
        safe[..., None].repeat(3, -1)[:, :, :, :, :],  # [C, 6, 2, 3, 3]
        axis=3,
    )  # [C, 6, 2, 3, 3]

    # Consistent outward winding: within a tet the (linear) field increases
    # from inside corners to outside corners; flip triangles whose normal
    # opposes that direction. Robust regardless of per-tet parity.
    w_in = inside.astype(jnp.float32)
    n_in = jnp.clip(jnp.sum(w_in, -1, keepdims=True), 1.0)
    n_out = jnp.clip(jnp.sum(1.0 - w_in, -1, keepdims=True), 1.0)
    c_in = jnp.sum(tet_pos * w_in[..., None], -2) / n_in
    c_out = jnp.sum(tet_pos * (1.0 - w_in)[..., None], -2) / n_out
    outward = (c_out - c_in)[:, :, None, :]  # [C, 6, 1, 3]
    e1 = tri[..., 1, :] - tri[..., 0, :]
    e2 = tri[..., 2, :] - tri[..., 0, :]
    nrm = jnp.cross(e1, e2)
    flip = jnp.sum(nrm * outward, -1) < 0  # [C, 6, 2]
    v1 = jnp.where(flip[..., None], tri[..., 2, :], tri[..., 1, :])
    v2 = jnp.where(flip[..., None], tri[..., 1, :], tri[..., 2, :])
    tri = jnp.stack([tri[..., 0, :], v1, v2], axis=-2)

    tri = tri.reshape(-1, 3, 3)
    mask = valid.reshape(-1)
    if cell_ok is not None:
        mask = mask & jnp.repeat(cell_ok, 12)
    tri = jnp.where(mask[:, None, None], tri, 0.0)
    return tri, mask


def compact_mesh(
    tri_verts: np.ndarray, tri_mask: np.ndarray, lower, res: float
):
    """Host-side: drop padding, weld duplicate vertices, return
    (vertices [V, 3] world, faces [F, 3] int32)."""
    tri = np.asarray(tri_verts)[np.asarray(tri_mask)]
    if tri.shape[0] == 0:
        return np.zeros((0, 3), np.float32), np.zeros((0, 3), np.int32)
    flat = tri.reshape(-1, 3)
    # weld with a quantized key (grid coords are already well-scaled)
    key = np.round(flat * 1e5).astype(np.int64)
    _, idx, inv = np.unique(
        key, axis=0, return_index=True, return_inverse=True
    )
    verts = flat[idx]
    faces = inv.reshape(-1, 3).astype(np.int32)
    # drop degenerate faces
    good = (
        (faces[:, 0] != faces[:, 1])
        & (faces[:, 1] != faces[:, 2])
        & (faces[:, 0] != faces[:, 2])
    )
    faces = faces[good]
    verts_world = verts * res + np.asarray(lower, dtype=np.float64)
    return verts_world.astype(np.float32), faces
