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


@dataclass
class OccupancyGrid:
    packed: jnp.ndarray      # [R, R, R//32] uint32, bit k of word = voxel z=k
    packed_core: jnp.ndarray  # erosion of packed: all 27 neighbors occupied
    resolution: int
    geom: MapGeometry

    @property
    def leaf(self) -> float:
        return self.geom.map_size / self.resolution


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
    return OccupancyGrid(
        packed=jnp.asarray(_pack_bits(grid)),
        packed_core=jnp.asarray(_pack_bits(core)),
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


def raymarch(
    grid: OccupancyGrid,
    origins: jnp.ndarray,      # [N, 3]
    dirs: jnp.ndarray,         # [N, 3] unit
    t_max: jnp.ndarray,        # [N, 1] march no further than this (ray depth)
    key: jax.Array,
    max_steps: int,
    max_hits: int,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Jittered fixed-step march through occupied voxels.

    Steps of one leaf size visit each voxel along the ray ~once; a uniform
    jitter per step reproduces kaolin's random-point-in-voxel sampling
    (OctreeAS::raymarch "voxel" mode with num_samples=1,
    local_map.cpp:467-475) in expectation.

    Returns (t_hits [N, max_hits], hit_mask [N, max_hits]) — fixed shapes,
    first ``max_hits`` occupied-voxel crossings in front of ``t_max``.
    """
    n = origins.shape[0]
    step = grid.leaf
    jitter = jax.random.uniform(key, (n, max_steps))
    ts = (jnp.arange(max_steps, dtype=jnp.float32)[None, :] + jitter) * step
    pos = origins[:, None, :] + dirs[:, None, :] * ts[..., None]  # [N, S, 3]
    occ = occupancy_query(
        grid.packed, grid.resolution, grid.geom, pos.reshape(-1, 3)
    ).reshape(n, max_steps)
    mask = occ & (ts < t_max)

    # fixed-capacity compaction: k-th True lands in output slot k
    order = jnp.cumsum(mask, axis=1)  # 1-based rank among hits
    keep = mask & (order <= max_hits)
    slot = jnp.where(keep, order - 1, max_hits)  # dump overflow in slot M
    out_t = jnp.zeros((n, max_hits + 1), dtype=ts.dtype)
    out_t = out_t.at[jnp.arange(n)[:, None], slot].set(
        jnp.where(keep, ts, 0.0), mode="drop"
    )
    hit_count = jnp.minimum(order[:, -1], max_hits)
    hit_mask = (
        jnp.arange(max_hits, dtype=jnp.int32)[None, :] < hit_count[:, None]
    )
    return out_t[:, :max_hits], hit_mask


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
