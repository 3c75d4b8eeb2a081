"""Ray-sample assembly for SDF supervision — fixed-shape, masked.

Reference analog: NeuralSLAM::sample (neural_mapping.cpp:73-104) combining
  - occupied-voxel samples along each ray (LocalMap::sample,
    local_map.cpp:449-509): ray_sdf = depth - t, front-of-surface only;
  - free-space stratified samples (utils::sample_free_pts, utils.cpp:366-393);
  - gaussian surface samples (utils::sample_surface_pts, utils.cpp:336-364);
  - the ray endpoint itself (ray_sdf = 0);
with |ray_sdf| truncated at ``truncated_dis`` and out-of-range points dropped.

TPU redesign: instead of dynamic concatenation + nonzero-compaction, every
ray yields a fixed sample budget ``S = max_hits + free_n + surf_n + 1``;
dropped samples carry mask=0 and the losses are masked means. This keeps the
whole SDF train step one static jit graph.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import NamedTuple

import jax
import jax.numpy as jnp

from .occupancy import OccupancyGrid, raymarch
from .sdf_field import MapGeometry


class RayBatch(NamedTuple):
    """A batch of depth-supervised rays (host-assembled, device-resident)."""

    origin: jnp.ndarray     # [R, 3]
    direction: jnp.ndarray  # [R, 3] unit
    depth: jnp.ndarray      # [R, 1] distance along direction to the hit
    xyz: jnp.ndarray        # [R, 3] hit points (origin + dir * depth)


class SampleBatch(NamedTuple):
    """Flattened point samples with ray-space SDF supervision."""

    xyz: jnp.ndarray       # [M, 3]
    ray_sdf: jnp.ndarray   # [M, 1] signed distance along the ray
    mask: jnp.ndarray      # [M] bool — valid sample
    direction: jnp.ndarray  # [M, 3] ray direction of the parent ray


def sample_points(
    rays: RayBatch,
    grid: OccupancyGrid,
    geom: MapGeometry,
    key: jax.Array,
    *,
    surface_sample_num: int,
    free_sample_num: int,
    max_hits: int,
    max_steps: int,
    sample_std,
    truncated_dis: float,
    inner_half_extent: float,
) -> SampleBatch:
    kv, kf, ks = jax.random.split(key, 3)
    n = rays.origin.shape[0]

    parts_t = []     # distance along ray
    parts_mask = []

    # 1) occupied-voxel samples, in front of the surface only
    t_hits, hit_mask = raymarch(
        grid, rays.origin, rays.direction, rays.depth, kv, max_steps, max_hits
    )
    parts_t.append(t_hits)
    parts_mask.append(hit_mask & (t_hits < rays.depth))

    # 2) stratified free-space samples in [0, depth)
    steps = (
        jnp.arange(free_sample_num, dtype=jnp.float32)[None, :]
        + jax.random.uniform(kf, (n, free_sample_num))
    ) / free_sample_num
    t_free = rays.depth * steps
    parts_t.append(t_free)
    parts_mask.append(jnp.ones_like(t_free, dtype=bool))

    # 3) gaussian surface samples: ray_sdf ~ N(0, std); xyz = hit - dir*ray_sdf
    s = jax.random.normal(ks, (n, surface_sample_num)) * sample_std
    t_surf = rays.depth - s
    parts_t.append(t_surf)
    parts_mask.append(jnp.ones_like(t_surf, dtype=bool))

    # 4) the measured endpoint
    parts_t.append(rays.depth)
    parts_mask.append(jnp.ones_like(rays.depth, dtype=bool))

    t = jnp.concatenate(parts_t, axis=1)            # [R, S]
    mask = jnp.concatenate(parts_mask, axis=1)      # [R, S]
    ray_sdf = rays.depth - t
    # truncate |ray_sdf| (neural_mapping.cpp:90-96)
    ray_sdf = jnp.clip(ray_sdf, -truncated_dis, truncated_dis)

    xyz = rays.origin[:, None, :] + rays.direction[:, None, :] * t[..., None]
    # in-range filter (sub_map.cpp:38-47 via get_inrange_mask)
    inrange = geom.inrange_mask(xyz, inner_half_extent)
    mask = mask & inrange

    m = n * t.shape[1]
    dirs = jnp.broadcast_to(rays.direction[:, None, :], xyz.shape)
    return SampleBatch(
        xyz=xyz.reshape(m, 3),
        ray_sdf=ray_sdf.reshape(m, 1),
        mask=mask.reshape(m),
        direction=dirs.reshape(m, 3),
    )


def compact_samples(s: SampleBatch, capacity: int) -> SampleBatch:
    """Pack valid samples to the front and truncate to ``capacity`` rows.

    The raymarch emits fixed-capacity per-ray slots (samples_per_ray ≈ 15)
    of which typically ~half are masked padding; every downstream hash-grid
    encode pays per-row. One stable sort by !mask (sorts are ~free on TPU)
    + 4 gathers caps the device work at the reference's adaptive point
    budget (k_batch_pt_num, neural_mapping.cpp:324-330) with static shapes.
    Overflow beyond ``capacity`` drops tail rays — rays are freshly randomly
    drawn each iteration, so the drop is unbiased across the dataset.
    """
    if capacity >= s.mask.shape[0]:
        return s
    order = jnp.argsort(jnp.logical_not(s.mask), stable=True)[:capacity]
    return SampleBatch(
        xyz=s.xyz[order],
        ray_sdf=s.ray_sdf[order],
        mask=s.mask[order],
        direction=s.direction[order],
    )


def samples_per_ray(
    surface_sample_num: int, free_sample_num: int, max_hits: int
) -> int:
    return max_hits + free_sample_num + surface_sample_num + 1
