"""SDF training phase: jitted step, schedules, outlier removal.

Reference analog: NeuralSLAM::{nsdf_train, sdf_train_batch_iter,
sdf_regularization, sdf_train_callback} (neural_mapping.cpp:106-354,531-593).

The whole iteration — ray subsampling, occupancy raymarch, surface/free
sampling, field eval, losses, backward, Adam — is ONE jit graph with static
shapes. Host work per iter is a scalar fetch for logging (amortized by
logging every N iters).
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Tuple

import jax
import jax.numpy as jnp

from .. import losses
from ..fields.occupancy import OccupancyGrid
from ..fields.sampling import (
    RayBatch,
    compact_samples,
    sample_points,
    samples_per_ray,
)
from ..fields.sdf_field import (
    MapGeometry,
    SDFFieldSpec,
    sdf_apply,
    sdf_apply_with_grad,
    sdf_gradient_autodiff,
    sdf_gradient_numerical,
)
from .optim import AdamState, adam_init, adam_update


@dataclass(frozen=True)
class SDFTrainSpec:
    """Static (compile-time) knobs of the SDF phase."""

    field: SDFFieldSpec
    batch_rays: int
    # Device-side point budget after compaction (k_batch_pt_num; the
    # reference adapts the ray count toward this sample budget,
    # neural_mapping.cpp:324-330). 0 disables compaction.
    point_budget: int = 32768
    surface_sample_num: int = 3
    free_sample_num: int = 3
    max_hits: int = 8
    max_steps: int = 512
    truncated_dis: float = 0.15
    inner_half_extent: float = 7.0
    sdf_weight: float = 1.0
    eikonal_weight: float = 0.1
    curvate_weight: float = 0.0
    align_weight: float = 0.1
    numerical_grad: bool = False
    # Subset size for the regularizers on the NON-fused (numerical-grad)
    # path only; 0 = full batch. The default analytic path computes
    # eikonal/curvature on the FULL batch via the fused shared-gather
    # encode (sdf_apply_with_grad) at negligible extra cost.
    eikonal_sample_num: int = 8192
    # The analytic/numeric alignment term still needs 6 FD probe encodes
    # (6 extra hash-table gathers); it runs on a random subset (TPU
    # adaptation — the reference aligns the full batch,
    # neural_mapping.cpp:125-133). 0 = full batch.
    align_sample_num: int = 8192

    @classmethod
    def from_config(cls, cfg, field_spec: SDFFieldSpec) -> "SDFTrainSpec":
        spr = samples_per_ray(
            cfg.surface_sample_num, cfg.free_sample_num, cfg.raymarch_max_hits
        )
        return cls(
            field=field_spec,
            # 2x ray oversampling vs the slot capacity; compaction trims
            # the real samples to the point budget (typical occupancy of
            # the per-ray slots is ~50%)
            batch_rays=max(1, cfg.batch_pt_num * 2 // spr),
            point_budget=cfg.batch_pt_num,
            surface_sample_num=cfg.surface_sample_num,
            free_sample_num=cfg.free_sample_num,
            max_hits=cfg.raymarch_max_hits,
            max_steps=cfg.raymarch_max_steps,
            truncated_dis=cfg.truncated_dis,
            inner_half_extent=0.5 * cfg.inner_map_size,
            sdf_weight=cfg.sdf_weight,
            eikonal_weight=cfg.eikonal_weight,
            curvate_weight=cfg.curvate_weight,
            align_weight=cfg.align_weight,
            numerical_grad=cfg.numerical_grad,
            eikonal_sample_num=cfg.eikonal_sample_num,
        )


def sdf_losses(
    params,
    samples,
    geom: MapGeometry,
    spec: SDFTrainSpec,
    sample_std,
    reg_key,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """BCE + eikonal (+curvature, +numeric/analytic alignment) on a masked
    SampleBatch. Shared by the pure-SDF phase and the joint GS phase.

    Analytic (default) path: ONE fused shared-gather evaluation yields sdf,
    isigma, ∇sdf and diag-Hessian together, so BCE + eikonal + curvature run
    on the full batch for the cost of a single encode. Numerical path keeps
    the reference's FD probes (subset-able via ``eikonal_sample_num``)."""
    curvate = spec.curvate_weight > 0
    fused = spec.eikonal_weight > 0 and not spec.numerical_grad
    if fused:
        sdf, isigma, grad, hess = sdf_apply_with_grad(
            params, samples.xyz, geom, spec.field, with_hessian=curvate
        )
    else:
        sdf, isigma = sdf_apply(params, samples.xyz, geom, spec.field)
    l_bce = losses.sdf_loss_masked(sdf, samples.ray_sdf, isigma, samples.mask)
    total = spec.sdf_weight * l_bce
    aux = {"sdf": l_bce, "isigma_mean": losses.masked_mean(isigma, samples.mask)}

    if fused:
        l_eik = losses.eikonal_loss(grad, samples.mask)
        total = total + spec.eikonal_weight * l_eik
        aux["eik"] = l_eik
        if curvate:
            l_curv = losses.curvature_loss(hess, samples.mask)
            total = total + spec.curvate_weight * l_curv
            aux["curv"] = l_curv
        total = total + align_regularization(
            params, samples.xyz, samples.mask, grad, geom, spec,
            sample_std, reg_key, aux,
        )
    elif spec.eikonal_weight > 0:
        xyz_r, mask_r = samples.xyz, samples.mask
        k = spec.eikonal_sample_num
        if reg_key is not None and 0 < k < xyz_r.shape[0]:
            sel = jax.random.randint(reg_key, (k,), 0, xyz_r.shape[0])
            xyz_r, mask_r = xyz_r[sel], mask_r[sel]
        total = total + sdf_regularization(
            params,
            xyz_r,
            mask_r,
            geom,
            spec,
            sample_std,
            curvate=curvate,
            aux=aux,
        )
    return total, aux


def align_regularization(
    params, xyz, mask, grad, geom, spec, sample_std, reg_key, aux,
    name: str = "align",
):
    """Analytic-vs-FD gradient alignment / smoothness prior
    (neural_mapping.cpp:125-133) on a random subset (``align_sample_num``;
    0 = full). The FD target is detached, exactly like the reference;
    ``grad`` comes from the fused shared-gather eval.

    TPU adaptation: instead of the reference's 6-probe axis FD (6 extra
    hash-grid encodes — gathers are the whole cost of this term), compare
    the analytic gradient against a 2-probe central difference along ONE
    random direction per point. Over iterations the random directions
    cover the axis FD in expectation at a third of the encode rows.
    """
    if spec.align_weight <= 0:
        return 0.0
    k = spec.align_sample_num
    # reg_key is REQUIRED: the term's coverage argument (random directions
    # average out to the axis FD over iterations) dies with a fixed key
    ku, ks = jax.random.split(reg_key)
    if 0 < k < xyz.shape[0]:
        sel = jax.random.randint(ks, (k,), 0, xyz.shape[0])
        xyz, mask, grad = xyz[sel], mask[sel], grad[sel]
    u = jax.random.normal(ku, xyz.shape)
    u = u * jax.lax.rsqrt(jnp.sum(u * u, -1, keepdims=True) + 1e-20)
    from ..fields.sdf_field import sdf_only

    probes = jnp.concatenate(
        [xyz + u * sample_std, xyz - u * sample_std], axis=0
    )
    vals = sdf_only(params, probes, geom, spec.field)
    nn = xyz.shape[0]
    fd = (vals[:nn] - vals[nn:]) / (2.0 * sample_std)   # [k, 1]
    g_dir = jnp.sum(grad * u, axis=-1, keepdims=True)
    l_align = losses.masked_mean(
        jnp.abs(g_dir - jax.lax.stop_gradient(fd)), mask
    )
    aux[name] = l_align
    return spec.align_weight * l_align


def sdf_regularization(
    params,
    xyz,
    mask,
    geom: MapGeometry,
    spec: SDFTrainSpec,
    sample_std,
    curvate: bool,
    aux: Dict[str, jnp.ndarray],
):
    """Eikonal (+curvature, +align) — neural_mapping.cpp:106-136. The FD
    delta is the adaptive ``sample_std`` like the reference."""
    if spec.numerical_grad:
        grad, hess = sdf_gradient_numerical(
            params, xyz, geom, spec.field, sample_std, with_hessian=curvate
        )
    else:
        grad, hess = sdf_gradient_autodiff(
            params, xyz, geom, spec.field, with_hessian=curvate
        )
    l_eik = losses.eikonal_loss(grad, mask)
    reg = spec.eikonal_weight * l_eik
    aux["eik"] = l_eik
    if curvate:
        l_curv = losses.curvature_loss(hess, mask)
        reg = reg + spec.curvate_weight * l_curv
        aux["curv"] = l_curv
    if (not spec.numerical_grad) and spec.align_weight > 0:
        g_num, _ = sdf_gradient_numerical(
            params, xyz, geom, spec.field, sample_std, with_hessian=False
        )
        l_align = losses.masked_mean(
            jnp.abs(grad - jax.lax.stop_gradient(g_num)), mask
        )
        reg = reg + spec.align_weight * l_align
        aux["align"] = l_align
    return reg


def make_sdf_train_step(
    spec: SDFTrainSpec, geom: MapGeometry, grid: OccupancyGrid
):
    """Builds the jitted (params, opt, rays, key, std, lr) -> ... step."""

    # donate params + moments: the step updates them in place (no fresh
    # 3x-table allocation per iteration; no-op warning on CPU)
    @functools.partial(jax.jit, donate_argnums=(0, 1))
    def step(
        params,
        opt_state: AdamState,
        ray_origin,
        ray_dir,
        ray_depth,
        key,
        sample_std,
        lr,
    ):
        kidx, ksamp, kreg = jax.random.split(key, 3)
        rays = RayBatch(
            origin=ray_origin,
            direction=ray_dir,
            depth=ray_depth,
            xyz=ray_origin + ray_dir * ray_depth,
        )
        samples = sample_points(
            rays,
            grid,
            geom,
            ksamp,
            surface_sample_num=spec.surface_sample_num,
            free_sample_num=spec.free_sample_num,
            max_hits=spec.max_hits,
            max_steps=spec.max_steps,
            sample_std=sample_std,
            truncated_dis=spec.truncated_dis,
            inner_half_extent=spec.inner_half_extent,
        )
        if spec.point_budget > 0:
            samples = compact_samples(samples, spec.point_budget)

        def loss_fn(p):
            return sdf_losses(p, samples, geom, spec, sample_std, kreg)

        (loss, aux), grads = jax.value_and_grad(loss_fn, has_aux=True)(params)
        params2, opt2 = adam_update(grads, opt_state, params, lr)
        aux["loss"] = loss
        aux["sample_count"] = jnp.sum(samples.mask)
        return params2, opt2, aux

    return step


@functools.partial(jax.jit, static_argnames=("batch_rays",))
def pick_ray_batch(pack: Dict[str, jnp.ndarray], key, batch_rays: int):
    """Uniform random ray rows from the (device-resident) depth ray pack
    (sdf_train_batch_iter, neural_mapping.cpp:144-156)."""
    n = pack["depth"].shape[0]
    idx = jax.random.randint(key, (batch_rays,), 0, n)
    return (
        pack["origin"][idx],
        pack["direction"][idx],
        pack["depth"][idx],
    )


def outlier_inlier_mask(
    params, geom, field_spec, xyz, thresh, chunk: int = 1 << 18
):
    """|sdf(x)| < thresh mask over the full train point set, chunked
    (sdf_train_callback outlier removal, neural_mapping.cpp:559-589)."""
    outs = []
    fn = jax.jit(lambda p, x: sdf_apply(p, x, geom, field_spec)[0])
    n = xyz.shape[0]
    for i in range(0, n, chunk):
        sdf = fn(params, xyz[i : i + chunk])
        outs.append(jnp.abs(sdf[:, 0]) < thresh)
    return jnp.concatenate(outs)
