"""GS training phase: the joint SDF+2DGS jitted step and refine callbacks.

Reference analog: NeuralSLAM::{gs_train, gs_train_batch_iter} +
NeuralGS::train_callback (neural_mapping.cpp:190-292,356-531;
neural_gaussian.cpp:568-624).

Structure: ONE jit graph per (sh_degree, opt_struct) covering the whole
iteration — joint SDF ray batch, full-image render, all losses, backward
through both fields, shared Adam with per-leaf lrs, densify-state update.
Refine/prune/reset are separate jitted masked ops fired by the host schedule
(GSTrainer.callback) — shapes never change, so nothing recompiles.
"""

from __future__ import annotations

import functools
from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from .. import losses
from ..fields.occupancy import OccupancyGrid, valid_mask
from ..fields.sampling import RayBatch, compact_samples, sample_points
from ..fields.sdf_field import MapGeometry, sdf_apply, sdf_apply_with_grad
from ..gs.model import (
    DensifyState,
    RefineSpec,
    SplatModel,
    SplatParams,
    bucket_capacity,
    densify_state_init,
    pad_splat_rows,
    prune_invisible,
    refine_splats,
    reset_opacity,
    update_densify_state,
)
from ..gs.render import RenderSettings, render_splats
from ..ops.pallas.segsum import segment_sum, table_gather
from ..sensors.cameras import Camera, depth_to_normal
from .optim import AdamState, adam_init, adam_update
from .sdf import (
    SDFTrainSpec,
    align_regularization,
    sdf_losses,
    sdf_regularization,
)


@dataclass(frozen=True)
class GSTrainSpec:
    """Static knobs of the GS/joint phase (config/base.yaml:36-79)."""

    sdf: SDFTrainSpec
    render: RenderSettings
    refine: RefineSpec
    rgb_weight: float = 0.8
    dssim_weight: float = 0.2
    render_normal_weight: float = 0.01
    isotropic_weight: float = 0.05
    gs_sdf_weight: float = 1e-3
    # fixed-capacity compaction of the GS->SDF regularizer sample set: the
    # reference index_selects the visible+valid splats before the SDF eval
    # (neural_mapping.cpp:433-438, dynamic shapes); the TPU analog keeps a
    # static budget of visible-first rows. 0 = evaluate all C splat samples
    # (exact, but the hash gather scales with capacity, not visibility).
    gs_sdf_budget: int = 0
    visible_thr: float = 1e-1
    center_reg: bool = False
    detach_sdf_grad: bool = False
    gs_sdf_reg: bool = True
    depth_type: int = 0          # 0 expected (ED) depth, 1 median (k_depth_type)
    # alive/capacity fraction that triggers a capacity re-bucket after a
    # refine event. 0 (default) disables: the store saturates silently at
    # its initial capacity — direct spec consumers (tests) keep fully
    # static shapes; Pipeline opts in explicitly for auto-bucketed stores.
    rebucket_sat: float = 0.0
    sh_degree: int = 0
    sh_degree_interval: int = 1000
    refine_gs_struct_start_iter: int = 3000
    refine_start_iter: int = 500
    refine_every: int = 100
    reset_every: int = 3000
    refine_scale2d_stop_iter: int = 0
    # Phase-2 window-honesty guard (DIAGNOSIS_r04 residual risk): after
    # refine_stop the reference schedule stops ALL structural ops, which
    # is safe when the training render is exact but leaves splat size
    # unbounded under clamped windows (the damaged run grew 11.5 m
    # monsters there). When set, a SPLIT-ONLY refine (screen-size split
    # + the protective too-big/too-small/nan prunes; no grad-driven
    # grow, no opacity prune) keeps running every refine_every through
    # phase 2. Documented divergence; off by default.
    refine_scale2d_phase2: bool = False
    pause_refine_after_reset: int = 0
    num_train_data: int = 1
    gs_iter_step: int = 30000
    lr: float = 5e-3            # SDF lr ceiling during joint phase: k_lr_end
    lr_end: float = 1e-4
    # gsplat absgrad densify variant (k_use_absgrad, neural_gaussian.cpp:
    # 215-217,629-630): densify statistics accumulate per-TILE-ENTRY
    # |screen grad| (before the entry->splat sum, so opposing tile
    # gradients cannot cancel) — the TPU analog of gsplat's per-pixel
    # absgrad. Reference defaults it off and advises against it for 2DGS
    # (config/base.yaml:74); pair with a higher grow_grad2d (~0.0008).
    use_absgrad: bool = False
    # Tile-cap capacity rung (DIAGNOSIS_r04 repair item 2): when set
    # above render.tile_cap, the trainer DOUBLES the per-tile list depth
    # (one recompile of the train step) after ``escalate_patience``
    # consecutive refine events whose renderer-aware grow gate stayed
    # closed — i.e. gating densification alone is not bringing drop_frac
    # back under grow_drop_frac_max. This approaches the reference's
    # unbounded depth-sorted per-tile lists
    # (neural_gaussian.cpp:207-223) budget-elastically: the static cap
    # stays small while the model is small and steps up (512 -> 1024)
    # only when the model has genuinely outgrown it. 0 disables.
    tile_cap_max: int = 0
    # consecutive gated refines before a rung fires; debounces the
    # post-opacity-reset drop_frac spike (nothing saturates right after
    # a reset, so one refine's reading can be transiently pessimistic)
    escalate_patience: int = 3


class GSState(NamedTuple):
    """Everything the joint step threads through."""

    params: Dict[str, Any]      # {"sdf": pytree, "gs": SplatParams}
    anchors: jnp.ndarray
    alive: jnp.ndarray
    opt: AdamState
    dstate: DensifyState


def gs_state_init(sdf_params, model: SplatModel) -> GSState:
    params = {"sdf": sdf_params, "gs": model.params}
    return GSState(
        params=params,
        anchors=model.anchors,
        alive=model.alive,
        opt=adam_init(params),
        dstate=densify_state_init(model.alive.shape[0]),
    )


def rebucket_gs_state(state: GSState, new_capacity: int) -> GSState:
    """Grow the splat store to a larger static capacity — the ONE
    shape-changing (recompile) event of the GS phase (ARCHITECTURE.md
    design decision 2; the reference's cat_tensors_to_optimizer grows
    tensors every refine, optimizer_utils.cpp:5-165 — here growth is
    masked in place and only the BUCKET changes shape).

    Live rows keep params, Adam moments, and densify statistics verbatim;
    new rows get build_splat_model's inert dead-row values with zero
    moments (identical to freshly-pruned slots under the masked Adam
    surgery)."""
    c = state.alive.shape[0]
    pad = new_capacity - c
    if pad <= 0:
        return state
    zrow = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
    )
    params = {
        "sdf": state.params["sdf"],
        "gs": pad_splat_rows(state.params["gs"], pad),
    }
    opt = AdamState(
        step=state.opt.step,
        mu={"sdf": state.opt.mu["sdf"],
            "gs": jax.tree_util.tree_map(zrow, state.opt.mu["gs"])},
        nu={"sdf": state.opt.nu["sdf"],
            "gs": jax.tree_util.tree_map(zrow, state.opt.nu["gs"])},
    )
    return GSState(
        params=params,
        anchors=zrow(state.anchors),
        alive=jnp.concatenate([state.alive, jnp.zeros((pad,), bool)]),
        opt=opt,
        dstate=jax.tree_util.tree_map(zrow, state.dstate),
    )


def compact_gs_state(state: GSState, new_capacity: int) -> GSState:
    """SHRINK the splat store: stable alive-first compaction, truncated to
    ``new_capacity`` — the symmetric counterpart of rebucket_gs_state.

    No reference analog (torch tensors are exactly-sized every refine); in
    the bucketed static-shape design a store that initialized huge (e.g.
    mesh-init anchors) and then pruned hard keeps paying its high-water
    CAPACITY in every per-splat op — projection, SH, tile-entry emission,
    Adam — forever. Chip-measured: a 1.23M-vertex mesh init pruned to
    ~380k alive still stepped at the 1.38M-capacity cost (~1 s/iter).

    Live rows keep params, Adam moments, and densify statistics verbatim
    (their relative order is preserved — the argsort is stable); dead rows
    past the cut are discarded."""
    c = state.alive.shape[0]
    if new_capacity >= c:
        return state
    order = jnp.argsort(jnp.where(state.alive, 0, 1).astype(jnp.int32))
    take = order[:new_capacity]
    g = lambda x: x[take]
    params = {
        "sdf": state.params["sdf"],
        "gs": jax.tree_util.tree_map(g, state.params["gs"]),
    }
    opt = AdamState(
        step=state.opt.step,
        mu={"sdf": state.opt.mu["sdf"],
            "gs": jax.tree_util.tree_map(g, state.opt.mu["gs"])},
        nu={"sdf": state.opt.nu["sdf"],
            "gs": jax.tree_util.tree_map(g, state.opt.nu["gs"])},
    )
    return GSState(
        params=params,
        anchors=g(state.anchors),
        alive=g(state.alive),
        opt=opt,
        dstate=jax.tree_util.tree_map(g, state.dstate),
    )


def splat_model(state: GSState) -> SplatModel:
    return SplatModel(
        params=state.params["gs"], anchors=state.anchors, alive=state.alive
    )


def gs_lr_tree(spec: GSTrainSpec, sdf_params, sdf_lr, xyz_lr,
               color_only: bool = False) -> Dict[str, Any]:
    """Per-leaf learning rates = the reference's Adam param groups
    (neural_gaussian.cpp:434-453; SDF group tied at train_callback:610-623).
    ``color_only``: structure frozen, feature lrs x10 (the color-init
    pre-pass, gs_train, neural_mapping.cpp:369-387)."""
    sdf_lrs = jax.tree_util.tree_map(lambda _: sdf_lr, sdf_params)
    boost = 10.0 if color_only else 1.0
    freeze = 0.0 if color_only else 1.0
    gs = SplatParams(
        offsets=xyz_lr * freeze,
        scaling=5e-3 * freeze,
        quaternion=1e-3 * freeze,
        opacity=5e-2 * freeze,
        features_dc=2.5e-3 * boost,
        features_rest=2.5e-3 / 20.0 * boost,
    )
    return {"sdf": sdf_lrs, "gs": gs}


def gs_image_losses(
    render: Dict[str, jnp.ndarray],
    gt_image: jnp.ndarray,
    scaling: jnp.ndarray,
    visible: jnp.ndarray,
    cam: Camera,
    pose_c2w: jnp.ndarray,
    spec: GSTrainSpec,
    opt_struct: bool,
    mask: Optional[jnp.ndarray] = None,
) -> Tuple[jnp.ndarray, Dict[str, jnp.ndarray]]:
    """L1 + DSSIM + normal-consistency + isotropic
    (gs_train_batch_iter, neural_mapping.cpp:190-292)."""
    aux: Dict[str, jnp.ndarray] = {}
    color = render["color"]
    l_rgb = losses.rgb_loss(color, gt_image, mask)
    l_dssim = losses.dssim_loss(color, gt_image, mask)
    total = spec.rgb_weight * l_rgb + spec.dssim_weight * l_dssim
    aux["color"] = l_rgb
    aux["dssim"] = l_dssim

    if opt_struct and spec.render_normal_weight > 0:
        # k_depth_type switch (neural_mapping.cpp:248-252)
        depth = render["median"] if spec.depth_type == 1 else render["depth"]
        d_normal = depth_to_normal(cam, pose_c2w, depth)
        alpha = jax.lax.stop_gradient(render["alpha"])
        d_normal = d_normal * alpha
        n_err = jnp.mean(
            jnp.square(alpha[..., 0])
            - jnp.nan_to_num(jnp.sum(d_normal * render["normal"], -1))
        )
        total = total + spec.render_normal_weight * n_err
        aux["normal"] = n_err

    if spec.isotropic_weight > 0:
        scale2 = jnp.exp(scaling[:, :2])
        iso = jnp.abs(scale2 - jnp.mean(scale2, -1, keepdims=True))
        l_iso = losses.masked_mean(iso, visible)
        total = total + spec.isotropic_weight * l_iso
        aux["isotropic"] = l_iso
    return total, aux


def make_gs_train_step(
    spec: GSTrainSpec,
    geom: MapGeometry,
    grid: OccupancyGrid,
    cam: Camera,
):
    """Builds step(state, gt_image, pose_c2w, rays..., key, std, lrs,
    sh_degree*, opt_struct*) — starred args static."""
    K = jnp.asarray(cam.K, jnp.float32)

    # donate the state: params + Adam moments + densify stats update in
    # place (the splat store dominates HBM traffic; no-op warning on CPU).
    # Every GSState constructor must keep its leaves alias-free — see
    # densify_state_init.
    @functools.partial(
        jax.jit,
        static_argnames=("sh_active", "opt_struct", "color_only"),
        donate_argnums=(0,),
    )
    def step(
        state: GSState,
        gt_image,
        pose_c2w,
        ray_origin,
        ray_dir,
        ray_depth,
        key,
        sample_std,
        sdf_lr,
        xyz_lr,
        sh_active: int,
        opt_struct: bool,
        color_only: bool = False,
        mask=None,
    ):
        # frames ship to the device as uint8 (4x less H2D through the
        # tunnel than f32); normalize on-device inside the jitted step
        if gt_image.dtype == jnp.uint8:
            gt_image = gt_image.astype(jnp.float32) * (1.0 / 255.0)
        # independent keys per random consumer: ray-side regularizers,
        # splat-side align, numerical-fallback subset (sharing one key
        # correlates their subset indices / probe directions)
        (krender, ksamp, kreg, kreg_gs, kreg_num,
         kreg_sel) = jax.random.split(key, 6)
        rsettings = spec.render._replace(sh_degree=sh_active)

        joint_sdf = spec.gs_sdf_reg and not spec.detach_sdf_grad
        if joint_sdf:
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
                surface_sample_num=spec.sdf.surface_sample_num,
                free_sample_num=spec.sdf.free_sample_num,
                max_hits=spec.sdf.max_hits,
                max_steps=spec.sdf.max_steps,
                sample_std=sample_std,
                truncated_dis=spec.sdf.truncated_dis,
                inner_half_extent=spec.sdf.inner_half_extent,
            )
            if spec.sdf.point_budget > 0:
                samples = compact_samples(samples, spec.sdf.point_budget)

        c = state.alive.shape[0]

        def loss_fn(params, pix_delta, entry_pd=None):
            aux: Dict[str, jnp.ndarray] = {}
            sdf_p = params["sdf"]
            model = SplatModel(
                params=params["gs"], anchors=state.anchors, alive=state.alive
            )

            # joint SDF ray loss (sdf_train_batch_iter inside gs_train,
            # neural_mapping.cpp:403-407)
            sdf_nn_loss = 0.0
            if joint_sdf:
                sdf_nn_loss, sdf_aux = sdf_losses(
                    sdf_p, samples, geom, spec.sdf, sample_std, kreg
                )
                aux["sdf_nn"] = sdf_nn_loss
                aux["isigma_mean"] = sdf_aux["isigma_mean"]

            render = render_splats(
                model,
                pose_c2w,
                K,
                rsettings,
                training=True,
                key=krender,
                pix_delta=pix_delta,
                entry_pix_delta=entry_pd,
                center_reg=spec.center_reg,
            )

            gs_loss, img_aux = gs_image_losses(
                render,
                gt_image,
                params["gs"].scaling,
                render["visible"],
                cam,
                pose_c2w,
                spec,
                opt_struct,
                mask=mask,
            )
            aux.update(img_aux)
            # tile-cap telemetry (no reference analog: CUDA lists unbounded)
            aux["drop_frac"] = jax.lax.stop_gradient(render["drop_frac"])
            aux["drop_vis"] = jax.lax.stop_gradient(render["drop_vis"])
            aux["chunk_active"] = jax.lax.stop_gradient(
                render["chunk_active"]
            )
            aux["clamp_frac"] = jax.lax.stop_gradient(render["clamp_frac"])

            # GS->SDF mutual consistency (neural_mapping.cpp:420-462)
            if spec.gs_sdf_reg:
                vis = jax.lax.stop_gradient(render["visibilities"])
                w = jax.lax.stop_gradient(render["samples_w"][:, 0]) * vis
                x_gs = render["samples"]
                m = (
                    (vis > spec.visible_thr)
                    & valid_mask(grid, x_gs)
                    & state.alive
                )
                n_vis = jnp.sum(m)
                if 0 < spec.gs_sdf_budget < c:
                    # visible-first static compaction (the reference's
                    # index_select of visible+valid splats before the SDF
                    # eval, neural_mapping.cpp:433-438): the hash-grid
                    # gather then scales with the budget, not the splat
                    # CAPACITY. Overflow beyond the budget is dropped and
                    # reported (gs_sdf_overflow), like the tile_cap
                    # telemetry. Random tiebreak WITHIN the visible set:
                    # a stable visible-first order would regularize the
                    # same low-index splats every iteration and never
                    # touch the rest; rotating the subset covers all
                    # visible splats over iterations (the reference
                    # evaluates every visible splat each iter,
                    # neural_mapping.cpp:433-438).
                    u = jax.random.uniform(kreg_sel, (c,))
                    order = jnp.argsort(jnp.where(m, u, 1.0 + u))
                    ids = jax.lax.stop_gradient(
                        order[: spec.gs_sdf_budget]
                    )
                    # table_gather: the cotangent back to [C, 3] splat
                    # samples routes through the sorted Pallas segment-sum
                    x_gs = table_gather(x_gs, ids)
                    w = w[ids]
                    m = m[ids]
                    aux["gs_sdf_overflow"] = (
                        jnp.maximum(n_vis - spec.gs_sdf_budget, 0)
                        / jnp.maximum(n_vis, 1)
                    ).astype(jnp.float32)
                gs_eik = (
                    joint_sdf
                    and spec.sdf.eikonal_weight > 0
                    and not spec.sdf.numerical_grad
                )
                if gs_eik:
                    # Fused shared-gather eval: the gs_sdf value (grad flows
                    # to splats) AND the eikonal gradient (positions
                    # detached, reference's xyz.detach() semantics,
                    # neural_mapping.cpp:450-452) come from ONE hash-table
                    # gather over the splat-sample set.
                    gs_sdf, _, gs_grad, _ = sdf_apply_with_grad(
                        sdf_p,
                        x_gs,
                        geom,
                        spec.sdf.field,
                        detach_grad_positions=True,
                    )
                else:
                    gs_sdf, _ = sdf_apply(
                        sdf_p, x_gs, geom, spec.sdf.field
                    )
                w = jnp.where(m, w, 0.0)
                if spec.gs_sdf_weight > 0:
                    l_gs_sdf = losses.gs_sdf_loss(gs_sdf[:, 0], w)
                    gs_loss = gs_loss + spec.gs_sdf_weight * l_gs_sdf
                    aux["gs_sdf"] = l_gs_sdf
                    aux["vis_n"] = n_vis
                if gs_eik:
                    l_eik = losses.eikonal_loss(gs_grad, m)
                    sdf_nn_loss = (
                        sdf_nn_loss
                        + spec.sdf.eikonal_weight * l_eik
                        + align_regularization(
                            sdf_p,
                            jax.lax.stop_gradient(x_gs),
                            m,
                            gs_grad,
                            geom,
                            spec.sdf,
                            sample_std,
                            kreg_gs,
                            aux,
                            name="gs_align",
                        )
                    )
                    aux["gs_eik"] = l_eik
                elif joint_sdf and spec.sdf.eikonal_weight > 0:
                    # numerical-grad fallback: FD regularizer on a subset
                    # (full splat capacity x FD offsets OOMs)
                    xs = jax.lax.stop_gradient(x_gs)
                    ms = m
                    kk = spec.sdf.eikonal_sample_num
                    if 0 < kk < xs.shape[0]:
                        sel = jax.random.randint(
                            kreg_num, (kk,), 0, xs.shape[0]
                        )
                        xs, ms = xs[sel], ms[sel]
                    sdf_nn_loss = sdf_nn_loss + sdf_regularization(
                        sdf_p,
                        xs,
                        ms,
                        geom,
                        spec.sdf,
                        sample_std,
                        curvate=False,
                        aux=aux,
                    )

            total = gs_loss + sdf_nn_loss
            aux["gs_loss"] = gs_loss
            out_meta = (
                render["radii"],
                render["visibilities"],
                render["visible"] & render["binned"],
                render.get("tile_lists"),
            )
            return total, (aux, out_meta)

        pix_delta0 = jnp.zeros((c, 2), jnp.float32)
        if spec.use_absgrad:
            ts = spec.render.tile_size
            ntl = _cdiv(spec.render.width, ts) * _cdiv(spec.render.height, ts)
            epd0 = jnp.zeros((ntl, spec.render.tile_cap, 2), jnp.float32)
            (loss, (aux, meta)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1, 2), has_aux=True
            )(state.params, pix_delta0, epd0)
            g_params, g_pixdelta, g_epd = grads
            radii, visibilities, visible, tile_lists = meta
            # per-entry |screen grad| summed per splat (cannot cancel
            # across tiles) — slot c is the sentinel row, dropped
            g_absgrad = segment_sum(
                tile_lists.reshape(-1),
                jnp.abs(g_epd).reshape(-1, 2),
                c + 1,
            )[:c]
        else:
            (loss, (aux, meta)), grads = jax.value_and_grad(
                loss_fn, argnums=(0, 1), has_aux=True
            )(state.params, pix_delta0)
            g_params, g_pixdelta = grads
            radii, visibilities, visible, _ = meta
            g_absgrad = None

        lr_tree = gs_lr_tree(spec, state.params["sdf"], sdf_lr, xyz_lr, color_only)
        params2, opt2 = adam_update(g_params, state.opt, state.params, lr_tree)

        dstate2 = update_densify_state(
            state.dstate,
            g_pixdelta,
            radii,
            visibilities,
            visible,
            spec.render.width,
            spec.render.height,
            g_pixdelta_abs=g_absgrad,
        )
        aux["loss"] = loss
        new_state = GSState(
            params=params2,
            anchors=state.anchors,
            alive=state.alive,
            opt=opt2,
            dstate=dstate2,
        )
        return new_state, aux

    return step


# ---------------------------------------------------------------------------
# refine callbacks (host-scheduled, jitted bodies)
# ---------------------------------------------------------------------------


def make_refine_fns(spec: GSTrainSpec):
    @jax.jit
    def do_refine(state: GSState, key, iter_num, grow_ok=True):
        model = splat_model(state)
        mu_gs = state.opt.mu["gs"]
        nu_gs = state.opt.nu["gs"]
        model2, dstate2, mu2, nu2, info = refine_splats(
            model,
            state.dstate,
            mu_gs,
            nu_gs,
            key,
            spec.refine,
            iter_num,
            spec.reset_every,
            scale2d_active=spec.refine_scale2d_stop_iter > 0,
            grow_ok=grow_ok,
        )
        opt2 = AdamState(
            step=state.opt.step,
            mu={"sdf": state.opt.mu["sdf"], "gs": mu2},
            nu={"sdf": state.opt.nu["sdf"], "gs": nu2},
        )
        return (
            GSState(
                params={"sdf": state.params["sdf"], "gs": model2.params},
                anchors=model2.anchors,
                alive=model2.alive,
                opt=opt2,
                dstate=dstate2,
            ),
            info,
        )

    # phase-2 split-only variant (refine_scale2d_phase2): no grad-driven
    # grow (grow_grad2d = inf), no opacity prune, screen-size split never
    # age-gated; the protective prunes (too-big 3D, degenerate-small,
    # nan) stay. Lazily compiled — costs nothing unless dispatched.
    import dataclasses as _dc

    p2_refine = _dc.replace(
        spec.refine,
        grow_grad2d=float("inf"),
        prune_opa=0.0,
        refine_scale2d_stop_iter=(1 << 31) - 1,
    )

    @jax.jit
    def do_refine_p2(state: GSState, key, iter_num):
        model = splat_model(state)
        model2, dstate2, mu2, nu2, info = refine_splats(
            model,
            state.dstate,
            state.opt.mu["gs"],
            state.opt.nu["gs"],
            key,
            p2_refine,
            iter_num,
            spec.reset_every,
            scale2d_active=True,
        )
        opt2 = AdamState(
            step=state.opt.step,
            mu={"sdf": state.opt.mu["sdf"], "gs": mu2},
            nu={"sdf": state.opt.nu["sdf"], "gs": nu2},
        )
        return (
            GSState(
                params={"sdf": state.params["sdf"], "gs": model2.params},
                anchors=model2.anchors,
                alive=model2.alive,
                opt=opt2,
                dstate=dstate2,
            ),
            info,
        )

    @jax.jit
    def do_prune_invisible(state: GSState):
        model = splat_model(state)
        model2, dstate2, mu2, nu2, n = prune_invisible(
            model, state.dstate, state.opt.mu["gs"], state.opt.nu["gs"]
        )
        opt2 = AdamState(
            step=state.opt.step,
            mu={"sdf": state.opt.mu["sdf"], "gs": mu2},
            nu={"sdf": state.opt.nu["sdf"], "gs": nu2},
        )
        return (
            GSState(
                params={"sdf": state.params["sdf"], "gs": model2.params},
                anchors=model2.anchors,
                alive=model2.alive,
                opt=opt2,
                dstate=dstate2,
            ),
            n,
        )

    @jax.jit
    def do_reset_opacity(state: GSState):
        model = splat_model(state)
        model2, mu2, nu2 = reset_opacity(
            model, state.opt.mu["gs"], state.opt.nu["gs"], spec.refine.prune_opa
        )
        opt2 = AdamState(
            step=state.opt.step,
            mu={"sdf": state.opt.mu["sdf"], "gs": mu2},
            nu={"sdf": state.opt.nu["sdf"], "gs": nu2},
        )
        return GSState(
            params={"sdf": state.params["sdf"], "gs": model2.params},
            anchors=model2.anchors,
            alive=model2.alive,
            opt=opt2,
            dstate=state.dstate,
        )

    return do_refine, do_prune_invisible, do_reset_opacity, do_refine_p2


def xyz_lr_at(spec: GSTrainSpec, iter_num: int) -> float:
    """Exponential decay 1.6e-4 -> 1.6e-6 x spatial_scale
    (train_callback, neural_gaussian.cpp:610-618)."""
    s = spec.refine.spatial_scale
    ratio = iter_num / max(spec.gs_iter_step, 1)
    return float(
        np.exp(
            np.log(1.6e-4 * s) * (1 - ratio) + np.log(1.6e-6 * s) * ratio
        )
    )


def sdf_lr_at(spec: GSTrainSpec, xyz_lr: float) -> float:
    """SDF lr tied below the GS xyz lr during the joint phase
    (train_callback, neural_gaussian.cpp:619-623)."""
    if spec.detach_sdf_grad:
        return 0.0
    return min(xyz_lr, spec.lr_end)


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _crossed(iter_num: int, stride: int, every: int) -> bool:
    """Did the [iter_num - stride, iter_num] window cross a multiple of
    ``every``? Generalizes ``iter_num % every == 0`` to multi-image steps
    (stride = cameras per step on a mesh)."""
    if every <= 0:
        return False
    return (iter_num // every) != ((iter_num - stride) // every)


class GSTrainer:
    """Host-side schedule around the jitted step — the train_callback logic
    (neural_gaussian.cpp:568-624) with masked refine ops instead of
    shape-changing surgery.

    With ``mesh``, the step renders one camera per chip per step
    (parallel/train.py) and every reference schedule keeps its single-image
    units: iteration counters advance by ``batch`` per step and triggers
    fire on multiple-crossings instead of exact hits.
    """

    def __init__(self, spec: GSTrainSpec, geom, grid, cam: Camera, mesh=None):
        self.spec = spec
        self.geom = geom
        self.grid = grid
        self.cam = cam
        self.mesh = mesh
        self.batch = int(mesh.devices.size) if mesh is not None else 1
        self._gated_streak = 0       # consecutive gated refines (cap rung)
        self._build_step_fn()
        (self.refine_fn, self.prune_inv_fn, self.reset_fn,
         self.refine_p2_fn) = make_refine_fns(spec)
        # every jitted fn traced at splat-store capacity; extended by the
        # Pipeline (eval render). Cleared per-function on rebucket/shrink.
        self.capacity_jits = [
            self.step_fn, self.refine_fn, self.prune_inv_fn, self.reset_fn,
            self.refine_p2_fn,
        ]

    def _build_step_fn(self):
        if self.mesh is not None:
            from ..parallel.train import make_multicam_gs_train_step

            self.step_fn = make_multicam_gs_train_step(
                self.spec, self.geom, self.grid, self.cam, self.mesh
            )
        else:
            self.step_fn = make_gs_train_step(
                self.spec, self.geom, self.grid, self.cam
            )

    def escalate_tile_cap(self) -> int:
        """One capacity rung of the per-tile lists (tile_cap x2, bounded
        by ``spec.tile_cap_max``): rebuilds the train step around the
        deeper lists and drops the old cap's executables. The rest of the
        state (splat store, optimizer, densify stats) is shape-unchanged,
        so this costs exactly one train-step recompile. Budget-elastic
        analog of the reference's unbounded per-tile compositing
        (neural_gaussian.cpp:207-223)."""
        import dataclasses as _dc

        new_cap = min(self.spec.render.tile_cap * 2, self.spec.tile_cap_max)
        old_step = self.step_fn
        self.spec = _dc.replace(
            self.spec,
            render=self.spec.render._replace(tile_cap=new_cap),
        )
        self._build_step_fn()
        old_step.clear_cache()
        self.capacity_jits[self.capacity_jits.index(old_step)] = self.step_fn
        self._gated_streak = 0
        return new_cap

    def sh_active(self, iter_num: int) -> int:
        return min(self.spec.sh_degree, iter_num // self.spec.sh_degree_interval)

    def callback(
        self, state: GSState, iter_num: int, key, stride: int = 1,
        drop_frac_fn=None,
    ) -> Tuple[GSState, Dict]:
        """Post-step refine schedule. Returns possibly-updated state.

        ``drop_frac_fn``: lazy () -> float of the last train render's
        drop_frac; only called when a refine fires AND the renderer-aware
        grow gate is enabled (RefineSpec.grow_drop_frac_max > 0), so the
        host never syncs on it otherwise."""
        spec = self.spec
        info: Dict[str, Any] = {}
        refine_stop = spec.gs_iter_step // 2
        if iter_num >= refine_stop or iter_num <= 0:
            # phase-2 window-honesty guard: split-only refine keeps every
            # splat inside the train-window budget after the reference
            # schedule stops structural ops (see GSTrainSpec field doc)
            if (
                spec.refine_scale2d_phase2
                and iter_num > 0
                and _crossed(iter_num, stride, spec.refine_every)
            ):
                state, rinfo = self.refine_p2_fn(
                    state, key, jnp.int32(iter_num)
                )
                info.update({f"p2_{k}": int(v) for k, v in rinfo.items()})
            return state, info

        if _crossed(iter_num, stride, spec.num_train_data):
            state, n = self.prune_inv_fn(state)
            info["n_prune_invisible"] = int(n)

        if (
            iter_num > spec.refine_start_iter
            and _crossed(iter_num, stride, spec.refine_every)
            and (iter_num % spec.reset_every) >= spec.pause_refine_after_reset
        ):
            grow_ok = True
            thr = spec.refine.grow_drop_frac_max
            if thr > 0 and drop_frac_fn is not None:
                grow_ok = float(drop_frac_fn()) <= thr
                if not grow_ok:
                    info["grow_gated"] = 1
                    self._gated_streak += 1
                    # capacity rung: the gate has been closed for
                    # escalate_patience consecutive refines — the render
                    # budget, not densification, is the binding
                    # constraint. Double the tile lists (<= tile_cap_max)
                    # so the model already grown can train honestly.
                    if (
                        spec.tile_cap_max > spec.render.tile_cap
                        and self._gated_streak >= spec.escalate_patience
                    ):
                        info["tile_cap"] = self.escalate_tile_cap()
                        spec = self.spec
                else:
                    self._gated_streak = 0
            state, rinfo = self.refine_fn(
                state, key, jnp.int32(iter_num), jnp.bool_(grow_ok)
            )
            info.update({k: int(v) for k, v in rinfo.items()})
            if spec.rebucket_sat > 0:
                n_alive = int(jnp.sum(state.alive))
                cap = int(state.alive.shape[0])
                if n_alive > spec.rebucket_sat * cap:
                    # capacity floor scaled to the store: a 64-row test
                    # store must not snap to the 65536 production floor
                    new_cap = bucket_capacity(
                        n_alive, quantum=min(1 << 16, cap)
                    )
                    if new_cap > cap:
                        state = rebucket_gs_state(state, new_cap)
                        state = self._rereplicate(state)
                        info["rebucket"] = new_cap
                elif n_alive < 0.4 * cap:
                    # SHRINK after heavy pruning: the store keeps paying
                    # its high-water capacity in every per-splat op (a
                    # mesh-init store pruned 1.23M -> 380k alive stepped
                    # 3.4x slower than needed). Lower floor than grow so
                    # small test stores can shrink too; >= 2x hysteresis
                    # against grow (which re-fires at 90% saturation).
                    new_cap = bucket_capacity(
                        n_alive, quantum=min(1 << 16, max(cap // 8, 64))
                    )
                    if new_cap <= cap // 2:
                        state = compact_gs_state(state, new_cap)
                        state = self._rereplicate(state)
                        info["shrink"] = new_cap
                if "rebucket" in info or "shrink" in info:
                    # drop the old capacity's executables from the
                    # CAPACITY-SHAPED jit caches only (train step, refine
                    # ops, registered eval render): each stale shape holds
                    # GB-scale host memory — the source of the ~5 MB/GS-iter
                    # RSS creep at reference scale (RESULTS_r03.md). Scoped
                    # per-function (not jax.clear_caches()) so
                    # capacity-independent executables (SDF step, mesh
                    # export) survive even without the persistent
                    # compilation cache.
                    for f in self.capacity_jits:
                        f.clear_cache()

        if _crossed(iter_num, stride, spec.reset_every):
            state = self.reset_fn(state)
            info["opacity_reset"] = 1
        return state, info

    def _rereplicate(self, state: GSState) -> GSState:
        """After a shape-changing rebucket/shrink: the host-level reshape
        can land on one device; the sharded step expects the replicated
        layout."""
        if self.mesh is None:
            return state
        from jax.sharding import NamedSharding, PartitionSpec

        return jax.device_put(
            state, NamedSharding(self.mesh, PartitionSpec())
        )
