"""Splat parameter store + SDF-driven init + jit-stable densification.

Reference analog: ``NeuralGS`` (include/neural_gaussian/neural_gaussian.{h,cpp}).

TPU-first redesign of the one place where the reference's shapes are dynamic
(SURVEY.md §2.3): the reference grows/splits/prunes by torch::cat /
index_select, rewriting Adam moments each time (optimizer_utils.cpp:5-165).
Under jit that would recompile every refine. Here the splat store is a
**fixed-capacity array with an alive mask**; grow/split/prune are masked
scatter updates (slot allocation by sort + cumsum, no dynamic shapes) and the
Adam "surgery" is zeroing moment rows in place. Capacity re-bucketing (rare)
is the only recompile event, handled by the host trainer.

Parameterization matches neural_gaussian.cpp:426-453:
  anchors (non-trainable) + offsets, log-scales, wxyz quaternions, logit
  opacity, SH features_dc [C,1,3] / features_rest [C,K-1,3].
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, NamedTuple, Optional, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..fields.sdf_field import (
    MapGeometry,
    SDFFieldSpec,
    sdf_apply,
    sdf_gradient_autodiff,
    sdf_gradient_numerical,
)
from ..ops.knn import knn_mean_sq_dist
from ..utils.math import (
    logit,
    normalize,
    num_sh_bases,
    quat_to_rotmat,
    random_quat,
    rotation_6d_to_matrix,
    rotmat_to_quat,
)


class SplatParams(NamedTuple):
    """Trainable leaves. Rows past the alive front are parked (grad-masked)."""

    offsets: jnp.ndarray        # [C, 3]
    scaling: jnp.ndarray        # [C, 3] log-scale
    quaternion: jnp.ndarray     # [C, 4] wxyz
    opacity: jnp.ndarray        # [C] logit
    features_dc: jnp.ndarray    # [C, 1, 3]
    features_rest: jnp.ndarray  # [C, K-1, 3]


class SplatModel(NamedTuple):
    params: SplatParams
    anchors: jnp.ndarray        # [C, 3] non-trainable (neural_gaussian.cpp:426)
    alive: jnp.ndarray          # [C] bool


class DensifyState(NamedTuple):
    """Accumulated refine statistics (update_state, neural_gaussian.cpp:626-680)."""

    grad2d: jnp.ndarray  # [C] sum of screen-gradient norms
    count: jnp.ndarray   # [C] times visible
    vis: jnp.ndarray     # [C] max pixel weight since last invisible-prune
    radii: jnp.ndarray   # [C] max normalized screen radius
    seen: jnp.ndarray    # [C] rasterized at least once since last vis sweep
                         # (guards capacity-dropped splats from the pruner)


def densify_state_init(capacity: int) -> DensifyState:
    # distinct buffers per field: reusing one zeros array across leaves
    # makes the state pytree alias itself, which breaks jit buffer donation
    z = lambda: jnp.zeros((capacity,), jnp.float32)
    return DensifyState(grad2d=z(), count=z(), vis=z(), radii=z(), seen=z())


# ---------------------------------------------------------------------------
# init
# ---------------------------------------------------------------------------


def _quat_from_normal_basis(normal: jnp.ndarray, basis: jnp.ndarray):
    """rot6d(normal, basis) -> column-permuted rotation -> wxyz quaternion,
    so the splat's local z (disk normal) aligns with ``normal``
    (init_gs_with_sdf, neural_gaussian.cpp:60-103)."""
    d6 = jnp.concatenate([normalize(normal), normalize(basis)], axis=-1)
    rot = rotation_6d_to_matrix(d6)              # columns (b1, b2, b3)
    rot = jnp.stack([rot[..., 1], rot[..., 2], rot[..., 0]], axis=-1)
    q = rotmat_to_quat(rot)
    bad = ~jnp.all(jnp.isfinite(q), axis=-1, keepdims=True)
    idq = jnp.array([1.0, 0.0, 0.0, 0.0], q.dtype)
    return jnp.where(bad, idq, q)


def init_quats_opacity_with_sdf(
    sdf_params,
    geom: MapGeometry,
    field_spec: SDFFieldSpec,
    xyz: jnp.ndarray,
    mesh_res: float,
    numerical: bool = True,
    chunk: int = 1 << 16,
) -> Tuple[jnp.ndarray, jnp.ndarray]:
    """Splat orientation from the SDF gradient (normal) + diagonal-Hessian
    direction; opacity = exp(-sdf^2 * isigma) (init_gs_with_sdf,
    neural_gaussian.cpp:19-127). Chunked like the reference's
    k_vis_batch_pt_num batching."""
    if xyz.shape[0] == 0:
        return jnp.zeros((0, 4), jnp.float32), jnp.zeros((0,), jnp.float32)
    quats_out, opa_out = [], []

    @jax.jit
    def one(x):
        if numerical:
            grad, hess = sdf_gradient_numerical(
                sdf_params, x, geom, field_spec, mesh_res, with_hessian=True
            )
        else:
            grad, hess = sdf_gradient_autodiff(
                sdf_params, x, geom, field_spec, with_hessian=True
            )
        q = _quat_from_normal_basis(grad, hess)
        sdf, isigma = sdf_apply(sdf_params, x, geom, field_spec)
        opa = jnp.exp(-jnp.square(sdf[:, 0]) * isigma[:, 0])
        return q, opa

    n = xyz.shape[0]
    for i in range(0, n, chunk):
        q, o = one(xyz[i : i + chunk])
        quats_out.append(q)
        opa_out.append(o)
    return jnp.concatenate(quats_out), jnp.concatenate(opa_out)


def sky_sphere_splats(
    key: jax.Array,
    origin: np.ndarray,
    inner_map_size: float,
    spatial_scale: float,
) -> Dict[str, jnp.ndarray]:
    """Uniform splats on a sky sphere of radius 0.6 * inner_map_size
    (neural_gaussian.cpp:334-401). Opacity starts ~1 (clamped below the
    logit pole)."""
    num = int(1000 * spatial_scale)
    dirs = normalize(jax.random.normal(key, (num, 3)))
    radius = 0.6 * inner_map_size
    anchors = dirs * radius + jnp.asarray(origin, jnp.float32)[None]
    area = 1.1 * jnp.pi * radius * radius / num
    scales = jnp.full((num, 3), jnp.log(area), jnp.float32)
    basis = jnp.stack([dirs[:, 1], dirs[:, 2], dirs[:, 0]], axis=-1)
    quats = _quat_from_normal_basis(dirs, basis)
    opacity = jnp.full((num,), logit(0.9999), jnp.float32)
    return {
        "anchors": anchors,
        "scales_log": scales,
        "quats": quats,
        "opacity_logit": opacity,
    }


def build_splat_model(
    key: jax.Array,
    anchors: jnp.ndarray,
    scales_log: jnp.ndarray,
    quats: jnp.ndarray,
    opacity_logit: jnp.ndarray,
    sh_degree: int,
    capacity: int,
) -> SplatModel:
    """Assemble + pad to static ``capacity`` (features init per
    neural_gaussian.cpp:403-409: random dc colors, zero rest)."""
    n = anchors.shape[0]
    if capacity < n:
        raise ValueError(f"capacity {capacity} < initial splats {n}")
    dim_sh = num_sh_bases(sh_degree)
    f_dc = jax.random.uniform(key, (n, 1, 3), jnp.float32)
    f_rest = jnp.zeros((n, dim_sh - 1, 3), jnp.float32)

    # drop non-finite splats (prune-nan at init, neural_gaussian.cpp:411-424)
    finite = (
        jnp.all(jnp.isfinite(anchors), -1)
        & jnp.all(jnp.isfinite(scales_log), -1)
        & jnp.all(jnp.isfinite(quats), -1)
        & jnp.isfinite(opacity_logit)
    )

    pad = capacity - n

    def padded(x, fill=0.0):
        shape = (pad,) + x.shape[1:]
        return jnp.concatenate([x, jnp.full(shape, fill, x.dtype)])

    params = pad_splat_rows(
        SplatParams(
            offsets=jnp.zeros((n, 3), jnp.float32),
            scaling=scales_log,
            quaternion=quats,
            opacity=opacity_logit,
            features_dc=f_dc,
            features_rest=f_rest,
        ),
        pad,
    )
    alive = jnp.concatenate([finite, jnp.zeros((pad,), bool)])
    return SplatModel(params=params, anchors=padded(anchors), alive=alive)


def bucket_capacity(n: int, mult: float = 1.5, quantum: int = 1 << 16) -> int:
    """Static splat capacity: n * mult rounded up to a geometric ladder.

    Capacities are restricted to ``m * 2^e`` with ``m in {4..8}`` (the m=8
    rung equals ``4 * 2^(e+1)``, so the value set is exactly the m in
    {4..7} ladder; rung ratio <= 1.25): every distinct capacity recompiles
    the whole per-splat program suite (train step, refine, eval render —
    GB-scale host executables, minutes of tunnel-bound compile each), so a
    full run must only ever touch a handful of shapes no matter how the
    alive count wanders. ``quantum`` is a floor, not a granularity.

    Slack accounting: mean rung slack is ~11% ON TOP of ``mult``, but the
    worst case immediately after a grow is capacity ≈ 1.875x alive (1.5
    mult x 1.25 rung) — a flat tax on every per-splat op and on HBM for
    params + Adam moments until pruning/shrink catches up. At the largest
    expected rung (2^21 splats, ~59 f32 values/splat for params+moments+
    densify stats) that is ~0.5 GB of HBM — fine on a 16 GB v5e.

    Headroom (``mult``) is deliberately modest: every per-splat op
    (projection, SH, tile-entry emit, Adam) scales with CAPACITY, not live
    count, so slack is a flat tax on the whole GS step. Growth past the
    headroom triggers a capacity re-bucket (the one recompile event — see
    train/gs.py::rebucket_gs_state)."""
    want = max(int(n * mult), quantum, 8)
    e = want.bit_length() - 3  # 4*2^e <= want < 8*2^e
    for m in (4, 5, 6, 7, 8):
        if (m << e) >= want:
            return m << e
    raise AssertionError("unreachable: m=8 rung always covers want")


def pad_splat_rows(params: SplatParams, pad: int) -> SplatParams:
    """Append ``pad`` DEAD rows with the same inert values as
    build_splat_model's capacity padding (scaling/opacity -10 -> exp/sigmoid
    ~0, identity quaternion so normalization never sees a zero vector)."""
    z = lambda x: jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)]
    )
    return SplatParams(
        offsets=z(params.offsets),
        scaling=jnp.concatenate(
            [params.scaling,
             jnp.full((pad,) + params.scaling.shape[1:], -10.0,
                      params.scaling.dtype)]
        ),
        quaternion=jnp.concatenate(
            [params.quaternion,
             jnp.tile(jnp.array([[1.0, 0, 0, 0]], params.quaternion.dtype),
                      (pad, 1))]
        ),
        opacity=jnp.concatenate(
            [params.opacity,
             jnp.full((pad,), -10.0, params.opacity.dtype)]
        ),
        features_dc=z(params.features_dc),
        features_rest=z(params.features_rest),
    )


def init_scales_from_knn(points: jnp.ndarray) -> jnp.ndarray:
    """log(sqrt(mean 3-NN sq dist)) per point, isotropic
    (neural_gaussian.cpp:313-317)."""
    d2 = jnp.clip(knn_mean_sq_dist(points), 1e-6)
    return jnp.log(jnp.sqrt(d2))[:, None] * jnp.ones((1, 3))


# ---------------------------------------------------------------------------
# forward
# ---------------------------------------------------------------------------


def generate_gaussian(model: SplatModel, training: bool = True):
    """Activated splat attributes (generate_gaussian,
    neural_gaussian.cpp:480-492). Dead rows get opacity 0."""
    p = model.params
    xyz = model.anchors + p.offsets
    scales = jnp.exp(p.scaling)
    opacity = jnp.where(model.alive, jax.nn.sigmoid(p.opacity), 0.0)
    sh = jnp.concatenate([p.features_dc, p.features_rest], axis=1)  # [C, K, 3]
    return xyz, p.quaternion, scales, opacity, sh


# ---------------------------------------------------------------------------
# densification (masked, static shapes)
# ---------------------------------------------------------------------------


def update_densify_state(
    state: DensifyState,
    g_pixdelta: jnp.ndarray,   # [C, 2] d(loss)/d(pix_delta) from the render
    radii: jnp.ndarray,        # [C] screen radii (px)
    visibilities: jnp.ndarray,  # [C] max pixel weight this render
    visible: jnp.ndarray,      # [C] bool — projected this render
    width: int,
    height: int,
    n_cameras: int = 1,
    g_pixdelta_abs: Optional[jnp.ndarray] = None,  # [C, 2] absgrad variant
) -> DensifyState:
    """update_state (neural_gaussian.cpp:626-680): accumulate screen-space
    gradient norms scaled by W/2, H/2, visibility count/max.

    ``g_pixdelta_abs``: when the absgrad densify variant is on
    (k_use_absgrad, neural_gaussian.cpp:629-630), the per-splat sum of
    per-tile-entry |screen grad| replaces the signed gradient in the norm
    — same W/2, H/2 scaling as the reference's shared update_state path."""
    g_src = g_pixdelta if g_pixdelta_abs is None else g_pixdelta_abs
    g = jnp.stack(
        [
            g_src[:, 0] * (width * 0.5 * n_cameras),
            g_src[:, 1] * (height * 0.5 * n_cameras),
        ],
        -1,
    )
    gnorm = jnp.linalg.norm(g, axis=-1)
    vis_f = visible.astype(jnp.float32)
    image_size = float(max(width, height))
    return DensifyState(
        grad2d=state.grad2d + gnorm * vis_f,
        count=state.count + vis_f,
        vis=jnp.maximum(state.vis, jnp.where(visible, visibilities, 0.0)),
        radii=jnp.maximum(state.radii, jnp.where(visible, radii / image_size, 0.0)),
        seen=jnp.maximum(state.seen, vis_f),
    )


def _alloc_slots(free: jnp.ndarray, want: jnp.ndarray, priority: jnp.ndarray):
    """Assign each wanted row a distinct free slot, highest priority first.

    Returns dest [C] int32 (= C when not wanted or out of free slots).
    Pure sort/cumsum — jit-stable replacement for dynamic torch::cat.
    """
    c = free.shape[0]
    num_free = jnp.sum(free)
    # free slot k (in index order)
    free_slots = jnp.argsort(jnp.where(free, 0, 1), stable=True).astype(jnp.int32)
    # rank wanted rows by priority (desc)
    score = jnp.where(want, priority, -jnp.inf)
    order = jnp.argsort(-score, stable=True)
    rank = jnp.zeros((c,), jnp.int32).at[order].set(jnp.arange(c, dtype=jnp.int32))
    ok = want & (rank < num_free)
    dest = jnp.where(ok, free_slots[jnp.clip(rank, 0, c - 1)], c)
    return dest.astype(jnp.int32), ok


def _copy_rows(x: jnp.ndarray, dest: jnp.ndarray, values: jnp.ndarray):
    """x.at[dest].set(values) with out-of-range dest dropped."""
    return x.at[dest].set(values, mode="drop")


@dataclass(frozen=True)
class RefineSpec:
    """Static densification knobs (config/base.yaml:63-79)."""

    grow_grad2d: float = 0.0002
    grow_scale3d: float = 0.01
    grow_scale2d: float = 0.05
    prune_opa: float = 0.05
    prune_scale3d: float = 0.1
    refine_scale2d_stop_iter: int = 0
    spatial_scale: float = 1.0
    original_spatial_scale: float = 1.0
    # Renderer-aware densification gate (DIAGNOSIS_r04 addendum 2): when
    # > 0, grad-driven grow (duplicate + split) is suppressed while the
    # last train render's drop_frac exceeds this — the no-reset
    # experiment showed the collapse tracks densification outgrowing the
    # fixed tile-cap budget (280k -> 586k alive drove drop_frac 0.25 ->
    # 0.74 and PSNR 19 -> 15). The reference's budget is unbounded so
    # its gate is trivially always open; prunes and the scale2d
    # window-honesty split stay active either way.
    grow_drop_frac_max: float = 0.0
    # ALSO gate the scale2d screen-size split on grow_ok. Round-5 chip
    # evidence (RESULTS_r05): with only grad-grow gated, the scale2d
    # split fired 41-43k times per refine while the gate was closed,
    # holding drop_frac at ~0.6 despite a flat alive count — split churn
    # itself overloads the fixed tile lists. Off by default (the split
    # doubles as the window-honesty guard, DIAGNOSIS_r04).
    gate_scale2d: bool = False


def refine_splats(
    model: SplatModel,
    state: DensifyState,
    mu: SplatParams,
    nu: SplatParams,
    key: jax.Array,
    spec: RefineSpec,
    iter_num: jnp.ndarray,
    reset_every: int,
    scale2d_active: bool,
    grow_ok=True,   # dynamic bool: False suppresses grad-driven grow
):
    """grow (duplicate + split) then prune, as masked scatters
    (grow_gs/split/duplicate/prune_gs, neural_gaussian.cpp:690-916).

    Adam moment surgery: new rows (dup dest, split children) get zeroed
    moments; surviving rows keep theirs — matching
    optimizer_utils.cpp:{cat,prune_cat}_tensors_to_optimizer semantics.
    Returns (model, state, mu, nu, info dict).
    """
    p = model.params
    alive = model.alive
    c = alive.shape[0]

    grads = state.grad2d / jnp.clip(state.count, 1.0)
    is_high = (grads > spec.grow_grad2d) & alive & grow_ok
    scale2 = jnp.exp(p.scaling[:, :2])
    is_small = jnp.max(scale2, -1) <= spec.grow_scale3d * spec.spatial_scale
    is_dupli = is_high & is_small
    is_split = is_high & ~is_small
    if scale2d_active:
        # splatfacto-style screen-size split (grow_gs,
        # neural_gaussian.cpp:705-707): gated DYNAMICALLY on
        # iter < refine_scale2d_stop_iter like the reference, not merely
        # on the machinery being enabled. On this renderer the rule also
        # serves as the window-honesty guard: train-time bbox windows
        # clamp what the photometric loss can see of a large splat
        # (clamp_frac telemetry), so splats beyond ~grow_scale2d of the
        # image never feel their full-footprint error and can degenerate
        # into needles — splitting them keeps every splat inside the
        # window budget (see RESULTS_r04 diagnosis).
        s2d_ok = grow_ok if spec.gate_scale2d else True
        is_split = is_split | (
            alive
            & (state.radii > spec.grow_scale2d)
            & (iter_num < spec.refine_scale2d_stop_iter)
            & s2d_ok
        )

    zero_moment_rows = jnp.zeros((c,), bool)

    # ---- duplicate: copy row into a free slot ----
    dest_d, ok_d = _alloc_slots(~alive, is_dupli, grads)

    def dup_leaf(x):
        return _copy_rows(x, dest_d, x)

    p = jax.tree_util.tree_map(dup_leaf, p)
    anchors = _copy_rows(model.anchors, dest_d, model.anchors)
    alive = alive.at[dest_d].set(True, mode="drop")
    zero_moment_rows = zero_moment_rows.at[dest_d].set(True, mode="drop")
    state = jax.tree_util.tree_map(dup_leaf, state)
    n_dup = jnp.sum(ok_d)

    # ---- split: parent slot -> child 1, free slot -> child 2 ----
    free2 = ~alive
    dest_s, ok_s = _alloc_slots(free2, is_split, grads)
    do_split = ok_s  # splits whose second child found a slot

    k1, k2 = jax.random.split(key)
    scales3 = jnp.concatenate([scale2, jnp.zeros((c, 1))], -1)   # [C, 3]
    rot = quat_to_rotmat(normalize(p.quaternion))
    eps = jax.random.normal(k1, (2, c, 3))
    # child offsets: offset + R @ (scale^2 * eps_k). The QUADRATIC spread is
    # the reference's exact behavior: einsum("nij,nj,bnj->bni", rotmats,
    # scales, sample_scales) with sample_scales = scales * randn multiplies
    # scales in twice (split, neural_gaussian.cpp:778-790) — children land
    # much closer to the parent than gsplat's linear-spread split.
    child_off = (
        jnp.einsum("nij,knj->kni", rot, (scales3 * scales3)[None] * eps)
        + p.offsets[None]
    )  # [2, C, 3]
    child_scale = jnp.log(jnp.clip(scales3 / 1.6, 1e-10))
    child_scale = child_scale.at[:, 2].set(p.scaling[:, 2])  # keep flat axis

    # child 1 overwrites the parent slot
    p = p._replace(
        offsets=jnp.where(do_split[:, None], child_off[0], p.offsets),
        scaling=jnp.where(do_split[:, None], child_scale, p.scaling),
    )
    # child 2 in the new slot: same quats/opacity/features, its own offset
    p = p._replace(
        offsets=_copy_rows(p.offsets, dest_s, child_off[1]),
        scaling=_copy_rows(p.scaling, dest_s, child_scale),
        quaternion=_copy_rows(p.quaternion, dest_s, p.quaternion),
        opacity=_copy_rows(p.opacity, dest_s, p.opacity),
        features_dc=_copy_rows(p.features_dc, dest_s, p.features_dc),
        features_rest=_copy_rows(p.features_rest, dest_s, p.features_rest),
    )
    anchors = _copy_rows(anchors, dest_s, anchors)
    alive = alive.at[dest_s].set(True, mode="drop")
    zero_moment_rows = zero_moment_rows | do_split  # parent slot moments reset
    zero_moment_rows = zero_moment_rows.at[dest_s].set(True, mode="drop")
    state = jax.tree_util.tree_map(
        lambda x: _copy_rows(x, dest_s, x), state
    )
    n_split = jnp.sum(ok_s)

    # ---- prune (prune_gs, :829-890) ----
    opa = jax.nn.sigmoid(p.opacity)
    scale2n = jnp.exp(p.scaling[:, :2])
    is_prune = opa < spec.prune_opa
    is_prune = is_prune | (jnp.min(scale2n, -1) < 1e-4)
    is_prune = is_prune | jnp.where(
        iter_num > reset_every,
        jnp.max(scale2n, -1)
        > spec.prune_scale3d * spec.original_spatial_scale,
        False,
    )
    # nan prune (prune_nan_gs, :907-916)
    is_prune = is_prune | ~(
        jnp.all(jnp.isfinite(p.offsets), -1)
        & jnp.all(jnp.isfinite(p.scaling), -1)
        & jnp.all(jnp.isfinite(p.quaternion), -1)
    )
    n_prune = jnp.sum(is_prune & alive)
    alive = alive & ~is_prune
    zero_moment_rows = zero_moment_rows | is_prune

    # ---- Adam moment surgery + state reset (zero_state, :683-689) ----
    def zero_rows(x):
        m = zero_moment_rows
        while m.ndim < x.ndim:
            m = m[..., None]
        return jnp.where(m, 0.0, x)

    mu = jax.tree_util.tree_map(zero_rows, mu)
    nu = jax.tree_util.tree_map(zero_rows, nu)
    state = DensifyState(
        grad2d=jnp.zeros_like(state.grad2d),
        count=jnp.zeros_like(state.count),
        vis=state.vis,
        radii=jnp.zeros_like(state.radii),
        seen=state.seen,
    )

    model = SplatModel(params=p, anchors=anchors, alive=alive)
    info = {"n_dup": n_dup, "n_split": n_split, "n_prune": n_prune,
            "n_alive": jnp.sum(alive)}
    return model, state, mu, nu, info


def prune_invisible(
    model: SplatModel,
    state: DensifyState,
    mu: SplatParams,
    nu: SplatParams,
    thresh: float = 1e-4,
):
    """Kill splats rasterized-but-never-visible since the last sweep and
    reset the accumulators (prune_invisible_gs, neural_gaussian.cpp:892-905).
    Splats the tile cap dropped every time (seen == 0) are exempt."""
    is_prune = model.alive & (state.seen > 0) & (state.vis < thresh)
    alive = model.alive & ~is_prune

    def zero_rows(x):
        m = is_prune
        while m.ndim < x.ndim:
            m = m[..., None]
        return jnp.where(m, 0.0, x)

    mu = jax.tree_util.tree_map(zero_rows, mu)
    nu = jax.tree_util.tree_map(zero_rows, nu)
    state = state._replace(
        vis=jnp.zeros_like(state.vis), seen=jnp.zeros_like(state.seen)
    )
    return model._replace(alive=alive), state, mu, nu, jnp.sum(is_prune)


def reset_opacity(model: SplatModel, mu: SplatParams, nu: SplatParams,
                  prune_opa: float):
    """Clamp opacity to 2 * prune_opa and zero its moments (reset_opacity,
    neural_gaussian.cpp:918-926; replace_tensors_to_optimizer)."""
    cap = float(np.log((2 * prune_opa) / (1 - 2 * prune_opa)))
    p = model.params._replace(
        opacity=jnp.minimum(model.params.opacity, cap)
    )
    mu = mu._replace(opacity=jnp.zeros_like(mu.opacity))
    nu = nu._replace(opacity=jnp.zeros_like(nu.opacity))
    return model._replace(params=p), mu, nu
