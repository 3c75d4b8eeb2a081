"""Full 2DGS render pipeline: splat model -> images + densify/SDF-reg taps.

Reference analog: ``rasterization_2dgs_sdf`` + ``NeuralGS::render``
(neural_gaussian.cpp:129-271,495-566): project -> SH colors -> tile encode ->
rasterize; ED depth = accumulated/alpha; normals to world; meta carries the
GS-SDF extension tensors (per-splat disk samples + weights, visibilities)
and the densify gradient tap.

Everything is one jit graph of static shape [C] splats x [H, W] pixels.
"""

from __future__ import annotations

from typing import Dict, NamedTuple, Optional

import jax
import jax.numpy as jnp

from .model import SplatModel, generate_gaussian
from .projection import project_2dgs
from .rasterize_tiled import rasterize_tiled
from .sh import eval_sh


class RenderSettings(NamedTuple):
    width: int
    height: int
    near: float = 0.05
    far: float = 300.0
    sh_degree: int = 0          # active degree (sh_degree_to_use_)
    tile_size: int = 16
    tile_cap: int = 512
    tile_expand: int = 64
    tile_expand_small: int = 0  # >0: two-bucket entry budget (see tile_encode)
    tile_batch: int = 16
    bck_color: int = 0          # 0 black / 1 white / 2 random


def _pose_to_viewmat(pose_c2w: jnp.ndarray) -> jnp.ndarray:
    """[3|4, 4] camera-to-world -> [4, 4] world-to-camera
    (NeuralGS::render, neural_gaussian.cpp:503-513)."""
    R = pose_c2w[:3, :3]
    t = pose_c2w[:3, 3]
    Rt = R.T
    top = jnp.concatenate([Rt, (-Rt @ t)[:, None]], axis=1)
    return jnp.concatenate(
        [top, jnp.array([[0.0, 0.0, 0.0, 1.0]], pose_c2w.dtype)], axis=0
    )


def render_splats(
    model: SplatModel,
    pose_c2w: jnp.ndarray,      # [3|4, 4]
    K: jnp.ndarray,             # [3, 3]
    settings: RenderSettings,
    *,
    training: bool = True,
    key: Optional[jax.Array] = None,       # disk samples + random background
    pix_delta: Optional[jnp.ndarray] = None,  # [C, 2] densify tap
    entry_pix_delta: Optional[jnp.ndarray] = None,  # [T, cap, 2] absgrad tap
    center_reg: bool = False,
) -> Dict[str, jnp.ndarray]:
    """Returns dict with [H, W, .] images and per-splat meta:

    color, depth (expected, = accum/alpha), median, normal (world), alpha,
    distort, visibilities [C], samples [C, 3], samples_w [C, 1],
    visible [C] bool, radii [C].
    """
    xyz, quats, scales, opacity, sh = generate_gaussian(model, training)
    c = xyz.shape[0]
    viewmat = _pose_to_viewmat(pose_c2w)

    if key is None:
        key = jax.random.PRNGKey(0)
    k_disk, k_bg = jax.random.split(key)
    sample_eps = jax.random.normal(k_disk, (c, 2))

    proj = project_2dgs(
        xyz,
        quats,
        scales,
        viewmat,
        K,
        settings.width,
        settings.height,
        settings.near,
        settings.far,
        sample_eps=sample_eps,
    )
    visible = proj.valid & model.alive

    # SH -> per-splat view colors (get_view_colors, neural_gaussian.cpp:199)
    cam_pos = pose_c2w[:3, 3]
    dirs = xyz - cam_pos[None]
    dirs = dirs * jax.lax.rsqrt(jnp.sum(dirs * dirs, -1, keepdims=True) + 1e-24)
    colors = eval_sh(settings.sh_degree, sh, dirs)

    if pix_delta is None:
        pix_delta = jnp.zeros((c, 2), xyz.dtype)

    res = rasterize_tiled(
        proj.means2d,
        proj.M,
        proj.depths,
        proj.normals,
        colors,
        opacity,
        visible,
        proj.radii,
        settings.width,
        settings.height,
        tile_size=settings.tile_size,
        tile_cap=settings.tile_cap,
        tile_expand=settings.tile_expand,
        tile_expand_small=settings.tile_expand_small,
        tile_batch=settings.tile_batch,
        pix_delta=pix_delta,
        entry_pix_delta=entry_pix_delta,
        # eval/novel-view renders never consume the per-splat visibility
        # reduction (pruning statistics + GS->SDF vis mask are train-only,
        # neural_mapping.cpp:426-430) — skip its [T*cap]-row segment-max
        need_vis=training,
    )

    alpha = res["alpha"]
    # expected (ED) depth: accumulated / alpha (neural_gaussian.cpp:231-234)
    depth = jnp.nan_to_num(res["depth"] / jnp.where(alpha > 0, alpha, 1.0))
    # normals to world space (neural_gaussian.cpp:237-241)
    Rcw = pose_c2w[:3, :3]
    normal_world = res["normal"] @ Rcw.T

    color = res["color"]
    if settings.bck_color == 1:
        color = color + (1.0 - alpha)
    elif settings.bck_color == 2:
        bg = jax.random.uniform(
            k_bg, (settings.height, settings.width, 3), color.dtype
        )
        color = color + (1.0 - alpha) * bg

    if center_reg:
        samples = xyz
        samples_w = jnp.ones_like(proj.samples_w)
    else:
        samples = proj.samples
        samples_w = proj.samples_w

    return {
        "color": color,
        "depth": depth,
        "median": res["median"],
        "normal": normal_world,
        "alpha": alpha,
        "distort": res["distort"],
        "visibilities": res["visibilities"],
        "samples": samples,
        "samples_w": samples_w,
        "visible": visible,
        "binned": res["binned"],
        "radii": proj.radii,
        "drop_frac": res["drop_frac"],
        "drop_vis": res["drop_vis"],
        "chunk_active": res["chunk_active"],
        "clamp_frac": res["clamp_frac"],
        **({"tile_lists": res["tile_lists"]}
           if "tile_lists" in res else {}),
    }
