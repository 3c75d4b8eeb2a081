"""Pure-JAX 2DGS rasterizer — dense (every pixel x every splat) reference
implementation, plus shared per-pixel splat math used by the tiled/Pallas
paths.

Reference analog: ``rasterize_to_pixels_2dgs`` (gsplat_cpp submodule, called
at neural_gaussian.cpp:218-223).

TPU-first key idea (ARCHITECTURE.md): front-to-back compositing over
depth-sorted splats is an exclusive cumprod of (1 - alpha) along the splat
axis, so every render target (color/depth/normal/acc) is the matmul
``w[pixels, splats] @ feats[splats, ch]`` — MXU work, no per-pixel loop.

The ``pix_delta`` input is the densification gradient tap: a zeros [N, 2]
array added to the splat's screen position; d(loss)/d(pix_delta) is exactly
the reference's ``gradient_2dgs``/``densify`` tensor (neural_gaussian.cpp:
215-217, 253).
"""

from __future__ import annotations

from typing import Dict, Optional

import jax
import jax.numpy as jnp

ALPHA_MIN = 1.0 / 255.0
T_EPS = 1e-4
MAX_ALPHA = 0.999
# 2DGS screen-space low-pass filter: rho_2d = FILTER_INV_SQUARE * dist^2
FILTER_INV_SQUARE = 2.0


def splat_pixel_weights(
    px: jnp.ndarray,         # [P] pixel centers x
    py: jnp.ndarray,         # [P]
    means2d: jnp.ndarray,    # [K, 2]
    M: jnp.ndarray,          # [K, 3, 3]
    opacities: jnp.ndarray,  # [K]
    pix_delta: jnp.ndarray,  # [K, 2] densify tap (zeros)
):
    """Returns (alpha [P, K], depth_at_intersection [P, K]).

    The uv intersection solves cross(h_u, h_v) with
    h_u = px' * M_2 - M_0, h_v = py' * M_2 - M_1 (rows of M), where
    px' = px - delta shifts the splat rigidly in screen space.
    """
    pxk = px[:, None] - pix_delta[None, :, 0]     # [P, K]
    pyk = py[:, None] - pix_delta[None, :, 1]

    M0 = M[:, 0, :]   # [K, 3]
    M1 = M[:, 1, :]
    M2 = M[:, 2, :]

    # h_u, h_v: [P, K, 3]
    h_u = pxk[..., None] * M2[None] - M0[None]
    h_v = pyk[..., None] * M2[None] - M1[None]
    s = jnp.cross(h_u, h_v)
    sz = s[..., 2]
    safe = jnp.where(jnp.abs(sz) > 1e-9, sz, 1e-9)
    u = s[..., 0] / safe
    v = s[..., 1] / safe

    rho3d = u * u + v * v
    dx = pxk - means2d[None, :, 0]
    dy = pyk - means2d[None, :, 1]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)

    depth = (
        M2[None, :, 0] * u + M2[None, :, 1] * v + M2[None, :, 2]
    )  # z at the uv intersection

    gauss = jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(opacities[None, :] * gauss, MAX_ALPHA)
    alpha = jnp.where(alpha >= ALPHA_MIN, alpha, 0.0)
    # intersections behind the camera don't contribute
    alpha = jnp.where(depth > 1e-6, alpha, 0.0)
    return alpha, depth


def composite(
    alpha: jnp.ndarray,   # [P, K] in depth-sorted (front-to-back) order
    feats: jnp.ndarray,   # [K, C] per-splat features to accumulate
    depths: jnp.ndarray,  # [P, K] per-pixel intersection depth
):
    """Front-to-back compositing as exclusive-cumprod + matmul.

    Returns dict with weights w [P, K] and accumulated channels.
    Matches CUDA early-stop semantics: a splat whose inclusion would drop
    transmittance below T_EPS is excluded.
    """
    one_m = 1.0 - alpha
    # exclusive cumprod: T_i = prod_{j<i} (1 - a_j)
    t_incl = jnp.cumprod(one_m, axis=-1)
    t_excl = jnp.concatenate(
        [jnp.ones_like(t_incl[..., :1]), t_incl[..., :-1]], axis=-1
    )
    keep = t_incl >= T_EPS
    w = jnp.where(keep, t_excl * alpha, 0.0)  # [P, K]

    out = jnp.dot(w, feats, preferred_element_type=jnp.float32)  # [P, C]
    acc = jnp.sum(w, axis=-1, keepdims=True)  # [P, 1]
    depth_mean = jnp.sum(w * depths, axis=-1, keepdims=True)

    # median depth: first splat where cumulative alpha crosses 0.5
    cum_alpha = jnp.cumsum(w, axis=-1)
    crossed = cum_alpha >= 0.5
    any_cross = jnp.any(crossed, axis=-1, keepdims=True)
    med_idx = jnp.argmax(crossed, axis=-1)
    depth_med = jnp.take_along_axis(depths, med_idx[:, None], axis=-1)
    depth_med = jnp.where(any_cross, depth_med, 0.0)

    # distortion (2DGS): 2 * sum_i w_i (m_i * A_i - B_i), A/B exclusive sums
    m = depths
    a_excl = jnp.concatenate(
        [jnp.zeros_like(cum_alpha[..., :1]), cum_alpha[..., :-1]], axis=-1
    )
    wm = w * m
    b_excl = jnp.concatenate(
        [jnp.zeros_like(wm[..., :1]), jnp.cumsum(wm, axis=-1)[..., :-1]],
        axis=-1,
    )
    distort = 2.0 * jnp.sum(w * (m * a_excl - b_excl), axis=-1, keepdims=True)

    return {
        "w": w,
        "out": out,
        "alpha": acc,
        "depth": depth_mean,
        "median": depth_med,
        "distort": distort,
    }


def rasterize_dense(
    means2d: jnp.ndarray,    # [N, 2]
    M: jnp.ndarray,          # [N, 3, 3]
    depths_c: jnp.ndarray,   # [N] center depths (sort key)
    normals: jnp.ndarray,    # [N, 3] camera-space
    colors: jnp.ndarray,     # [N, 3]
    opacities: jnp.ndarray,  # [N]
    valid: jnp.ndarray,      # [N] bool
    width: int,
    height: int,
    pix_delta: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
) -> Dict[str, jnp.ndarray]:
    """O(P*N) reference rasterizer. Returns [H, W, .] images + per-splat
    visibilities [N]. Use for tests/small scenes; the tiled path is the
    production one."""
    n = means2d.shape[0]
    if pix_delta is None:
        pix_delta = jnp.zeros((n, 2), means2d.dtype)

    order = jnp.argsort(jnp.where(valid, depths_c, jnp.inf))
    m2d = means2d[order]
    Ms = M[order]
    nrm = normals[order]
    col = colors[order]
    opa = jnp.where(valid, opacities, 0.0)[order]
    pdel = pix_delta[order]

    ys = jnp.arange(height, dtype=jnp.float32) + 0.5
    xs = jnp.arange(width, dtype=jnp.float32) + 0.5
    gy, gx = jnp.meshgrid(ys, xs, indexing="ij")
    px = gx.reshape(-1)
    py = gy.reshape(-1)

    alpha, depth = splat_pixel_weights(px, py, m2d, Ms, opa, pdel)
    feats = jnp.concatenate([col, nrm], axis=-1)  # [K, 6]
    res = composite(alpha, feats, depth)

    w = res["w"]
    vis_sorted = jnp.max(w, axis=0)  # [K] max pixel weight per splat
    inv = jnp.argsort(order)
    visibilities = vis_sorted[inv]

    color = res["out"][:, :3]
    normal = res["out"][:, 3:6]
    if background is not None:
        color = color + (1.0 - res["alpha"]) * background[None, :]

    hw = (height, width)
    return {
        "color": color.reshape(*hw, 3),
        "normal": normal.reshape(*hw, 3),
        "alpha": res["alpha"].reshape(*hw, 1),
        "depth": res["depth"].reshape(*hw, 1),
        "median": res["median"].reshape(*hw, 1),
        "distort": res["distort"].reshape(*hw, 1),
        "visibilities": visibilities,
    }
