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


def splat_coeffs(
    means2d: jnp.ndarray,    # [K, 2]
    M: jnp.ndarray,          # [K, 3, 3]
    opacities: jnp.ndarray,  # [K]
    pix_delta: jnp.ndarray,  # [K, 2] densify tap (zeros)
) -> jnp.ndarray:
    """Per-splat pixel-evaluation coefficients [K, 15].

    The uv-intersection cross product distributes over the pixel position:
    s = A + px*B + py*C with A = M0 x M1, B = M1 x M2, C = M2 x M0 (rows of
    M), so per-(pixel, splat) evaluation is a handful of fmas on [P, K]
    planes instead of [P, K, 3] cross-product temporaries. The densify shift
    folds into A and the center. Layout:
      [0:3] A  [3:6] B  [6:9] C  [9:12] (dA, dB, dC)  [12:14] center  [14] opa
    """
    M0 = M[:, 0, :]
    M1 = M[:, 1, :]
    M2 = M[:, 2, :]
    B = jnp.cross(M1, M2)
    C = jnp.cross(M2, M0)
    A = jnp.cross(M0, M1)
    pdx = pix_delta[:, 0:1]
    pdy = pix_delta[:, 1:2]
    A = A - pdx * B - pdy * C
    dABC = jnp.stack(
        [jnp.sum(M2 * A, -1), jnp.sum(M2 * B, -1), jnp.sum(M2 * C, -1)], -1
    )
    center = means2d + pix_delta
    return jnp.concatenate(
        [A, B, C, dABC, center, opacities[:, None]], axis=-1
    )


def pixel_weights_from_coeffs(
    px: jnp.ndarray,      # [P]
    py: jnp.ndarray,      # [P]
    coeffs: jnp.ndarray,  # [K, 15] from splat_coeffs
):
    """Returns (alpha [P, K], depth_at_intersection [P, K])."""
    A = coeffs[:, 0:3]
    B = coeffs[:, 3:6]
    C = coeffs[:, 6:9]
    dA, dB, dC = coeffs[:, 9], coeffs[:, 10], coeffs[:, 11]
    mx, my = coeffs[:, 12], coeffs[:, 13]
    opa = coeffs[:, 14]

    pxc = px[:, None]                              # [P, 1]
    pyc = py[:, None]
    sx = A[None, :, 0] + pxc * B[None, :, 0] + pyc * C[None, :, 0]  # [P, K]
    sy = A[None, :, 1] + pxc * B[None, :, 1] + pyc * C[None, :, 1]
    sz = A[None, :, 2] + pxc * B[None, :, 2] + pyc * C[None, :, 2]
    safe = jnp.where(jnp.abs(sz) > 1e-9, sz, 1e-9)
    inv_sz = 1.0 / safe
    rho3d = (sx * sx + sy * sy) * (inv_sz * inv_sz)

    dx = pxc - mx[None]
    dy = pyc - my[None]
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    rho = jnp.minimum(rho3d, rho2d)

    depth = (dA[None] + pxc * dB[None] + pyc * dC[None]) * inv_sz

    gauss = jnp.exp(-0.5 * rho)
    alpha = jnp.minimum(opa[None] * gauss, MAX_ALPHA)
    alpha = jnp.where(alpha >= ALPHA_MIN, alpha, 0.0)
    # intersections behind the camera don't contribute
    alpha = jnp.where(depth > 1e-6, alpha, 0.0)
    return alpha, depth


def splat_pixel_weights(
    px: jnp.ndarray,
    py: jnp.ndarray,
    means2d: jnp.ndarray,
    M: jnp.ndarray,
    opacities: jnp.ndarray,
    pix_delta: jnp.ndarray,
):
    """(alpha [P, K], depth [P, K]) — convenience wrapper."""
    return pixel_weights_from_coeffs(
        px, py, splat_coeffs(means2d, M, opacities, pix_delta)
    )


def _cumsum_mats(k: int, dtype):
    """(inclusive, exclusive) [K, K] upper-triangular ones: row-wise cumsum
    along the splat axis as ONE matmul — rides the MXU instead of XLA's
    log-depth cumulative-op expansion."""
    r = jax.lax.broadcasted_iota(jnp.int32, (k, k), 0)
    c = jax.lax.broadcasted_iota(jnp.int32, (k, k), 1)
    incl = (r <= c).astype(dtype)
    excl = (r < c).astype(dtype)
    return incl, excl


def composite(
    alpha: jnp.ndarray,   # [P, K] in depth-sorted (front-to-back) order
    feats: jnp.ndarray,   # [K, C] per-splat features to accumulate
    depths: jnp.ndarray,  # [P, K] per-pixel intersection depth
):
    """Front-to-back compositing, MXU-formulated.

    Transmittance is exp of a triangular-matmul cumsum of log(1 - alpha);
    the distortion/median cumulative sums are triangular matmuls too. All
    cumulative structure lands on the MXU as [P, K] @ [K, K].
    Matches CUDA early-stop semantics: a splat whose inclusion would drop
    transmittance below T_EPS is excluded.
    """
    k = alpha.shape[-1]
    m_incl, m_excl = _cumsum_mats(k, alpha.dtype)

    # log-space exclusive cumprod (alpha <= MAX_ALPHA so log is finite)
    log_one_m = jnp.log1p(-alpha)
    cl_incl = jnp.dot(log_one_m, m_incl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    t_incl = jnp.exp(cl_incl)
    t_excl = jnp.exp(cl_incl - log_one_m)
    keep = t_incl >= T_EPS
    w = jnp.where(keep, t_excl * alpha, 0.0)  # [P, K]

    out = jnp.dot(w, feats, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [P, C]
    acc = jnp.sum(w, axis=-1, keepdims=True)  # [P, 1]
    depth_mean = jnp.sum(w * depths, axis=-1, keepdims=True)

    # median depth: first splat where cumulative alpha crosses 0.5
    cum_alpha = jnp.dot(w, m_incl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    crossed = cum_alpha >= 0.5
    any_cross = jnp.any(crossed, axis=-1, keepdims=True)
    med_idx = jnp.argmax(crossed, axis=-1)
    depth_med = jnp.take_along_axis(depths, med_idx[:, None], axis=-1)
    depth_med = jnp.where(any_cross, depth_med, 0.0)

    # distortion (2DGS): 2 * sum_i w_i (m_i * A_i - B_i), A/B exclusive sums
    m = depths
    a_excl = jnp.dot(w, m_excl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    b_excl = jnp.dot(w * m, m_excl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
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
