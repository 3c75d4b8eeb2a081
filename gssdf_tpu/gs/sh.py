"""Real spherical-harmonics color evaluation (degrees 0-3).

Reference analog: ``gsplat_cpp::get_view_colors`` (neural_gaussian.cpp:199-200)
— 3DGS convention: color = SH(dir) . coeffs + 0.5, clamped at 0.

Coefficients are the standard real-SH constants (Sloan, "Stupid SH Tricks").
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

_C0 = 0.28209479177387814
_C1 = 0.4886025119029199
_C2 = (
    1.0925484305920792,
    -1.0925484305920792,
    0.31539156525252005,
    -1.0925484305920792,
    0.5462742152960396,
)
_C3 = (
    -0.5900435899266435,
    2.890611442640554,
    -0.4570457994644658,
    0.3731763325901154,
    -0.4570457994644658,
    1.445305721320277,
    -0.5900435899266435,
)


def eval_sh(degree: int, coeffs: jnp.ndarray, dirs: jnp.ndarray) -> jnp.ndarray:
    """coeffs: [N, K, 3] with K >= (degree+1)^2; dirs: [N, 3] unit.
    Returns colors [N, 3] (= SH dot coeffs + 0.5, clamped at 0)."""
    res = _C0 * coeffs[:, 0]
    if degree >= 1:
        x, y, z = dirs[:, 0:1], dirs[:, 1:2], dirs[:, 2:3]
        res = (
            res
            - _C1 * y * coeffs[:, 1]
            + _C1 * z * coeffs[:, 2]
            - _C1 * x * coeffs[:, 3]
        )
        if degree >= 2:
            xx, yy, zz = x * x, y * y, z * z
            xy, yz, xz = x * y, y * z, x * z
            res = (
                res
                + _C2[0] * xy * coeffs[:, 4]
                + _C2[1] * yz * coeffs[:, 5]
                + _C2[2] * (2.0 * zz - xx - yy) * coeffs[:, 6]
                + _C2[3] * xz * coeffs[:, 7]
                + _C2[4] * (xx - yy) * coeffs[:, 8]
            )
            if degree >= 3:
                res = (
                    res
                    + _C3[0] * y * (3 * xx - yy) * coeffs[:, 9]
                    + _C3[1] * xy * z * coeffs[:, 10]
                    + _C3[2] * y * (4 * zz - xx - yy) * coeffs[:, 11]
                    + _C3[3] * z * (2 * zz - 3 * xx - 3 * yy) * coeffs[:, 12]
                    + _C3[4] * x * (4 * zz - xx - yy) * coeffs[:, 13]
                    + _C3[5] * z * (xx - yy) * coeffs[:, 14]
                    + _C3[6] * x * (xx - 3 * yy) * coeffs[:, 15]
                )
    return jnp.maximum(res + 0.5, 0.0)


def view_colors(
    degree: int, coeffs: jnp.ndarray, means: jnp.ndarray, cam_pos: jnp.ndarray
) -> jnp.ndarray:
    """Per-splat view-dependent colors from SH coeffs [N, K, 3]."""
    d = means - cam_pos
    d = d * jax.lax.rsqrt(jnp.sum(d * d, -1, keepdims=True) + 1e-24)
    return eval_sh(degree, coeffs, d)
