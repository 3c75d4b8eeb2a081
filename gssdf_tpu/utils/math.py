"""Rotation / quaternion / grid math used across the framework (jax.numpy).

Reference analog: include/utils/utils.cpp:538-720 (quat<->rot, rotation-6d,
meshgrid_3d) and include/neural_gaussian/gauss_utils.hpp.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp


def normalize(v: jnp.ndarray, axis: int = -1, eps: float = 1e-12) -> jnp.ndarray:
    """Safe-gradient normalize: rsqrt(|v|^2 + eps^2) is finite at v = 0,
    where norm()'s derivative would be NaN and poison the backward pass."""
    n2 = jnp.sum(v * v, axis=axis, keepdims=True)
    return v * jax.lax.rsqrt(n2 + eps * eps)


def quat_to_rotmat(quat: jnp.ndarray) -> jnp.ndarray:
    """[..., 4] (w, x, y, z) -> [..., 3, 3]. Normalizes internally."""
    q = normalize(quat)
    w, x, y, z = q[..., 0], q[..., 1], q[..., 2], q[..., 3]
    r00 = 1 - 2 * (y * y + z * z)
    r01 = 2 * (x * y - w * z)
    r02 = 2 * (x * z + w * y)
    r10 = 2 * (x * y + w * z)
    r11 = 1 - 2 * (x * x + z * z)
    r12 = 2 * (y * z - w * x)
    r20 = 2 * (x * z - w * y)
    r21 = 2 * (y * z + w * x)
    r22 = 1 - 2 * (x * x + y * y)
    return jnp.stack(
        [
            jnp.stack([r00, r01, r02], -1),
            jnp.stack([r10, r11, r12], -1),
            jnp.stack([r20, r21, r22], -1),
        ],
        -2,
    )


def rotmat_to_quat(R: jnp.ndarray, eps: float = 1e-8) -> jnp.ndarray:
    """[..., 3, 3] -> [..., 4] (w, x, y, z) via the axis-angle route used by
    the reference's SDF init (neural_gaussian.cpp:71-100): robust to
    angle ~ 0 by nan_to_num + identity fallback."""
    trace = R[..., 0, 0] + R[..., 1, 1] + R[..., 2, 2]
    angle = jnp.arccos(jnp.clip((trace - 1.0) * 0.5, -1.0, 1.0))[..., None]
    axis = jnp.stack(
        [
            R[..., 2, 1] - R[..., 1, 2],
            R[..., 0, 2] - R[..., 2, 0],
            R[..., 1, 0] - R[..., 0, 1],
        ],
        -1,
    ) / jnp.clip(2.0 * jnp.sin(angle), eps)
    axis = normalize(axis)
    quat = jnp.concatenate(
        [jnp.cos(angle * 0.5), jnp.sin(angle * 0.5) * axis], -1
    )
    quat = jnp.nan_to_num(quat)
    # degenerate (angle==0) rows become [0,0,0,0] after nan_to_num -> identity
    bad = jnp.sum(quat * quat, -1, keepdims=True) < 0.5
    identity = jnp.broadcast_to(jnp.array([1.0, 0.0, 0.0, 0.0]), quat.shape)
    return jnp.where(bad, identity, quat)


def rotation_6d_to_matrix(d6: jnp.ndarray) -> jnp.ndarray:
    """Gram-Schmidt 6D rotation representation (Zhou et al.) -> [..., 3, 3]
    with columns (b1, b2, b3). Matches utils.cpp:693."""
    a1, a2 = d6[..., :3], d6[..., 3:]
    b1 = normalize(a1)
    b2 = normalize(a2 - jnp.sum(b1 * a2, -1, keepdims=True) * b1)
    b3 = jnp.cross(b1, b2)
    return jnp.stack([b1, b2, b3], axis=-1)


def random_quat(key: jax.Array, n: int) -> jnp.ndarray:
    """Uniform random unit quaternions [n, 4] (gauss_utils.hpp analog)."""
    u = jax.random.uniform(key, (n, 3))
    w = jnp.sqrt(1 - u[:, 0]) * jnp.sin(2 * jnp.pi * u[:, 1])
    x = jnp.sqrt(1 - u[:, 0]) * jnp.cos(2 * jnp.pi * u[:, 1])
    y = jnp.sqrt(u[:, 0]) * jnp.sin(2 * jnp.pi * u[:, 2])
    z = jnp.sqrt(u[:, 0]) * jnp.cos(2 * jnp.pi * u[:, 2])
    return jnp.stack([w, x, y, z], -1)


def num_sh_bases(degree: int) -> int:
    return (degree + 1) ** 2


def meshgrid_3d(
    x0: float, x1: float, y0: float, y1: float, z0: float, z1: float, res: float
) -> jnp.ndarray:
    """Dense [Nx, Ny, Nz, 3] grid of cell coordinates (utils.cpp:674)."""
    xs = jnp.arange(x0, x1, res)
    ys = jnp.arange(y0, y1, res)
    zs = jnp.arange(z0, z1, res)
    gx, gy, gz = jnp.meshgrid(xs, ys, zs, indexing="ij")
    return jnp.stack([gx, gy, gz], axis=-1)


def logit(p):
    return jnp.log(p) - jnp.log1p(-p)


def exp_lr_schedule(step_ratio, lr_init: float, lr_final: float):
    """Log-linear interpolation (neural_gaussian.cpp:616-617)."""
    return jnp.exp(
        jnp.log(lr_init) * (1.0 - step_ratio) + jnp.log(lr_final) * step_ratio
    )
