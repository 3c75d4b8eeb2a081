"""2DGS splat projection: ray-transform matrices, screen bounds, normals,
and the GS-SDF disk-sample extension.

Reference analog: ``fully_fused_projection_2dgs`` from the gsplat_cpp
submodule (called at neural_gaussian.cpp:188-193; API per SURVEY.md §2.2).

Math (2DGS, Huang et al. SIGGRAPH 2024): a splat is a disk
``P(u,v) = p + s_u r_u u + s_v r_v v``; in camera space
``P_c(u,v) = T_cam [u,v,1]^T`` with ``T_cam = [s_u r_u^c | s_v r_v^c | p_c]``.
``M = K T_cam`` maps uv to homogeneous screen space; a pixel ray (px, py)
meets the disk plane at the cross product of the two pixel planes
``h_u = px * M_2 - M_0``, ``h_v = py * M_2 - M_1`` (rows of M).

Everything is batched [N, ...] jnp — the per-splat 3x3 algebra maps to VPU
element-wise ops and tiny matmuls that XLA fuses into one kernel.
"""

from __future__ import annotations

from typing import NamedTuple

import jax
import jax.numpy as jnp

from ..utils.math import quat_to_rotmat


class Projected(NamedTuple):
    means2d: jnp.ndarray     # [N, 2] projected splat centers (pixels)
    depths: jnp.ndarray      # [N] camera-space z of centers
    M: jnp.ndarray           # [N, 3, 3] uv -> homogeneous screen transform
    normals: jnp.ndarray     # [N, 3] camera-space splat normals (signed)
    radii: jnp.ndarray       # [N] conservative screen-space radius (pixels)
    valid: jnp.ndarray       # [N] bool — survives culling
    samples: jnp.ndarray     # [N, 3] world-space disk sample (GS-SDF ext.)
    samples_w: jnp.ndarray   # [N, 1] gaussian weight of the disk sample


def project_2dgs(
    means: jnp.ndarray,      # [N, 3] world
    quats: jnp.ndarray,      # [N, 4] wxyz
    scales: jnp.ndarray,     # [N, 3] (third component unused, 2DGS)
    viewmat: jnp.ndarray,    # [4, 4] world->cam
    K: jnp.ndarray,          # [3, 3]
    width: int,
    height: int,
    near: float,
    far: float,
    radius_clip: float = 0.0,
    sample_eps: jnp.ndarray | None = None,  # [N, 2] N(0,1) for disk samples
) -> Projected:
    n = means.shape[0]
    Rwc = viewmat[:3, :3]
    twc = viewmat[:3, 3]

    R_splat = quat_to_rotmat(quats)                      # [N, 3, 3]
    p_c = means @ Rwc.T + twc                            # [N, 3]
    R_c = jnp.einsum("ij,njk->nik", Rwc, R_splat)        # [N, 3, 3]

    su = scales[:, 0:1]
    sv = scales[:, 1:2]
    t_u = R_c[..., 0] * su                               # [N, 3]
    t_v = R_c[..., 1] * sv
    # T_cam columns: [t_u, t_v, p_c]
    T_cam = jnp.stack([t_u, t_v, p_c], axis=-1)          # [N, 3, 3]
    M = jnp.einsum("ij,njk->nik", K, T_cam)              # [N, 3, 3]

    z = p_c[:, 2]
    means2d = jnp.stack(
        [
            K[0, 0] * p_c[:, 0] / jnp.where(z != 0, z, 1e-6) + K[0, 2],
            K[1, 1] * p_c[:, 1] / jnp.where(z != 0, z, 1e-6) + K[1, 2],
        ],
        -1,
    )

    # normal: disk plane normal in camera space, flipped toward the viewer
    n_c = R_c[..., 2]
    sign = jnp.where(jnp.sum(n_c * p_c, -1, keepdims=True) > 0, -1.0, 1.0)
    normals = n_c * sign

    # conservative screen radius: project 8 points on the alpha-cutoff rim.
    # alpha = opa * exp(-rho/2) >= 1/255 holds out to sqrt(2 ln 255) ~ 3.33
    # sigma; the 8-point convex hull underestimates the projected ellipse by
    # up to cos(pi/8), so scale the max distance back up.
    cutoff = 3.33
    hull_fix = jnp.float32(1.0 / jnp.cos(jnp.pi / 8))
    angles = jnp.linspace(0.0, 2 * jnp.pi, 8, endpoint=False)
    rim_uv = cutoff * jnp.stack(
        [jnp.cos(angles), jnp.sin(angles), jnp.ones_like(angles) / cutoff], -1
    )  # [8, 3] (w=1)
    rim_h = jnp.einsum("nij,kj->nki", M, rim_uv)          # [N, 8, 3]
    rim_w = rim_h[..., 2]
    safe_w = jnp.where(jnp.abs(rim_w) > 1e-6, rim_w, 1e-6)
    rim_xy = rim_h[..., :2] / safe_w[..., None]
    behind = jnp.any(rim_w <= 1e-6, axis=-1)              # rim crosses camera
    d = jnp.linalg.norm(rim_xy - means2d[:, None, :], axis=-1)
    radii = jnp.where(behind, jnp.float32(1e6), hull_fix * jnp.max(d, axis=-1))
    radii = jax.lax.stop_gradient(radii)

    inside = (
        (means2d[:, 0] + radii > 0)
        & (means2d[:, 0] - radii < width)
        & (means2d[:, 1] + radii > 0)
        & (means2d[:, 1] - radii < height)
    )
    valid = (z > near) & (z < far) & (radii > radius_clip) & inside

    # GS-SDF extension: one gaussian-distributed point on each splat disk in
    # world space + its gaussian weight (samples/samples_weights of the
    # modified fully_fused_projection_2dgs; SURVEY.md §2.2)
    if sample_eps is None:
        sample_eps = jnp.zeros((n, 2), means.dtype)
    eu = sample_eps[:, 0:1]
    ev = sample_eps[:, 1:2]
    r_u_w = R_splat[..., 0]
    r_v_w = R_splat[..., 1]
    samples = means + su * r_u_w * eu + sv * r_v_w * ev
    samples_w = jnp.exp(-0.5 * (eu ** 2 + ev ** 2))

    return Projected(
        means2d=means2d,
        depths=z,
        M=M,
        normals=normals,
        radii=radii,
        valid=valid,
        samples=samples,
        samples_w=samples_w,
    )
