"""Loss library (jax.numpy, all differentiable).

Reference analog: include/optimizer/loss.cpp:5-92 and
include/optimizer/loss_utils/loss_utils.cpp (SSIM/PSNR).
"""

from __future__ import annotations

import jax
import jax.numpy as jnp

from .ops.ssim import ssim


def sdf_loss(pred_sdf, gt_sdf, pred_isigma):
    """BCE-with-logits of ``-pred_sdf * isigma`` against
    ``sigmoid(-gt_sdf * isigma)`` (loss.cpp:49-79). isigma clamped at 5e2."""
    isigma = jnp.minimum(pred_isigma, 5e2)
    logits = -pred_sdf * isigma
    targets = jnp.clip(jax.nn.sigmoid(-gt_sdf * isigma), 1e-7, 1.0 - 1e-7)
    # numerically-stable bce_with_logits
    bce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return jnp.mean(bce)


def sdf_loss_masked(pred_sdf, gt_sdf, pred_isigma, mask):
    """Masked-mean variant for fixed-shape padded sample buffers (TPU)."""
    isigma = jnp.minimum(pred_isigma, 5e2)
    logits = -pred_sdf * isigma
    targets = jnp.clip(jax.nn.sigmoid(-gt_sdf * isigma), 1e-7, 1.0 - 1e-7)
    bce = jnp.maximum(logits, 0.0) - logits * targets + jnp.log1p(
        jnp.exp(-jnp.abs(logits))
    )
    return masked_mean(bce, mask)


def masked_mean(x, mask):
    """Mean of ``x`` over elements where mask is true (broadcast on trailing
    dims)."""
    m = mask.astype(x.dtype)
    while m.ndim < x.ndim:
        m = m[..., None]
    mb = jnp.broadcast_to(m, x.shape)
    return jnp.sum(x * mb) / jnp.clip(jnp.sum(mb), 1.0)


def eikonal_loss(grad, mask=None):
    """(|grad| - 1)^2 (loss.cpp:81-83)."""
    e = jnp.square(jnp.linalg.norm(grad, axis=-1) - 1.0)
    if mask is None:
        return jnp.mean(e)
    return masked_mean(e, mask)


def curvature_loss(hessian_diag, mask=None):
    """|trace(H)| (loss.cpp:85-90)."""
    c = jnp.abs(jnp.sum(hessian_diag, axis=-1))
    c = jnp.nan_to_num(c)
    if mask is None:
        return jnp.mean(c)
    return masked_mean(c, mask)


def rgb_loss(rgb, rgb_gt, mask=None):
    """L1 (loss.cpp:22-30)."""
    if mask is not None:
        return jnp.mean(jnp.abs((rgb - rgb_gt) * mask))
    return jnp.mean(jnp.abs(rgb - rgb_gt))


def dssim_loss(pred_image, gt_image, mask=None):
    """1 - SSIM over [H, W, 3] images (loss.cpp:37-47)."""
    if mask is not None:
        pred_image = pred_image * mask
        gt_image = gt_image * mask
    return 1.0 - ssim(pred_image, gt_image)


def gs_sdf_loss(gs_sdf, weight):
    """0.5 * sum(w * sdf^2) (loss.cpp:7-11)."""
    return 0.5 * jnp.sum(weight * jnp.square(gs_sdf))


def gs_sdf_normal_loss(gs_normal, sdf_normal, weight):
    """sum(w * |1 - |<n_gs, n_sdf>||) (loss.cpp:13-20; defined, unused in the
    reference main path)."""
    dot = jnp.sum(gs_normal * sdf_normal, axis=-1, keepdims=True)
    err = jnp.abs(1.0 - jnp.abs(dot))
    return jnp.sum(weight * jnp.nan_to_num(err))


def distortion_loss(render_dist):
    """mean(dist^2) (loss.cpp:32-35)."""
    return jnp.mean(jnp.square(render_dist))


def psnr(pred, gt):
    mse = jnp.mean(jnp.square(pred - gt))
    return -10.0 * jnp.log10(jnp.clip(mse, 1e-12))
