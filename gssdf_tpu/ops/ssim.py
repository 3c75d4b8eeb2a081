"""Windowed SSIM + PSNR via depthwise convolution.

Reference analog: include/optimizer/loss_utils/loss_utils.cpp:5-131 —
11x11 gaussian window (sigma 1.5), per-channel conv2d, C1=0.01^2, C2=0.03^2.
Implemented with ``lax.conv_general_dilated`` feature-group convolution so XLA
fuses it onto the MXU/VPU.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np


@functools.lru_cache(maxsize=8)
def _gaussian_window(window_size: int, sigma: float) -> np.ndarray:
    """Cached as numpy — caching a jnp array would leak a tracer constant
    across jit traces."""
    xs = np.arange(window_size, dtype=np.float64) - window_size // 2
    g = np.exp(-(xs ** 2) / (2.0 * sigma ** 2))
    g /= g.sum()
    return np.outer(g, g).astype(np.float32)


def _depthwise_conv(img, window):
    """img: [C, H, W]; window: [k, k] applied per channel, 'valid'."""
    c = img.shape[0]
    k = window.shape[0]
    lhs = img[None]  # [1, C, H, W]
    rhs = jnp.broadcast_to(window, (c, 1, k, k))
    return jax.lax.conv_general_dilated(
        lhs,
        rhs,
        window_strides=(1, 1),
        padding="VALID",
        dimension_numbers=("NCHW", "OIHW", "NCHW"),
        feature_group_count=c,
        # f32 accumulation: TPU convs default to bf16 multiplies, which
        # wrecks the variance terms (sigma = E[x^2] - E[x]^2 cancellation)
        # badly enough to report SSIM > 1
        precision=jax.lax.Precision.HIGHEST,
    )[0]


def ssim(img1, img2, window_size: int = 11, sigma: float = 1.5):
    """Mean SSIM over [H, W, C] (or [C, H, W]) float images in [0,1].

    Matches the reference's torch implementation: valid-padding windowed
    means, biased variances, C1=0.01^2, C2=0.03^2.
    """
    if img1.ndim == 3 and img1.shape[-1] in (1, 3, 4):
        img1 = jnp.moveaxis(img1, -1, 0)
        img2 = jnp.moveaxis(img2, -1, 0)
    window = jnp.asarray(_gaussian_window(window_size, sigma), img1.dtype)

    mu1 = _depthwise_conv(img1, window)
    mu2 = _depthwise_conv(img2, window)
    mu1_sq, mu2_sq, mu1_mu2 = mu1 * mu1, mu2 * mu2, mu1 * mu2
    sigma1_sq = _depthwise_conv(img1 * img1, window) - mu1_sq
    sigma2_sq = _depthwise_conv(img2 * img2, window) - mu2_sq
    sigma12 = _depthwise_conv(img1 * img2, window) - mu1_mu2

    C1, C2 = 0.01 ** 2, 0.03 ** 2
    ssim_map = ((2 * mu1_mu2 + C1) * (2 * sigma12 + C2)) / (
        (mu1_sq + mu2_sq + C1) * (sigma1_sq + sigma2_sq + C2)
    )
    return jnp.mean(ssim_map)
