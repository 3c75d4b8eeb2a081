"""LPIPS (VGG16) in pure JAX, loaded from a local weights file.

Reference analog: eval/image_metrics/lpipsPyTorch + the ``lpips`` package
(metrics.py:25-157). The sealed bench environment has no network egress and
no pretrained torch weights, so the metric is implemented here end to end
and gated on a weights archive:

  * env var ``GSSDF_LPIPS_WEIGHTS`` or ``<repo>/weights/lpips_vgg.npz``
  * produced ONCE on any machine with internet by::

        import lpips, numpy as np, torch
        m = lpips.LPIPS(net="vgg")
        out = {}
        for i, blk in enumerate(m.net.slices()):  # older lpips: m.net.slice1..5
            pass
        # robust version — walk the torchvision VGG features + lin heads:
        feats = m.net  # lpips.pretrained_networks.vgg16
        convs = [l for l in feats.slice1] + [l for l in feats.slice2] + \
                [l for l in feats.slice3] + [l for l in feats.slice4] + \
                [l for l in feats.slice5]
        ci = 0
        for l in convs:
            if isinstance(l, torch.nn.Conv2d):
                out[f"conv{ci}_w"] = l.weight.detach().numpy()
                out[f"conv{ci}_b"] = l.bias.detach().numpy()
                ci += 1
        for i, lin in enumerate(m.lins):
            out[f"lin{i}_w"] = lin.model[-1].weight.detach().numpy()[0, :, 0, 0]
        np.savez("lpips_vgg.npz", **out)

The npz schema: ``conv{0..12}_w`` [Cout, Cin, 3, 3], ``conv{0..12}_b``
[Cout] (the 13 VGG16 convs), ``lin{0..4}_w`` [C] (the learned per-channel
LPIPS weights for relu1_2/2_2/3_3/4_3/5_3).

Without weights, callers get ``None`` and the eval jsons carry an explicit
unavailability note (image_metrics.evaluate_dirs).
"""

from __future__ import annotations

import functools
import os
from pathlib import Path
from typing import Optional

import numpy as np

# VGG16 feature layout: conv indices per slice and maxpool positions.
_SLICES = ((0, 1), (2, 3), (4, 5, 6), (7, 8, 9), (10, 11, 12))
# official lpips input normalization (ScalingLayer)
_SHIFT = np.array([-0.030, -0.088, -0.188], np.float32)
_SCALE = np.array([0.458, 0.448, 0.450], np.float32)


def default_weights_path() -> Path:
    env = os.environ.get("GSSDF_LPIPS_WEIGHTS")
    if env:
        return Path(env)
    return Path(__file__).resolve().parents[2] / "weights" / "lpips_vgg.npz"


@functools.lru_cache(maxsize=1)
def load_weights(path: Optional[str] = None):
    """dict of numpy arrays, or None when the archive is absent/invalid."""
    p = Path(path) if path else default_weights_path()
    if not p.exists():
        return None
    try:
        data = np.load(p)
        w = {k: np.asarray(data[k], np.float32) for k in data.files}
        assert all(f"conv{i}_w" in w for i in range(13))
        assert all(f"lin{i}_w" in w for i in range(5))
        return w
    except Exception:
        return None


def _build_fn(w):
    import jax
    import jax.numpy as jnp

    def conv(x, ci):
        k = jnp.asarray(w[f"conv{ci}_w"])          # [Co, Ci, 3, 3]
        b = jnp.asarray(w[f"conv{ci}_b"])
        y = jax.lax.conv_general_dilated(
            x, k, (1, 1), "SAME",
            dimension_numbers=("NCHW", "OIHW", "NCHW"),
        )
        return jax.nn.relu(y + b[None, :, None, None])

    def feats(x):                                   # x [N, 3, H, W] in [-1,1]
        x = (x - jnp.asarray(_SHIFT)[None, :, None, None]) / jnp.asarray(
            _SCALE
        )[None, :, None, None]
        outs = []
        for si, convs in enumerate(_SLICES):
            for ci in convs:
                x = conv(x, ci)
            outs.append(x)
            if si < len(_SLICES) - 1:
                x = jax.lax.reduce_window(
                    x, -jnp.inf, jax.lax.max, (1, 1, 2, 2), (1, 1, 2, 2),
                    "VALID",
                )
        return outs

    def lpips(a, b):                                # [H, W, 3] in [0, 1]
        xa = jnp.transpose(a, (2, 0, 1))[None] * 2.0 - 1.0
        xb = jnp.transpose(b, (2, 0, 1))[None] * 2.0 - 1.0
        fa, fb = feats(xa), feats(xb)
        total = 0.0
        for i, (ya, yb) in enumerate(zip(fa, fb)):
            na = ya * jax.lax.rsqrt(
                jnp.sum(ya * ya, 1, keepdims=True) + 1e-10
            )
            nb = yb * jax.lax.rsqrt(
                jnp.sum(yb * yb, 1, keepdims=True) + 1e-10
            )
            d = (na - nb) ** 2                       # [1, C, h, w]
            lin = jnp.asarray(w[f"lin{i}_w"])
            lin = jnp.maximum(lin, 0.0)              # lpips clamps lins >= 0
            total = total + jnp.mean(
                jnp.sum(d * lin[None, :, None, None], axis=1)
            )
        return total

    return jax.jit(lpips)


@functools.lru_cache(maxsize=1)
def get_lpips_fn(path: Optional[str] = None):
    """Jitted (render, gt) -> scalar, or None when weights are absent."""
    w = load_weights(path)
    if w is None:
        return None
    return _build_fn(w)
