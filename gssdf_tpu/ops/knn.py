"""Approximate 3-NN mean squared distance for splat scale init.

Reference analog: ``distCUDA2`` from the simple-knn submodule
(neural_gaussian.cpp:314): per point, the mean of the squared distances to
its 3 nearest neighbors, used once at init to size splats. simple-knn is
itself approximate (Morton-sorted box search), so the TPU redesign keeps the
same recipe: sort by Morton code, compare each point against a +/-window of
its sorted neighbors, take the 3 smallest distances. O(N * W) with static
shapes — one gather + one top-k, no dynamic spatial structure.
"""

from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def _morton3(q: jnp.ndarray) -> jnp.ndarray:
    """Interleave 10-bit x/y/z -> 30-bit Morton code. q: [N, 3] int32."""

    def spread(v):
        v = v & 0x3FF
        v = (v | (v << 16)) & 0x30000FF
        v = (v | (v << 8)) & 0x300F00F
        v = (v | (v << 4)) & 0x30C30C3
        v = (v | (v << 2)) & 0x9249249
        return v

    return spread(q[:, 0]) | (spread(q[:, 1]) << 1) | (spread(q[:, 2]) << 2)


def knn_mean_sq_dist(
    points: jnp.ndarray, k: int = 3, window: int = 16
) -> jnp.ndarray:
    """[N, 3] -> [N] mean of the squared distances to ~k nearest neighbors."""
    n = points.shape[0]
    lo = jnp.min(points, axis=0)
    hi = jnp.max(points, axis=0)
    q = ((points - lo) / jnp.maximum(hi - lo, 1e-9) * 1023.0).astype(jnp.int32)
    order = jnp.argsort(_morton3(q))
    sorted_pts = points[order]

    offs = jnp.concatenate(
        [jnp.arange(-window, 0), jnp.arange(1, window + 1)]
    )  # [2W]
    idx = jnp.arange(n)[:, None] + offs[None, :]
    valid = (idx >= 0) & (idx < n)
    idx = jnp.clip(idx, 0, n - 1)
    nb = sorted_pts[idx]                                   # [N, 2W, 3]
    d2 = jnp.sum((nb - sorted_pts[:, None, :]) ** 2, axis=-1)
    d2 = jnp.where(valid, d2, jnp.inf)
    neg_top, _ = jax.lax.top_k(-d2, k)                     # [N, k] smallest
    kd2 = jnp.where(jnp.isfinite(neg_top), -neg_top, 0.0)
    mean_d2 = jnp.sum(kd2, axis=-1) / jnp.maximum(
        jnp.sum(jnp.isfinite(neg_top), axis=-1), 1
    )
    out = jnp.zeros((n,), points.dtype).at[order].set(mean_d2)
    return out
