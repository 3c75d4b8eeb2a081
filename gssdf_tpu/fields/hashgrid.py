"""Multi-resolution hash-grid encoding (InstantNGP-style), pure JAX.

Reference analog: the tcnn_binding submodule used by EncodingMap
(encoding_map.cpp:15-29): Grid/Hash, n_levels=16, n_features_per_level=2,
log2_hashmap_size=19, base_resolution=32, per_level_scale=2.0, linear interp.

TPU-first design: one fused gather over a single [total_slots, F] table for
all levels and all 8 trilinear corners; the backward pass (scatter-add into
the table) is a sort + windowed Pallas segment-sum (ops/pallas/segsum.py,
~7.7 vs ~43 ns/row for XLA scatter on chip), wired as the gather's custom
transpose so every autodiff order uses it. Levels whose dense grid fits the
hashmap budget use collision-free dense indexing (same policy as tcnn).

Technique source: Müller et al., "Instant Neural Graphics Primitives with a
Multiresolution Hash Encoding" (arXiv:2201.05989).
"""

from __future__ import annotations

import os
from dataclasses import dataclass
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.segsum import table_gather

# Spatial-hash primes from the InstantNGP paper.
_PRIMES = (1, 2654435761, 805459861)

# GSSDF_ENCODE_VMEM=1 routes the encode's corner-feature gather through the
# per-level VMEM-resident Pallas kernel (ops/pallas/lvl_gather.py).
# CHIP VERDICT 2026-08-20: Mosaic-REJECTED (block-shape rules — see
# lvl_gather docstring + PERF_r04 §5); the default XLA gather at
# 5.62 ns/row is the measured floor. The flag stays for interpret-mode
# tests of the quarantined kernel; enabling it on a real TPU raises.
_ENCODE_VMEM = os.environ.get("GSSDF_ENCODE_VMEM", "0") == "1"


@dataclass(frozen=True)
class HashGridSpec:
    n_levels: int = 16
    n_features_per_level: int = 2
    log2_hashmap_size: int = 19
    base_resolution: int = 32
    per_level_scale: float = 2.0

    @property
    def table_size(self) -> int:
        return 1 << self.log2_hashmap_size

    @property
    def out_dim(self) -> int:
        return self.n_levels * self.n_features_per_level

    def level_resolutions(self) -> np.ndarray:
        ls = np.arange(self.n_levels)
        return np.floor(
            self.base_resolution * self.per_level_scale ** ls
        ).astype(np.int64)

    def level_meta(self) -> Tuple[np.ndarray, np.ndarray, np.ndarray]:
        """Per level: (resolution, slots used, dense? flag).

        A level is dense (collision-free) when (res+1)^3 fits the hashmap.
        """
        res = self.level_resolutions()
        dense = (res + 1) ** 3 <= self.table_size
        slots = np.where(dense, (res + 1) ** 3, self.table_size)
        return res, slots, dense

    @property
    def total_slots(self) -> int:
        return int(self.level_meta()[1].sum())


def init_hashgrid(key: jax.Array, spec: HashGridSpec) -> jnp.ndarray:
    """Table [total_slots, F], uniform in [-1e-4, 1e-4] (tcnn default)."""
    return jax.random.uniform(
        key,
        (spec.total_slots, spec.n_features_per_level),
        minval=-1e-4,
        maxval=1e-4,
        dtype=jnp.float32,
    )


def _corner_indices(ijk: jnp.ndarray, res: int, dense: bool, table_size: int):
    """ijk: [..., 3] int32 corner coords at a level -> flat slot index."""
    if dense:
        side = res + 1
        return (ijk[..., 0] * side + ijk[..., 1]) * side + ijk[..., 2]
    h = ijk[..., 0].astype(jnp.uint32) * jnp.uint32(_PRIMES[0])
    h = h ^ (ijk[..., 1].astype(jnp.uint32) * jnp.uint32(_PRIMES[1]))
    h = h ^ (ijk[..., 2].astype(jnp.uint32) * jnp.uint32(_PRIMES[2]))
    return (h & jnp.uint32(table_size - 1)).astype(jnp.int32)


# The 8 trilinear corner offsets [8, 3].
_CORNERS = np.stack(
    np.meshgrid([0, 1], [0, 1], [0, 1], indexing="ij"), -1
).reshape(8, 3)


def _corner_idx_weights(x01, spec: HashGridSpec, with_dw: bool):
    """Per-level corner slot indices + trilinear weights (+ d(weight)/dx01).

    Returns (idx [N, L, 8], w [N, L, 8], dw [N, L, 8, 3] or None). ``dw`` is
    the EXACT derivative of the multilinear weights wrt the unit-cube
    coordinate (each w_c is linear per axis, so dw_c/dx_i = ±res ·
    prod-of-other-axis terms and d²w/dx_i² = 0).
    """
    res, slots, dense = spec.level_meta()
    offsets = np.concatenate([[0], np.cumsum(slots)[:-1]])
    corners = jnp.asarray(_CORNERS, dtype=jnp.int32)  # [8, 3]
    sign = jnp.where(corners == 1, 1.0, -1.0)  # [8, 3]

    x01 = jnp.clip(x01, 0.0, 1.0)
    idx_all, w_all, dw_all = [], [], []
    for l in range(spec.n_levels):
        r = int(res[l])
        pos = x01 * r  # [N, 3] in [0, r]
        p0 = jnp.floor(pos)
        frac = pos - p0  # [N, 3]
        p0 = jnp.clip(p0.astype(jnp.int32), 0, r)  # grid has r+1 points/dim
        ijk = jnp.minimum(p0[:, None, :] + corners[None], r)  # [N, 8, 3]
        flat = _corner_indices(
            ijk, r, bool(dense[l]), spec.table_size
        ) + int(offsets[l])
        # per-axis linear terms t [N, 8, 3]
        t = jnp.where(corners[None] == 1, frac[:, None, :], 1.0 - frac[:, None, :])
        w = t[..., 0] * t[..., 1] * t[..., 2]
        idx_all.append(flat)
        w_all.append(w)
        if with_dw:
            dw = (
                jnp.stack(
                    [
                        t[..., 1] * t[..., 2],
                        t[..., 0] * t[..., 2],
                        t[..., 0] * t[..., 1],
                    ],
                    axis=-1,
                )
                * sign[None]
                * float(r)
            )  # [N, 8, 3]
            dw_all.append(dw)

    idx = jnp.stack(idx_all, axis=1)  # [N, L, 8]
    w = jnp.stack(w_all, axis=1)  # [N, L, 8]
    dw = jnp.stack(dw_all, axis=1) if with_dw else None  # [N, L, 8, 3]
    return idx, w, dw


def _level_stack(table, spec: HashGridSpec):
    """Concatenated table -> padded per-level stack [L, table_size, F].

    Static slices + pads (differentiable; the transpose is concat-of-
    slices, cheap XLA). Levels dense enough to use fewer slots are
    zero-padded — the pad rows are never indexed."""
    _, slots, _ = spec.level_meta()
    offsets = np.concatenate([[0], np.cumsum(slots)[:-1]])
    smax = spec.table_size
    parts = []
    for l in range(spec.n_levels):
        sl = table[int(offsets[l]):int(offsets[l] + slots[l])]
        if int(slots[l]) < smax:
            sl = jnp.pad(sl, ((0, smax - int(slots[l])), (0, 0)))
        parts.append(sl)
    return jnp.stack(parts)


def _gather_corner_feats(table, idx, spec: HashGridSpec):
    """One fused gather of all (level, corner) rows -> [N, L, 8, F].

    Default: global XLA gather forward; transpose = windowed Pallas
    segment sum on TPU (every autodiff order — see ops/pallas/segsum.py).
    GSSDF_ENCODE_VMEM=1: per-level VMEM-resident Pallas gather (same
    segment-sum transpose, flat (level, slot) keys)."""
    n = idx.shape[0]
    if _ENCODE_VMEM:
        from ..ops.pallas.lvl_gather import level_gather

        _, slots, _ = spec.level_meta()
        offsets = np.concatenate([[0], np.cumsum(slots)[:-1]])
        local = idx - jnp.asarray(offsets, jnp.int32)[None, :, None]
        out = level_gather(
            _level_stack(table, spec),
            jnp.swapaxes(local, 0, 1).reshape(spec.n_levels, n * 8),
        )                                   # [L, N*8, F]
        out = out.reshape(spec.n_levels, n, 8, spec.n_features_per_level)
        return jnp.swapaxes(out, 0, 1)
    return table_gather(table, idx.reshape(-1)).reshape(
        n, spec.n_levels, 8, spec.n_features_per_level
    )


def hashgrid_encode(
    table: jnp.ndarray, x01: jnp.ndarray, spec: HashGridSpec
) -> jnp.ndarray:
    """Encode points [N, 3] in [0, 1] -> features [N, L*F].

    One global gather: per-level corner slot indices are offset into the
    concatenated table, flattened to [N, L*8], gathered once, then reduced by
    trilinear weights.
    """
    idx, w, _ = _corner_idx_weights(x01, spec, with_dw=False)
    feats = _gather_corner_feats(table, idx, spec)
    out = jnp.sum(feats * w[..., None], axis=2)  # [N, L, F]
    return out.reshape(x01.shape[0], spec.out_dim)


def hashgrid_encode_with_grad(
    table: jnp.ndarray,
    x01: jnp.ndarray,
    spec: HashGridSpec,
    detach_positions: bool = False,
) -> Tuple[jnp.ndarray, jnp.ndarray, jnp.ndarray]:
    """Encode + EXACT spatial Jacobian from ONE shared gather.

    Returns (feat [N, L*F], feat_g [N, L*F], dfeat_dx01 [N, L*F, 3]).
    Because the trilinear weights are multilinear in x, the encode's spatial
    derivative uses the SAME gathered corner rows as the value — the
    TPU-first replacement for a second autodiff pass through the hash table
    (which would cost an extra 4.2M-row gather + segment-sum per
    regularizer term; reference runs FD probes instead,
    local_map.cpp:110-149).

    ``detach_positions=True`` stop-gradients the interpolation weights on
    the (feat_g, jac) branch only: downstream gradient-path losses (eikonal
    on splat samples) then match the reference's ``xyz.detach()`` semantics
    (neural_mapping.cpp:450-452) — no gradient to the positions — while the
    table cotangent still flows through the shared gather.
    """
    idx, w, dw = _corner_idx_weights(x01, spec, with_dw=True)
    feats = _gather_corner_feats(table, idx, spec)  # [N, L, 8, F]
    out = jnp.sum(feats * w[..., None], axis=2)  # [N, L, F]
    n = x01.shape[0]
    if detach_positions:
        w = jax.lax.stop_gradient(w)
        dw = jax.lax.stop_gradient(dw)
        out_g = jnp.sum(feats * w[..., None], axis=2)
    else:
        out_g = out
    jac = jnp.einsum("nlcf,nlci->nlfi", feats, dw)  # [N, L, F, 3]
    return (
        out.reshape(n, spec.out_dim),
        out_g.reshape(n, spec.out_dim),
        jac.reshape(n, spec.out_dim, 3),
    )
