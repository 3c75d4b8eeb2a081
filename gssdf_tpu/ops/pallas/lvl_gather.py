"""Per-level VMEM-resident hash-table gather (Pallas TPU).

The hash-grid encode forward is one XLA row gather of [N*L*8] rows from
the concatenated feature table — latency-bound at ~6-10 ns/row on TPU
(PERF_r03 §3); at the production regime (N=32768 points, L=16 levels, 8
corners = 4.2M rows) it dominates both the SDF train step and the
GS->SDF regularizer. But ONE level's slab is at most 2^19 x F floats
(4 MB at F=2) — it fits VMEM whole. This kernel runs a (level, chunk)
grid that keeps level l's slab resident in VMEM while its index chunks
stream through, turning the HBM-latency-bound random gather into VMEM
random access.

Two in-kernel addressing variants (GSSDF_LVL_GATHER=take|loop):
  take — jnp.take on the resident slab (tests whether Mosaic has a
         vectorized VMEM gather lowering at all)
  loop — fori_loop of per-row dynamic slices (scalar issue rate)

CHIP VERDICT (2026-08-20, scripts/profile/gather_bench.py +
PERF_r04.md section 5): REJECTED by Mosaic lowering rules, not by
performance — an [S, 2] feature table has no (8, 128)-divisible block,
repacking feature pairs into lanes needs dynamic LANE indexing
(unsupported), and jnp.take has no vectorized in-kernel gather
lowering. XLA's row gather (5.62 ns/row) is the hash-encode floor on
this TPU generation. This module stays as interpret-tested quarantined
code (the raster_v2 rule) in case a future Mosaic adds dynamic sublane
gathers; on a real TPU backend level_gather raises with this
explanation instead of failing deep inside the compiler.

Autodiff: ``level_gather`` is a first-class linear primitive like
segsum.table_gather — jvp gathers the tangent, transpose flattens the
(level, local-slot) key to level*S+slot and routes through the sorted
windowed Pallas segment sum, so every autodiff order (first-order table
grads, eikonal grad-of-grad, Hessian products) and vmap keep the fast
scatter. Reference analog: tcnn's fused grid fwd/bwd used by
EncodingMap (encoding_map.cpp:15-29).
"""

from __future__ import annotations

import functools
import os

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .segsum import segment_sum

_INTERPRET = False          # interpreter mode for CPU tests
_VARIANT = os.environ.get("GSSDF_LVL_GATHER", "take")

_CHUNK = 2048               # index rows per grid step


def _take_kernel(idx_ref, tab_ref, out_ref):
    out_ref[...] = jnp.take(tab_ref[0], idx_ref[0], axis=0)[None]


def _loop_kernel(idx_ref, tab_ref, out_ref):
    def body(r, _):
        out_ref[0, r, :] = tab_ref[0, idx_ref[0, r], :]
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[-1], body, 0)


def _lvl_gather_pallas(stack: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """stack [L, S, F], idx [L, R] int32 in [0, S) -> [L, R, F]."""
    l, s, f = stack.shape
    r = idx.shape[1]
    pad = (-r) % _CHUNK
    if pad:
        idx = jnp.concatenate(
            [idx, jnp.zeros((l, pad), idx.dtype)], axis=1
        )
    rp = r + pad
    kernel = _loop_kernel if _VARIANT == "loop" else _take_kernel
    out = pl.pallas_call(
        kernel,
        grid=(l, rp // _CHUNK),
        in_specs=[
            pl.BlockSpec((1, _CHUNK), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, s, f), lambda i, c: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, _CHUNK, f), lambda i, c: (i, c, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, rp, f), jnp.float32),
        interpret=_INTERPRET,
    )(idx, stack)
    return out[:, :r]


def _scatter_kernel(idx_ref, val_ref, out_ref):
    c = pl.program_id(1)

    @pl.when(c == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)

    def body(r, _):
        i = idx_ref[0, r]
        out_ref[0, i, :] = out_ref[0, i, :] + val_ref[0, r, :]
        return 0

    jax.lax.fori_loop(0, idx_ref.shape[-1], body, 0)


def level_scatter_add(
    idx: jnp.ndarray, vals: jnp.ndarray, num_slots: int
) -> jnp.ndarray:
    """Sort-FREE per-level scatter-add: [L, R] keys + [L, R, F] rows ->
    [L, S, F] tables, each level's table VMEM-resident while its rows
    stream through (sequential in-kernel accumulation, no collisions).

    The sorted-segsum pipeline pays an XLA sort (~6 ms at 4.2M rows) plus
    ~7.7 ns/row in the windowed kernel; if the chip sustains ~1-2 ns/row
    of dynamic-index VMEM RMW (gather_bench pallas_lvl_loop answers the
    same question), this replaces segment_sum in level_gather's transpose.
    Gated like the gather: not routed anywhere until chip-validated.
    Rows with idx outside [0, num_slots) are the caller's bug (no
    sentinel handling — the encode's corner indices are always in range).
    """
    l, r = idx.shape
    f = vals.shape[-1]
    pad = (-r) % _CHUNK
    if pad:
        # pad rows scatter zeros into slot 0 — harmless
        idx = jnp.concatenate([idx, jnp.zeros((l, pad), idx.dtype)], axis=1)
        vals = jnp.concatenate(
            [vals, jnp.zeros((l, pad, f), vals.dtype)], axis=1
        )
    rp = r + pad
    return pl.pallas_call(
        _scatter_kernel,
        grid=(l, rp // _CHUNK),
        in_specs=[
            pl.BlockSpec((1, _CHUNK), lambda i, c: (i, c),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, _CHUNK, f), lambda i, c: (i, c, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, num_slots, f), lambda i, c: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((l, num_slots, f), jnp.float32),
        interpret=_INTERPRET,
    )(idx, vals)


_lg_p = jax.extend.core.Primitive("gssdf_level_gather")


def level_gather(stack: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """out[l, i] = stack[l, idx[l, i]]  ([L, S, F] x [L, R] -> [L, R, F]).

    Linear in ``stack``; transpose = ONE flat-key sorted Pallas segment
    sum over all levels (keys level*S + slot).
    """
    return _lg_p.bind(stack, idx)


def _lg_impl(stack, idx):
    if _INTERPRET:
        return _lvl_gather_pallas(stack, idx)
    if jax.default_backend() == "tpu":
        # chip-measured 2026-08-20: the kernel cannot lower on real
        # Mosaic (block-shape rules; see module docstring + PERF_r04 §5)
        raise RuntimeError(
            "level_gather is Mosaic-rejected on real TPU (no legal "
            "(8,128) block for an [S, F<128] table; dynamic lane "
            "indexing unsupported). Use the default XLA table_gather "
            "path (GSSDF_ENCODE_VMEM unset); interpret mode remains "
            "available for tests."
        )
    return jax.vmap(lambda t, ix: t[ix])(stack, idx)


def _lg_abstract(stack, idx):
    from jax.core import ShapedArray

    return ShapedArray(
        (stack.shape[0], idx.shape[1], stack.shape[2]), stack.dtype
    )


def _lg_transpose(ct, stack, idx):
    from jax.interpreters import ad

    assert ad.is_undefined_primal(stack) and not ad.is_undefined_primal(idx)
    l, s, f = stack.aval.shape
    if type(ct) is ad.Zero:
        return ad.Zero(stack.aval), None
    offs = (jnp.arange(l, dtype=idx.dtype) * s)[:, None]
    flat = segment_sum(
        (idx + offs).reshape(-1), ct.reshape(-1, f), l * s
    )
    return flat.reshape(l, s, f), None


def _lg_batch(args, dims):
    from jax.interpreters import batching

    stack, idx = args
    sd, idd = dims
    if sd is batching.not_mapped:
        # batched indices over a shared stack: fold batch into R
        idx_b = jnp.moveaxis(idx, idd, 0)          # [B, L, R]
        b, l, r = idx_b.shape
        out = _lg_p.bind(
            stack, jnp.moveaxis(idx_b, 0, 1).reshape(l, b * r)
        )
        return (
            jnp.moveaxis(out.reshape(l, b, r, stack.shape[2]), 1, 0),
            0,
        )
    # batched stacks: fold batch into L
    stack_b = jnp.moveaxis(stack, sd, 0)           # [B, L, S, F]
    b, l, s, f = stack_b.shape
    if idd is batching.not_mapped:
        idx_b = jnp.broadcast_to(idx[None], (b,) + idx.shape)
    else:
        idx_b = jnp.moveaxis(idx, idd, 0)
    out = _lg_p.bind(
        stack_b.reshape(b * l, s, f), idx_b.reshape(b * l, -1)
    )
    return out.reshape(b, l, -1, f), 0


def _register_lg():
    from jax.interpreters import ad, batching, mlir

    _lg_p.def_impl(_lg_impl)
    _lg_p.def_abstract_eval(_lg_abstract)
    ad.defjvp(_lg_p, lambda g, stack, idx: _lg_p.bind(g, idx), None)
    ad.primitive_transposes[_lg_p] = _lg_transpose
    batching.primitive_batchers[_lg_p] = _lg_batch
    mlir.register_lowering(
        _lg_p, mlir.lower_fun(_lg_impl, multiple_results=False)
    )


_register_lg()
