"""Pallas TPU kernels: sorted windowed segment-sum and windowed gather.

The TPU-native replacement for the two ops XLA lowers row-serially
(~20-50 ns/row scatter-add, ~4-10 ns/row gather — measured on chip): the
hash-grid feature-table gradient accumulation (reference: tcnn's fused grid
backward, called via encoding_map.cpp:25-26) and the bulk feature gather of
the encode forward.

Key ideas (ARCHITECTURE.md):
  * XLA's TPU sort is effectively free (radix-class, ~0.01 ns/row measured),
    so both ops are restructured around *sorted* keys.
  * Grid is OUTPUT-BLOCK-major: block b owns slots [b*BS, (b+1)*BS). The
    sorted input rows belonging to the block form one contiguous run whose
    bounds come from an XLA `searchsorted` (scalar-prefetched). DMA offsets
    are chunk-aligned; rows dragged in from neighboring blocks are masked
    (segment-sum) or merged from the existing output (gather), so shapes
    and slices stay fully static/aligned for Mosaic.
  * Everything is LANE-MAJOR: input rows live on the 128-lane axis ([chunk]
    key vectors, [F, chunk] value tiles), one-hot planes come from
    iota-vs-lane-vector compares, and the segment sum over a chunk is ONE
    MXU contraction over lanes:
        out[q, r*F+f] += dot(A_q[q_span, U], Y[rf, U], contract U)
    with A_q[qi, u] = 1{q_u == qi} and Y[r*F+f, u] = 1{r_u == r} * v[f, u].
    The gather is the transposed flow: rows = P @ ((table_block @ A) * rmask).
  * The output table block is [q_span, RW*F]; slot-major [S, F] is the same
    row-major order, so the final reshape is free.

All kernels have pure-JAX twins (CPU fallback + parity tests).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

_INTERPRET = False  # interpreter mode for CPU tests

_HI = jax.lax.Precision.HIGHEST


def _round_up(x: int, m: int) -> int:
    return -(-x // m) * m


# ---------------------------------------------------------------------------
# sorted windowed segment-sum
# ---------------------------------------------------------------------------


def _segsum_kernel(
    starts_ref,            # [nblocks+1] scalar-prefetch int32
    pack_ref,              # [PR, R_pad] int32 HBM: row 0 = keys, rows
                           # 1..F = bit-cast f32 values, rest zero-pad (PR =
                           # sublane tile multiple for legal full-dim0
                           # slices; int32 container avoids f32 denormal
                           # canonicalization of key bit patterns)
    out_ref,               # [q_span, RW*F] VMEM block
    pscr, sems,            # [2, 1+F, chunk] double-buffered stream scratch
    *,
    block_slots: int,
    chunk: int,
    r_width: int,
    feat: int,
):
    b = pl.program_id(0)
    # chunk-align the run start: rows before `start` belong to earlier
    # blocks and are masked by row_ok, so over-reading is harmless — and
    # aligned offsets satisfy Mosaic's tiling divisibility checks.
    start = (starts_ref[b] // chunk) * chunk
    end = starts_ref[b + 1]
    n = jnp.maximum(end - start, 0)
    nchunks = jax.lax.div(n + chunk - 1, chunk)

    q_span = block_slots // r_width
    rf = r_width * feat
    base = b * block_slots

    out_ref[:] = jnp.zeros_like(out_ref)

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (q_span, chunk), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (rf, chunk), 0)
    iota_r = iota_j // feat        # r index of each (r, f) output row

    def dma(slot, s):
        return pltpu.make_async_copy(
            pack_ref.at[:, pl.ds(start + s * chunk, chunk)],
            pscr.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(s, _):
        slot = jax.lax.rem(s, 2)
        nxt = jax.lax.rem(s + 1, 2)

        @pl.when(s + 1 < nchunks)
        def _():
            dma(nxt, s + 1).start()

        dma(slot, s).wait()

        pk = pscr[slot]                                # [PR, chunk] int32
        k = pk[0:1, :] - base
        row_ok = (k >= 0) & (k < block_slots)   # neighbors' rows -> masked
        q = jnp.where(row_ok, k // r_width, -1)   # [1, U]
        r = jnp.where(row_ok, k % r_width, -1)

        A = (q == iota_q).astype(jnp.bfloat16)         # [q_span, U] exact
        rmask = (r == iota_r).astype(jnp.float32)      # [rf, U]
        vals_f = pltpu.bitcast(pk[1:1 + feat], jnp.float32)
        vt = jnp.tile(vals_f, (r_width, 1))            # [rf, U] row j -> f=j%F
        Y = rmask * vt

        # split-bf16 contraction: the one-hot A is exact in bf16 and the
        # values split hi+lo, so two 1-pass bf16 dots reproduce the f32
        # product to ~2^-17 relative at ~3x the 6-pass HIGHEST MXU rate
        # (this dot dominates the kernel at wide feature counts)
        Y_hi = Y.astype(jnp.bfloat16)
        Y_lo = (Y - Y_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        dims = (((1,), (1,)), ((), ()))
        out_ref[:] += jax.lax.dot_general(
            A, Y_hi, dims, preferred_element_type=jnp.float32
        ) + jax.lax.dot_general(
            A, Y_lo, dims, preferred_element_type=jnp.float32
        )                                               # [q_span, rf]
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def sorted_segment_sum_pallas(
    keys_sorted: jnp.ndarray,   # [R] int32 ascending (sentinels >= num_slots)
    vals_sorted: jnp.ndarray,   # [F, R] f32 feature-major
    num_slots: int,
    *,
    block_slots: int = 4096,
    chunk: int = 2048,
    r_width: int = 128,
) -> jnp.ndarray:
    """Exact segment sum of sorted rows -> [num_slots, F] table."""
    feat = vals_sorted.shape[0]
    assert block_slots % r_width == 0
    s_pad = _round_up(max(num_slots, block_slots), block_slots)
    nblocks = s_pad // block_slots
    q_span = block_slots // r_width
    rf = r_width * feat

    r = keys_sorted.shape[0]
    r_pad = _round_up(r, chunk) + chunk     # slack so chunk DMA never OOB
    keys_p = jnp.full((r_pad,), s_pad, jnp.int32).at[:r].set(keys_sorted)
    vals_p = jnp.zeros((feat, r_pad), jnp.float32).at[:, :r].set(vals_sorted)
    # one packed int32 stream: row 0 = keys, rows 1..F = bit-cast values;
    # sublane dim padded to the tile (4, or a multiple of 8) for legal
    # full-dim0 slices
    pack_rows = 4 if feat + 1 <= 4 else _round_up(feat + 1, 8)
    pack = jnp.concatenate(
        [keys_p[None], jax.lax.bitcast_convert_type(vals_p, jnp.int32)]
        + [jnp.zeros((pack_rows - feat - 1, r_pad), jnp.int32)]
    )

    starts = jnp.searchsorted(
        keys_p[:r], jnp.arange(nblocks + 1, dtype=jnp.int32) * block_slots
    ).astype(jnp.int32)

    kernel = functools.partial(
        _segsum_kernel,
        block_slots=block_slots,
        chunk=chunk,
        r_width=r_width,
        feat=feat,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
            ],
            out_specs=pl.BlockSpec(
                (q_span, rf), lambda b, starts: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, pack_rows, chunk), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * q_span, rf), jnp.float32),
        interpret=_INTERPRET,
    )(starts, pack)
    # [S/RW, RW*F] row-major == [S, F] row-major: free reshape
    return out.reshape(s_pad, feat)[:num_slots]


def segment_sum_ref(keys, vals, num_slots):
    """Pure-JAX twin (CPU fallback / parity). vals row-major [R, F]."""
    return (
        jnp.zeros((num_slots + 1, vals.shape[-1]), vals.dtype)
        .at[jnp.minimum(keys, num_slots)]
        .add(vals)[:num_slots]
    )


def segment_sum(keys, vals, num_slots, **kw):
    """Unsorted keys + row-major vals [R, F] -> [num_slots, F]; rows with
    key >= num_slots are dropped. TPU: free XLA sort + windowed Pallas
    kernel; elsewhere: XLA scatter."""
    feat = vals.shape[-1]
    if jax.default_backend() != "tpu":
        return segment_sum_ref(keys, vals, num_slots)
    if not kw:
        # Per-chunk MXU work is block_slots*feat*chunk MACs regardless of
        # r_width, so wide-feature callers (e.g. the rasterizer's 24-row
        # entry tables) want SMALL output blocks; narrow hash-grid tables
        # amortize per-block overheads better with big ones.
        if feat > 8:
            kw = dict(block_slots=1024, chunk=2048, r_width=16)
    if feat > 8:
        # A multi-operand sort pays per payload column; a 2-operand perm
        # sort + one row gather doesn't.
        r = keys.shape[0]
        sk, perm = jax.lax.sort(
            (keys.astype(jnp.int32), jnp.arange(r, dtype=jnp.int32)),
            num_keys=1,
        )
        sv = jnp.take(vals, perm, axis=0)
        return sorted_segment_sum_pallas(sk, sv.T, num_slots, **kw)
    ops = (keys.astype(jnp.int32),) + tuple(
        vals[:, i] for i in range(vals.shape[-1])
    )
    sk, *sv = jax.lax.sort(ops, num_keys=1)
    return sorted_segment_sum_pallas(
        sk, jnp.stack(sv, axis=0), num_slots, **kw
    )


# ---------------------------------------------------------------------------
# sorted windowed segment-max (scalar, non-negative values)
# ---------------------------------------------------------------------------


def _segmax_kernel(
    starts_ref,            # [nblocks+1] scalar-prefetch int32
    pack_ref,              # [4, R_pad] int32 HBM: row 0 keys, row 1 values
    out_ref,               # [sub_rows, lanes] VMEM block
    pscr, sems,            # [2, 4, chunk] double-buffered stream scratch
    *,
    block_slots: int,
    chunk: int,
    sub_rows: int,
):
    b = pl.program_id(0)
    start = (starts_ref[b] // chunk) * chunk
    end = starts_ref[b + 1]
    n = jnp.maximum(end - start, 0)
    nchunks = jax.lax.div(n + chunk - 1, chunk)
    lanes = block_slots // sub_rows
    base = b * block_slots

    out_ref[:] = jnp.zeros_like(out_ref)
    iota_r = jax.lax.broadcasted_iota(jnp.int32, (lanes, chunk), 0)

    def dma(slot, s):
        return pltpu.make_async_copy(
            pack_ref.at[:, pl.ds(start + s * chunk, chunk)],
            pscr.at[slot],
            sems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        dma(0, 0).start()

    def body(s, _):
        slot = jax.lax.rem(s, 2)
        nxt = jax.lax.rem(s + 1, 2)

        @pl.when(s + 1 < nchunks)
        def _():
            dma(nxt, s + 1).start()

        dma(slot, s).wait()
        pk = pscr[slot]
        k = pk[0:1, :] - base
        ok = (k >= 0) & (k < block_slots)
        vals = pltpu.bitcast(pk[1:2], jnp.float32)       # [1, U]
        q_u = jnp.where(ok, k // lanes, -1)
        r_u = jnp.where(ok, k % lanes, -1)
        for q in range(sub_rows):                        # static unroll
            pick = (q_u == q) & (r_u == iota_r)          # [lanes, U]
            contrib = jnp.max(jnp.where(pick, vals, 0.0), axis=1)
            out_ref[q] = jnp.maximum(out_ref[q], contrib)
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)


def sorted_segment_max_pallas(
    keys_sorted: jnp.ndarray,   # [R] int32 ascending (sentinels >= num_slots)
    vals_sorted: jnp.ndarray,   # [R] f32, NON-NEGATIVE
    num_slots: int,
    *,
    block_slots: int = 1024,
    chunk: int = 2048,
    sub_rows: int = 8,
) -> jnp.ndarray:
    """Per-slot max of sorted non-negative rows -> [num_slots] (empty slots
    report 0, matching ``zeros().at[k].max(v)``)."""
    assert block_slots % sub_rows == 0
    s_pad = _round_up(max(num_slots, block_slots), block_slots)
    nblocks = s_pad // block_slots
    lanes = block_slots // sub_rows

    r = keys_sorted.shape[0]
    r_pad = _round_up(r, chunk) + chunk
    keys_p = jnp.full((r_pad,), s_pad, jnp.int32).at[:r].set(keys_sorted)
    vals_p = jnp.zeros((1, r_pad), jnp.float32).at[0, :r].set(vals_sorted)
    pack = jnp.concatenate(
        [keys_p[None], jax.lax.bitcast_convert_type(vals_p, jnp.int32),
         jnp.zeros((2, r_pad), jnp.int32)]
    )
    starts = jnp.searchsorted(
        keys_p[:r], jnp.arange(nblocks + 1, dtype=jnp.int32) * block_slots
    ).astype(jnp.int32)

    kernel = functools.partial(
        _segmax_kernel, block_slots=block_slots, chunk=chunk,
        sub_rows=sub_rows,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[pl.BlockSpec(memory_space=pltpu.HBM)],
            out_specs=pl.BlockSpec(
                (sub_rows, lanes), lambda b, starts: (b, 0),
                memory_space=pltpu.VMEM,
            ),
            scratch_shapes=[
                pltpu.VMEM((2, 4, chunk), jnp.int32),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((nblocks * sub_rows, lanes),
                                       jnp.float32),
        interpret=_INTERPRET,
    )(starts, pack)
    return out.reshape(s_pad)[:num_slots]


def segment_max_ref(keys, vals, num_slots):
    """Pure-JAX twin: zeros().at[keys].max(vals, mode=drop)."""
    return (
        jnp.zeros((num_slots,), vals.dtype)
        .at[keys]
        .max(vals, mode="drop")
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(2,))
def segment_max(keys, vals, num_slots: int):
    """Differentiable per-slot max of NON-NEGATIVE scalar rows.

    Forward on TPU: one 2-operand sort + windowed Pallas kernel (XLA's
    scatter-max runs row-serially at ~10 ns/row). Backward mirrors XLA's
    scatter-max vjp exactly: the cotangent of each slot splits evenly
    among tying rows, with the zero initial value counting as a tie.
    """
    return _segment_max_impl(keys, vals, num_slots)


def _segment_max_impl(keys, vals, num_slots):
    if jax.default_backend() != "tpu":
        return segment_max_ref(keys, vals, num_slots)
    sk, sv = jax.lax.sort(
        (keys.astype(jnp.int32), vals), num_keys=1, is_stable=False
    )
    return sorted_segment_max_pallas(sk, sv, num_slots)


def _segment_max_fwd(keys, vals, num_slots):
    out = _segment_max_impl(keys, vals, num_slots)
    return out, (keys, vals, out)


def _segment_max_bwd(num_slots, res, g):
    keys, vals, out = res
    vis_at = table_gather(out[:, None], keys)[:, 0]
    eq = (vals == vis_at).astype(vals.dtype)
    cnt = segment_sum(keys, eq[:, None], num_slots)[:, 0]
    cnt = cnt + (out == 0.0)            # the zero init ties too
    ratio = g / jnp.maximum(cnt, 1.0)
    d_vals = eq * table_gather(ratio[:, None], keys)[:, 0]
    return None, d_vals


segment_max.defvjp(_segment_max_fwd, _segment_max_bwd)


# ---------------------------------------------------------------------------
# sorted windowed gather
# ---------------------------------------------------------------------------


def _gather_kernel(
    starts_ref,            # [nblocks+1] scalar-prefetch
    keys_ref,              # [R_pad] HBM (sorted)
    tblock_ref,            # [RW*F, q_span] VMEM block (transposed table)
    out_ref,               # [F, R_pad] HBM (feature-major, merge-RMW writes)
    kscr, oscr, wscr, ksems, osems, wsems,
    *,
    block_slots: int,
    chunk: int,
    r_width: int,
    feat: int,
):
    b = pl.program_id(0)
    start = (starts_ref[b] // chunk) * chunk
    end = starts_ref[b + 1]
    n = jnp.maximum(end - start, 0)
    nchunks = jax.lax.div(n + chunk - 1, chunk)

    q_span = block_slots // r_width
    rf = r_width * feat
    base = b * block_slots

    iota_q = jax.lax.broadcasted_iota(jnp.int32, (q_span, chunk), 0)
    iota_j = jax.lax.broadcasted_iota(jnp.int32, (rf, chunk), 0)
    iota_r = iota_j // feat
    # P[f, j] = 1{j % F == f}: folds the strided (r, f) sum into a matmul
    pj = jax.lax.broadcasted_iota(jnp.int32, (feat, rf), 1)
    pf = jax.lax.broadcasted_iota(jnp.int32, (feat, rf), 0)
    P = (pj % feat == pf).astype(jnp.float32)

    def kdma(slot, s):
        return pltpu.make_async_copy(
            keys_ref.at[:, pl.ds(start + s * chunk, chunk)],
            kscr.at[slot], ksems.at[slot],
        )

    def odma(slot, s):
        return pltpu.make_async_copy(
            out_ref.at[:, pl.ds(start + s * chunk, chunk)],
            oscr.at[slot], osems.at[slot],
        )

    def wdma(slot, s):
        return pltpu.make_async_copy(
            wscr.at[slot],
            out_ref.at[:, pl.ds(start + s * chunk, chunk)], wsems.at[slot],
        )

    @pl.when(nchunks > 0)
    def _():
        kdma(0, 0).start()
        odma(0, 0).start()

    def body(s, _):
        slot = jax.lax.rem(s, 2)
        nxt = jax.lax.rem(s + 1, 2)

        # the in-merge read of chunk s+1 must not race the write of chunk
        # s-1 into the same scratch slot; chunk ranges are disjoint so the
        # HBM read/write ranges never overlap
        @pl.when(s + 1 < nchunks)
        def _():
            kdma(nxt, s + 1).start()
            odma(nxt, s + 1).start()

        kdma(slot, s).wait()
        odma(slot, s).wait()

        k = kscr[slot] - base                           # [1, U]
        row_ok = (k >= 0) & (k < block_slots)
        q = jnp.where(row_ok, k // r_width, -1)
        r = jnp.where(row_ok, k % r_width, -1)

        A = (q == iota_q).astype(jnp.float32)           # [q_span, U]
        M1 = jax.lax.dot_general(
            tblock_ref[:], A, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )                                               # [rf, U]
        rmask = (r == iota_r).astype(jnp.float32)
        got = jax.lax.dot_general(
            P, M1 * rmask, (((1,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )                                               # [F, U]
        # merge: rows outside this block keep their previously-written value
        # (grid is sequential; boundary rows were written by block b-1, and
        # trailing rows will be overwritten by the owning later block)
        okf = jnp.broadcast_to(row_ok, got.shape)

        # wait for the write that used this scratch slot two chunks ago
        @pl.when(s >= 2)
        def _():
            wdma(slot, s - 2).wait()

        wscr[slot] = jnp.where(okf, got, oscr[slot])
        wdma(slot, s).start()
        return 0

    jax.lax.fori_loop(0, nchunks, body, 0)

    # drain outstanding writes
    @pl.when(nchunks >= 2)
    def _():
        wdma(jax.lax.rem(nchunks - 2, 2), nchunks - 2).wait()

    @pl.when(nchunks >= 1)
    def _():
        wdma(jax.lax.rem(nchunks - 1, 2), nchunks - 1).wait()


def sorted_window_gather_pallas(
    table: jnp.ndarray,        # [S, F]
    keys_sorted: jnp.ndarray,  # [R] int32 ascending, in [0, S)
    *,
    block_slots: int = 4096,
    chunk: int = 2048,
    r_width: int = 128,
) -> jnp.ndarray:
    """rows[f, i] = table[keys_sorted[i], f] -> [F, R] (feature-major)."""
    s, feat = table.shape
    s_pad = _round_up(max(s, block_slots), block_slots)
    nblocks = s_pad // block_slots
    q_span = block_slots // r_width
    rf = r_width * feat

    r = keys_sorted.shape[0]
    r_pad = _round_up(r, chunk) + chunk
    keys_p = jnp.full((r_pad,), s_pad, jnp.int32).at[:r].set(keys_sorted)
    table_p = (
        table
        if s == s_pad
        else jnp.concatenate(
            [table, jnp.zeros((s_pad - s, feat), table.dtype)]
        )
    )
    # transposed per-block view: [nblocks, q_span, rf] -> [nblocks, rf, q_span]
    tview = (
        table_p.reshape(nblocks, block_slots * feat)
        .reshape(nblocks, q_span, rf)
        .transpose(0, 2, 1)
        .reshape(nblocks * rf, q_span)
    )

    starts = jnp.searchsorted(
        keys_p[:r], jnp.arange(nblocks + 1, dtype=jnp.int32) * block_slots
    ).astype(jnp.int32)

    kernel = functools.partial(
        _gather_kernel,
        block_slots=block_slots,
        chunk=chunk,
        r_width=r_width,
        feat=feat,
    )
    out = pl.pallas_call(
        kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(nblocks,),
            in_specs=[
                pl.BlockSpec(memory_space=pltpu.HBM),
                pl.BlockSpec(
                    (rf, q_span), lambda b, starts: (b, 0),
                    memory_space=pltpu.VMEM,
                ),
            ],
            out_specs=pl.BlockSpec(memory_space=pltpu.HBM),
            scratch_shapes=[
                pltpu.VMEM((2, 1, chunk), jnp.int32),
                pltpu.VMEM((2, feat, chunk), jnp.float32),
                pltpu.VMEM((2, feat, chunk), jnp.float32),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
                pltpu.SemaphoreType.DMA((2,)),
            ],
        ),
        out_shape=jax.ShapeDtypeStruct((feat, r_pad), jnp.float32),
        compiler_params=pltpu.CompilerParams(has_side_effects=True),
        interpret=_INTERPRET,
    )(starts, keys_p[None], tview)
    return out[:, :r]


# ---------------------------------------------------------------------------
# differentiable table gather (the hash-grid primitive)
# ---------------------------------------------------------------------------


# table_gather is a first-class linear primitive so the gather<->segsum
# pairing survives EVERY transform: first-order table grads, the eikonal
# grad-of-grad, forward-over-reverse Hessian products, and vmap (multicam
# sharded steps) all route their scatter through the Pallas kernel instead
# of XLA's ~40 ns/row serial scatter. Forward is a plain XLA gather
# (measured FASTER than the windowed Pallas gather: ~10 vs ~14 ns/row).
_tg_p = jax.extend.core.Primitive("gssdf_table_gather")


def table_gather(table: jnp.ndarray, idx: jnp.ndarray) -> jnp.ndarray:
    """rows[i] = table[idx[i]]  ([S, F] x [R] int32 -> [R, F]).

    Linear in ``table``; transpose = exact sorted windowed Pallas segment
    sum on TPU (the tcnn-grid-backward equivalent, encoding_map.cpp:25-26
    call site), XLA scatter elsewhere.
    """
    return _tg_p.bind(table, idx)


def _tg_impl(table, idx):
    return table[idx]


def _tg_abstract(table, idx):
    from jax.core import ShapedArray

    return ShapedArray((idx.shape[0], table.shape[1]), table.dtype)


def _tg_transpose(ct, table, idx):
    from jax.interpreters import ad

    assert ad.is_undefined_primal(table) and not ad.is_undefined_primal(idx)
    num_slots = table.aval.shape[0]
    if type(ct) is ad.Zero:
        return ad.Zero(table.aval), None
    return segment_sum(idx, ct, num_slots), None


def _tg_batch(args, dims):
    from jax.interpreters import batching

    table, idx = args
    td, idd = dims
    if td is batching.not_mapped:
        idx_b = jnp.moveaxis(idx, idd, 0)
        b, r = idx_b.shape
        out = _tg_p.bind(table, idx_b.reshape(-1))
        return out.reshape(b, r, table.shape[1]), 0
    table_b = jnp.moveaxis(table, td, 0)
    b, s, f = table_b.shape
    if idd is batching.not_mapped:
        idx_b = jnp.broadcast_to(idx[None], (b, idx.shape[0]))
    else:
        idx_b = jnp.moveaxis(idx, idd, 0)
    offs = (jnp.arange(b, dtype=idx_b.dtype) * s)[:, None]
    out = _tg_p.bind(table_b.reshape(b * s, f), (idx_b + offs).reshape(-1))
    return out.reshape(b, idx_b.shape[1], f), 0


def _register_tg():
    from jax.interpreters import ad, batching, mlir

    _tg_p.def_impl(_tg_impl)
    _tg_p.def_abstract_eval(_tg_abstract)
    ad.defjvp(_tg_p, lambda g, table, idx: _tg_p.bind(g, idx), None)
    ad.primitive_transposes[_tg_p] = _tg_transpose
    batching.primitive_batchers[_tg_p] = _tg_batch
    mlir.register_lowering(
        _tg_p, mlir.lower_fun(_tg_impl, multiple_results=False)
    )


_register_tg()
