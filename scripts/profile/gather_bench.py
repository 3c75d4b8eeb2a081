"""Chip microbench: can anything beat XLA's ~6-10 ns/row random gather?

The hash-grid encode (fwd) and the tile-entry table read are both
latency-bound row gathers — together they dominate the SDF step, the
gs_sdf regularizer, and a chunk of the render. Candidates:

  xla            — baseline jnp.take (what table_gather uses today)
  xla_sorted     — same rows, Morton/ascending-sorted indices (locality)
  pallas_vmem    — per-chunk Pallas kernel, table resident in VMEM,
                   fori_loop of dynamic row slices (tests VMEM random
                   access vs HBM latency)
  pallas_take    — jnp.take inside the kernel (tests whether Mosaic has a
                   vectorized gather lowering at all)

Run from the repo root AFTER any long chip job finishes:
  python - < scripts/profile/gather_bench.py
"""
import functools
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path.cwd()))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

INTERPRET = jax.default_backend() == "cpu"

S = 1 << 19          # table rows (one hash level at 2^19)
F = 8                # features per row (padded lane-friendly)
R = 1 << 22          # gathered rows (≈ the 4.2M encode regime)
CHUNK = 1 << 13      # rows per pallas grid step


def timeit(name, fn, state, iters=10, rows=R):
    state = jax.block_until_ready(fn(state))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<14s} {dt * 1e3:8.2f} ms  {dt / rows * 1e9:6.2f} ns/row")
    return state


key = jax.random.PRNGKey(0)
table = jax.random.normal(key, (S, F), jnp.float32)
idx0 = jax.random.randint(jax.random.PRNGKey(1), (R,), 0, S, jnp.int32)


def chain(gather):
    """Chained iterations: fold the gathered sum back into the indices so
    repeated executions can't be elided (CLAUDE.md)."""

    @jax.jit
    def step(idx):
        out = gather(idx)
        bump = (jnp.sum(out[:, 0]) * 0).astype(jnp.int32)
        return (idx + 1 + bump) % S

    return step


timeit("xla", chain(lambda i: jnp.take(table, i, axis=0)), idx0)
idx_sorted = jnp.sort(idx0)
timeit("xla_sorted", chain(lambda i: jnp.take(table, i, axis=0)), idx_sorted)


def vmem_gather_kernel(idx_ref, table_ref, out_ref):
    def body(r, _):
        out_ref[r, :] = table_ref[idx_ref[r], :]
        return 0

    jax.lax.fori_loop(0, CHUNK, body, 0)


def pallas_vmem(idx):
    grid = (R // CHUNK,)
    return pl.pallas_call(
        vmem_gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        interpret=INTERPRET,
    )(idx, table)


def take_gather_kernel(idx_ref, table_ref, out_ref):
    out_ref[...] = jnp.take(table_ref[...], idx_ref[...], axis=0)


def pallas_take(idx):
    grid = (R // CHUNK,)
    return pl.pallas_call(
        take_gather_kernel,
        grid=grid,
        in_specs=[
            pl.BlockSpec((CHUNK,), lambda i: (i,), memory_space=pltpu.VMEM),
            pl.BlockSpec((S, F), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec(
            (CHUNK, F), lambda i: (i, 0), memory_space=pltpu.VMEM
        ),
        out_shape=jax.ShapeDtypeStruct((R, F), jnp.float32),
        interpret=INTERPRET,
    )(idx, table)


for name, fn in (("pallas_vmem", pallas_vmem), ("pallas_take", pallas_take)):
    try:
        timeit(name, chain(fn), idx0)
    except Exception as e:
        print(f"{name:<14s} UNSUPPORTED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")


# ---------------------------------------------------------------------------
# production-shaped variant: the hash-encode gather is 16 levels x (N*8)
# rows, each level gathering from its OWN table (hashed levels: 2^19 x F).
# One level's table (4 MB at F=2) fits VMEM: grid (level, chunk) keeps the
# level table resident while its row chunks stream through.
# ---------------------------------------------------------------------------
L = 16
FL = 2
RL = R // L          # rows per level (~262k at the encode regime)
LCHUNK = 1 << 13

tables_l = jax.random.normal(jax.random.PRNGKey(2), (L, S, FL), jnp.float32)
idx_l0 = jax.random.randint(jax.random.PRNGKey(3), (L, RL), 0, S, jnp.int32)


def level_take_kernel(idx_ref, table_ref, out_ref):
    out_ref[...] = jnp.take(table_ref[0], idx_ref[0], axis=0)[None]


def level_loop_kernel(idx_ref, table_ref, out_ref):
    def body(r, _):
        out_ref[0, r, :] = table_ref[0, idx_ref[0, r], :]
        return 0

    jax.lax.fori_loop(0, LCHUNK, body, 0)


def pallas_level(kernel):
    def gather(idx):
        return pl.pallas_call(
            kernel,
            grid=(L, RL // LCHUNK),
            in_specs=[
                pl.BlockSpec((1, LCHUNK), lambda l, c: (l, c),
                             memory_space=pltpu.VMEM),
                pl.BlockSpec((1, S, FL), lambda l, c: (l, 0, 0),
                             memory_space=pltpu.VMEM),
            ],
            out_specs=pl.BlockSpec((1, LCHUNK, FL), lambda l, c: (l, c, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((L, RL, FL), jnp.float32),
            interpret=INTERPRET,
        )(idx, tables_l)
    return gather


def chain_l(gather):
    @jax.jit
    def step(idx):
        out = gather(idx)
        bump = (jnp.sum(out[:, :, 0]) * 0).astype(jnp.int32)
        return (idx + 1 + bump) % S

    return step


for name, kern in (("pallas_lvl_take", level_take_kernel),
                   ("pallas_lvl_loop", level_loop_kernel)):
    try:
        timeit(name, chain_l(pallas_level(kern)), idx_l0)
    except Exception as e:
        print(f"{name:<14s} UNSUPPORTED: {type(e).__name__}: "
              f"{str(e).splitlines()[0][:120]}")

# XLA baseline at the same per-level shape (vmapped gather)
timeit("xla_lvl", chain_l(
    lambda i: jax.vmap(lambda t, ix: jnp.take(t, ix, axis=0))(tables_l, i)
), idx_l0)
print("GATHER BENCH DONE")
