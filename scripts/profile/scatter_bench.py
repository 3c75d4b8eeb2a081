"""Chip microbench: sort-free per-level VMEM scatter-add vs sorted segsum.

The encode backward's table-gradient accumulation currently pays one XLA
sort of all rows plus ~7.7 ns/row in the windowed segsum kernel. The
level_scatter_add kernel (ops/pallas/lvl_gather.py) instead keeps each
level's table VMEM-resident and does sequential dynamic-index RMW — if
Mosaic sustains ~1-2 ns/row, it wins by a lot at the 4.2M-row encode
regime. Chained iterations throughout (CLAUDE.md).

Run from the repo root AFTER any long chip job finishes:
  python - < scripts/profile/scatter_bench.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path.cwd()))

import jax
import jax.numpy as jnp

from gssdf_tpu.ops.pallas import lvl_gather as LG
from gssdf_tpu.ops.pallas.segsum import segment_sum

L, S, F = 16, 1 << 19, 2
RL = 1 << 18          # rows per level (~ the 4.2M global encode regime)
ROWS = L * RL

idx0 = jax.random.randint(jax.random.PRNGKey(0), (L, RL), 0, S, jnp.int32)
vals = jax.random.normal(jax.random.PRNGKey(1), (L, RL, F), jnp.float32)


def timeit(name, fn, state, iters=5):
    state = jax.block_until_ready(fn(state))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<22s} {dt * 1e3:8.2f} ms  {dt / ROWS * 1e9:6.2f} ns/row",
          flush=True)
    return state


def chain(scatter):
    @jax.jit
    def step(idx):
        out = scatter(idx)
        bump = (jnp.sum(out[..., 0]) * 0).astype(jnp.int32)
        return (idx + 1 + bump) % S

    return step


try:
    timeit("lvl_scatter_add", chain(
        lambda i: LG.level_scatter_add(i, vals, S)
    ), idx0)
except Exception as e:
    print(f"lvl_scatter_add UNSUPPORTED: {type(e).__name__}: "
          f"{str(e).splitlines()[0][:120]}", flush=True)

offs = (jnp.arange(L, dtype=jnp.int32) * S)[:, None]
timeit("segsum (sort+pallas)", chain(
    lambda i: segment_sum(
        (i + offs).reshape(-1), vals.reshape(-1, F), L * S
    ).reshape(L, S, F)
), idx0)
print("SCATTER BENCH DONE")
