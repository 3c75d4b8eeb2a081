"""Primitive microbench on the real TPU: sort/gather/scatter/Pallas RMW.
Chained iterations (CLAUDE.md)."""
import time, functools
import jax, jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

def timeit(name, fn, state, iters=10, per=None):
    state = jax.block_until_ready(fn(state))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    extra = f"  ({dt/per*1e9:.1f} ns/row)" if per else ""
    print(f"{name:44s} {dt*1e3:9.3f} ms{extra}")
    return dt

key = jax.random.PRNGKey(0)

# ---- sorts ----
for sz in [1_048_576, 2_097_152, 4_194_304, 8_388_608]:
    x0 = jax.random.randint(key, (sz,), 0, 1 << 29)
    @jax.jit
    def f(x):
        s = jax.lax.sort((x,), num_keys=1)[0]
        return s ^ (s >> 1)  # chain
    timeit(f"sort 1-op int32 {sz//1024}k", f, x0, per=sz)

sz = 4_194_304
k1, k2 = jax.random.split(key)
a0 = jax.random.randint(k1, (sz,), 0, 4096)
b0 = jax.random.randint(k2, (sz,), 0, 1 << 20)
@jax.jit
def f2(ab):
    a, b = ab
    sa, sb = jax.lax.sort((a, b), num_keys=1, is_stable=True)
    return (sa ^ (sb & 1), sb ^ (sa & 1))
timeit("sort 2-op stable int32 4.2M", f2, (a0, b0), per=sz)

@jax.jit
def fargsort(x):
    o = jnp.argsort(x)
    return x + o.astype(jnp.float32) * 1e-30
timeit("argsort f32 131k (depth sort)", fargsort,
       jax.random.normal(key, (131072,)), per=131072)

# ---- gathers ----
table = jax.random.normal(key, (131073, 24))
for rows in [333_000, 825_600, 1_651_200]:
    idx = jax.random.randint(key, (rows,), 0, 131072)
    @jax.jit
    def g(t):
        out = t[idx]
        return t + jnp.sum(out) * 1e-30
    timeit(f"gather [*,24] {rows//1000}k rows", g, table, per=rows)

# gather width scaling
for width in [4, 8, 96]:
    tw = jax.random.normal(key, (131073, width))
    idx = jax.random.randint(key, (825_600,), 0, 131072)
    @jax.jit
    def g2(t):
        out = t[idx]
        return t + jnp.sum(out) * 1e-30
    timeit(f"gather [*,{width}] 825k rows", g2, tw, per=825_600)

# ---- scatters ----
for rows in [333_000, 825_600]:
    idx = jax.random.randint(key, (rows,), 0, 131072)
    vals = jax.random.normal(key, (rows, 24))
    @jax.jit
    def s(v):
        out = jnp.zeros((131073, 24)).at[idx].add(v)
        return v + jnp.sum(out) * 1e-30
    timeit(f"scatter-add [*,24]->131k {rows//1000}k rows", s, vals, per=rows)

# hash-grid shape: [262k,2] -> [524k,2]
idxh = jax.random.randint(key, (262_144,), 0, 524_288)
valh = jax.random.normal(key, (262_144, 2))
@jax.jit
def sh(v):
    out = jnp.zeros((524_288, 2)).at[idxh].add(v)
    return v + jnp.sum(out) * 1e-30
timeit("scatter-add [262k,2]->[524k,2] (1 level)", sh, valh, per=262_144)

# full hash-grid: 4.2M rows -> 8.4M slots
idxf = jax.random.randint(key, (4_194_304,), 0, 8_388_608)
valf = jax.random.normal(key, (4_194_304, 2))
@jax.jit
def sf(v):
    out = jnp.zeros((8_388_608, 2)).at[idxf].add(v)
    return v + jnp.sum(out) * 1e-30
timeit("scatter-add [4.2M,2]->[8.4M,2] (16 lvls)", sf, valf, per=4_194_304)

# sorted scatter-add same shape
idxs = jnp.sort(idxf)
@jax.jit
def ss(v):
    out = jnp.zeros((8_388_608, 2)).at[idxs].add(v, indices_are_sorted=True, unique_indices=False)
    return v + jnp.sum(out) * 1e-30
timeit("scatter-add sorted hint 4.2M rows", ss, valf, per=4_194_304)

# int32 single-column scatter (tile table build)
idxt = jax.random.randint(key, (333_000,), 0, 3226*256)
valt = jax.random.randint(key, (333_000,), 0, 131072)
@jax.jit
def st(v):
    out = jnp.zeros((3226*256,), jnp.int32).at[idxt].set(v)
    return v ^ (out[:333_000] & 1)
timeit("scatter-set int32 scalar 333k rows", st, valt, per=333_000)

# ---- cumsum (for sorted segment-sum trick) ----
big = jax.random.normal(key, (4_194_304, 2))
@jax.jit
def fc(v):
    c = jnp.cumsum(v, axis=0)
    return v + c[-1] * 1e-30
timeit("cumsum [4.2M, 2] axis0", fc, big, per=4_194_304)
print("done")
