"""Round 2: verify sort costs with true re-randomization; isolate
tile_encode internals; test Pallas VMEM gather + RMW."""
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
    print(f"{name:46s} {dt*1e3:9.3f} ms{extra}")
    return dt

key = jax.random.PRNGKey(0)

# ---- sorts with LCG re-randomization (definitely unsorted inputs) ----
for sz in [2_097_152, 4_194_304]:
    x0 = jax.random.randint(key, (sz,), 0, 1 << 29)
    @jax.jit
    def f(x):
        y = x * 1103515245 + 12345          # LCG scramble (data-dependent)
        s = jax.lax.sort((y & ((1 << 29) - 1),), num_keys=1)[0]
        return s
    timeit(f"sort 1-op int32 LCG {sz//1024//1024}M", f, x0, per=sz)

sz = 4_194_304
x0 = jax.random.randint(key, (sz,), 0, 1 << 29)
v0 = jax.random.normal(key, (sz,))
w0 = jax.random.normal(key, (sz,))
@jax.jit
def f3(args):
    x, v, w = args
    y = (x * 1103515245 + 12345) & ((1 << 29) - 1)
    sk, sv, sw = jax.lax.sort((y, v, w), num_keys=1)
    return sk, sv + sk * 1e-30, sw
timeit("sort 3-op (key,f32,f32) LCG 4.2M", f3, (x0, v0, w0), per=sz)

@jax.jit
def f2(args):
    x, v = args
    y = (x * 1103515245 + 12345) & ((1 << 29) - 1)
    sk, sv = jax.lax.sort((y, v), num_keys=1)
    return sk, sv ^ (sk & 1)
v0i = jax.random.randint(key, (sz,), 0, 1 << 20)
timeit("sort 2-op (key,int32) LCG 4.2M", f2, (x0, v0i), per=sz)

# ---- tile_encode internals isolated (bench operating point) ----
n, E = 131072, 32
T, CAP = 3225, 256
etotal = n * E
stid0 = jnp.sort(jax.random.randint(key, (etotal,), 0, T + 1))
spay0 = jax.random.randint(key, (etotal,), 0, n)

@jax.jit
def f_starts(s):
    starts = jnp.searchsorted(s, jnp.arange(T + 1))
    return s + starts.sum() * 0
timeit("searchsorted T+1 queries in 4.2M", f_starts, stid0)

starts0 = jnp.searchsorted(stid0, jnp.arange(T + 1))
@jax.jit
def f_seg(p):
    r_idx = jnp.arange(CAP, dtype=jnp.int32)
    src = starts0[:-1, None] + r_idx[None, :]
    in_seg = src < starts0[1:, None]
    pay_pad = jnp.concatenate([p, jnp.full((1,), n, jnp.int32)])
    vals = pay_pad[jnp.minimum(src, etotal)]
    tl = jnp.where(in_seg, vals, n)
    return p ^ (tl.sum() & 1)
timeit("segment-gather T*cap int32 (825k)", f_seg, spay0, per=T*CAP)

tl0 = jax.random.randint(key, (T * CAP,), 0, n + 1)
@jax.jit
def f_binned(t):
    binned = jnp.zeros((n + 1,), bool).at[t].set(True, mode="drop")
    return t ^ binned[:T*CAP].astype(jnp.int32)
timeit("binned bool scatter-set 825k", f_binned, tl0, per=T*CAP)

wm0 = jax.random.uniform(key, (T * CAP,))
@jax.jit
def f_vismax(w):
    vis = jnp.zeros((n + 1,)).at[tl0].max(w, mode="drop")
    return w + vis[:T*CAP] * 1e-30
timeit("vis scatter-max 825k", f_vismax, wm0, per=T*CAP)

# sort-based alternative for vis: sort (pay, wm) then segment-max via cummax
@jax.jit
def f_vis_sort(w):
    sp, sw = jax.lax.sort((tl0, w), num_keys=1)
    cm = jax.lax.associative_scan(jnp.maximum, sw)
    isend = jnp.concatenate([sp[1:] != sp[:-1], jnp.ones((1,), bool)])
    # place: scatter only run-ends (still a scatter but measure)
    vis = jnp.zeros((n + 1,)).at[jnp.where(isend, sp, n)].max(
        jnp.where(isend, cm, -1.0), mode="drop")
    return w + vis[:T*CAP] * 1e-30
timeit("vis via sort+cummax+scatter 825k", f_vis_sort, wm0, per=T*CAP)

# ---- Pallas: vectorized VMEM gather via jnp.take ----
TBL_R, TBL_C = 4096, 128
NIDX = 32768
tbl0 = jax.random.normal(key, (TBL_R, TBL_C))
idx0 = jax.random.randint(key, (NIDX,), 0, TBL_R)

def tk_kernel(tbl_ref, idx_ref, out_ref):
    tbl = tbl_ref[:]
    idx = idx_ref[:]
    out_ref[:] = jnp.take(tbl, idx, axis=0)

@jax.jit
def f_take(t):
    out = pl.pallas_call(
        tk_kernel,
        out_shape=jax.ShapeDtypeStruct((NIDX, TBL_C), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.VMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(t, idx0)
    return t + jnp.sum(out) * 1e-30
try:
    timeit("pallas jnp.take VMEM gather 32k rows x128", f_take, tbl0, per=NIDX)
except Exception as e:
    print("pallas take FAILED:", str(e)[:300])

# ---- Pallas: dynamic-sublane RMW accumulate loop ----
NROWS = 65536
rows0 = jax.random.normal(key, (NROWS, 128))
ridx0 = jax.random.randint(key, (NROWS,), 0, TBL_R)

def rmw_kernel(idx_ref, rows_ref, out_ref):
    out_ref[:] = jnp.zeros_like(out_ref)
    def body(i, _):
        j = idx_ref[i]
        out_ref[pl.ds(j, 1), :] += rows_ref[pl.ds(i, 1), :]
        return 0
    jax.lax.fori_loop(0, NROWS, body, 0)

@jax.jit
def f_rmw(r):
    out = pl.pallas_call(
        rmw_kernel,
        out_shape=jax.ShapeDtypeStruct((TBL_R, 128), jnp.float32),
        in_specs=[pl.BlockSpec(memory_space=pltpu.SMEM),
                  pl.BlockSpec(memory_space=pltpu.VMEM)],
        out_specs=pl.BlockSpec(memory_space=pltpu.VMEM),
    )(ridx0, r)
    return r + jnp.sum(out) * 1e-30
try:
    timeit("pallas RMW accumulate 65k rows x128", f_rmw, rows0, per=NROWS)
except Exception as e:
    print("pallas RMW FAILED:", str(e)[:300])
print("done")
