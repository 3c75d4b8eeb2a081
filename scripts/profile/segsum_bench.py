"""Windowed segsum/gather kernels vs XLA scatter/gather at hash-grid scale."""
import time
import jax, jax.numpy as jnp
import numpy as np
import gssdf_tpu.ops.pallas.segsum as S

def timeit(name, fn, state, iters=10, per=None):
    state = jax.block_until_ready(fn(state))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    extra = f"  ({dt/per*1e9:.2f} ns/row)" if per else ""
    print(f"{name:46s} {dt*1e3:9.3f} ms{extra}")
    return dt

key = jax.random.PRNGKey(0)
R, SLOTS = 4_194_304, 7_650_594   # 32k pts x 8 corners x 16 levels

idx0 = jax.random.randint(key, (R,), 0, SLOTS).astype(jnp.int32)
vals0 = jax.random.normal(key, (R, 2))

# correctness on-chip at small scale first
ks, vs = idx0[:100_000] % 10_000, vals0[:100_000]
out_p = S.segment_sum(ks, vs, 10_000)
out_r = S.segment_sum_ref(ks, vs, 10_000)
err = float(jnp.max(jnp.abs(out_p - out_r)))
print("segsum small-scale max err vs scatter:", err)
assert err < 1e-3, err

@jax.jit
def f_pallas(v):
    out = S.segment_sum(idx0, v, SLOTS)
    return v + out.sum() * 1e-30
timeit("windowed segsum 4.2M rows F=2", f_pallas, vals0, per=R)

@jax.jit
def f_xla(v):
    out = S.segment_sum_ref(idx0, v, SLOTS)
    return v + out.sum() * 1e-30
timeit("XLA scatter-add 4.2M rows F=2", f_xla, vals0, iters=3, per=R)

# gather
table0 = jax.random.normal(key, (SLOTS, 2))
g_p = S.table_gather(table0[:10_000], ks)
g_r = table0[:10_000][ks]
err = float(jnp.max(jnp.abs(g_p - g_r)))
print("gather small-scale max err:", err)
assert err < 1e-5, err

@jax.jit
def g_pallas(t):
    rows = S.table_gather(t, idx0)
    return t + rows.sum() * 1e-30
timeit("windowed gather 4.2M rows F=2", g_pallas, table0, per=R)

@jax.jit
def g_xla(t):
    rows = t[idx0]
    return t + rows.sum() * 1e-30
timeit("XLA gather 4.2M rows F=2", g_xla, table0, per=R)

# block size sweep for segsum
for bs, ch in [(4096, 2048), (4096, 4096), (8192, 4096), (16384, 4096), (8192, 8192)]:
    sk_ops = (idx0,) + tuple(vals0[:, i] for i in range(2))
    @jax.jit
    def fs(v):
        sk, *sv = jax.lax.sort((idx0, v[:, 0], v[:, 1]), num_keys=1)
        out = S.sorted_segment_sum_pallas(
            sk, jnp.stack(sv, 0), SLOTS, block_slots=bs, chunk=ch)
        return v + out.sum() * 1e-30
    try:
        timeit(f"segsum bs={bs} chunk={ch}", fs, vals0, per=R)
    except Exception as e:
        print(f"bs={bs} ch={ch} FAILED: {str(e)[:150]}")
print("done")
