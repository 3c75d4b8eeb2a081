"""Chip A/B: tile-table build — XLA slice gather vs scalar-prefetch DMA.

PERF_r04 section 4 measured the [T, cap] table build at 5.42 ms
(~1.7 us per vmapped dynamic slice) of the 8.5 ms encode. The Pallas
kernel (ops/pallas/table_build.py) issues the same row copies as
overlapped HBM->VMEM DMAs behind a scalar prefetch of the run starts.

Run from the repo root AFTER any long chip job finishes:
  python - < scripts/profile/table_dma_bench.py
"""
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path.cwd()))

import jax
import jax.numpy as jnp
import numpy as np

from gssdf_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from gssdf_tpu.gs.model import build_splat_model, generate_gaussian  # noqa: E402
from gssdf_tpu.gs.projection import project_2dgs  # noqa: E402
from gssdf_tpu.gs import rasterize_tiled as RT  # noqa: E402
from gssdf_tpu.ops.pallas.table_build import table_rows_dma  # noqa: E402
from gssdf_tpu.utils.math import logit  # noqa: E402

W, H, N = 1200, 680, 131072
TILE, CAP, EXPAND, SMALL = 16, 256, 32, 8
key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
anchors = jnp.concatenate(
    [jax.random.uniform(k1, (N, 2), minval=-2.0, maxval=2.0),
     jax.random.uniform(k2, (N, 1), minval=1.0, maxval=8.0)], -1)
quats = jax.random.normal(k3, (N, 4))
model = build_splat_model(
    k4, anchors, jnp.full((N, 3), np.log(0.01)),
    quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
    jnp.full((N,), logit(0.7)), 0, N)
pose = jnp.eye(4, dtype=jnp.float32)
K = jnp.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], jnp.float32)
xyz, q, sc, opa, _ = generate_gaussian(model, training=False)
proj = jax.block_until_ready(
    project_2dgs(xyz, q, sc, pose, K, W, H, 0.3, 100.0))

tiles_x = -(-W // TILE)
tiles_y = -(-H // TILE)
num_tiles = tiles_x * tiles_y


def timeit(name, fn, state, iters=20):
    state = jax.block_until_ready(fn(state))
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:<38s} {dt * 1e3:8.2f} ms", flush=True)
    return state


# realistic sorted stream: emitted keys from the real projection
rows = (N // 8) * EXPAND + (N - N // 8) * SMALL
kk = jax.random.randint(jax.random.PRNGKey(5), (rows,), 0,
                        np.int32(2 ** 30), jnp.int32)
pp = jax.random.randint(jax.random.PRNGKey(6), (rows,), 0, N, jnp.int32)
sk0, sp0 = jax.block_until_ready(
    jax.jit(lambda: jax.lax.sort((kk, pp), num_keys=1, is_stable=False))())
rank_bits = min(max(N - 1, 1).bit_length(), 30 - (num_tiles + 1).bit_length())
starts_all = jax.block_until_ready(jnp.searchsorted(
    sk0, jnp.arange(num_tiles + 1) << rank_bits, side="left"
).astype(jnp.int32))


@jax.jit
def f_xla(carry):
    sp_ = sp0 + carry
    pay_pad = jnp.concatenate([sp_, jnp.full((CAP,), N, jnp.int32)])
    vals = jax.vmap(
        lambda s: jax.lax.dynamic_slice(pay_pad, (s,), (CAP,))
    )(starts_all[:-1])
    return vals[0, 0] & 1


@jax.jit
def f_dma(carry):
    sp_ = sp0 + carry
    pay_pad = jnp.concatenate([sp_, jnp.full((CAP,), N, jnp.int32)])
    vals = table_rows_dma(pay_pad, starts_all[:-1], CAP)
    return vals[0, 0] & 1


# parity first (same inputs, no chain)
pay_pad0 = jnp.concatenate([sp0, jnp.full((CAP,), N, jnp.int32)])
a = np.asarray(jax.vmap(
    lambda s: jax.lax.dynamic_slice(pay_pad0, (s,), (CAP,))
)(starts_all[:-1]))
try:
    b = np.asarray(table_rows_dma(pay_pad0, starts_all[:-1], CAP))
except Exception as e:  # Mosaic rejection -> record and stop
    print("DMA kernel REJECTED on this backend:",
          type(e).__name__, str(e)[:500])
    sys.exit(0)
np.testing.assert_array_equal(a, b)
print(f"parity OK over [T={num_tiles}, cap={CAP}]")

timeit("table build, XLA slice gather", f_xla, jnp.int32(0))
timeit("table build, Pallas DMA rows", f_dma, jnp.int32(0))


# full encode A/B (flag toggled between fresh jits)
def full_encode():
    @jax.jit
    def f(carry):
        m2d = proj.means2d + carry * 1e-30
        tl, cnt, _d, _c, _r = RT.tile_encode(
            m2d, proj.radii, proj.depths, proj.valid, W, H, TILE, CAP,
            EXPAND, SMALL)
        return jnp.sum(tl).astype(jnp.float32) * 1e-30
    return f


RT._TABLE_DMA = False
timeit("tile_encode FULL (xla table)", full_encode(), jnp.float32(0))
RT._TABLE_DMA = True
timeit("tile_encode FULL (dma table)", full_encode(), jnp.float32(0))
print("TABLE DMA BENCH DONE")
