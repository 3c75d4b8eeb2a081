"""Chip microbench: tile_encode internals at the bench operating point.

The encode is ~10 ms of the 41 ms fwd+bwd (ARCHITECTURE perf roadmap) —
this isolates where: depth argsort+rank (2 N-row sorts), bbox+two-bucket
emit (area argsort + windowed key pack), the big unstable entry sort, and
the searchsorted + dynamic-slice tile-table build.

Run from the repo root AFTER any long chip job finishes:
  python - < scripts/profile/encode_breakdown.py
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


# 0. full tile_encode (chained through means2d)
@jax.jit
def f_full(carry):
    m2d = proj.means2d + carry * 1e-30
    tl, cnt, _d, _c, _r = RT.tile_encode(
        m2d, proj.radii, proj.depths, proj.valid, W, H, TILE, CAP,
        EXPAND, SMALL)
    return jnp.sum(tl).astype(jnp.float32) * 1e-30


timeit("tile_encode FULL", f_full, jnp.float32(0))


# 1. depth argsort + inverse rank (2 N-row sorts)
@jax.jit
def f_rank(carry):
    d = proj.depths + carry * 1e-30
    order = jnp.argsort(jnp.where(proj.valid, d, jnp.inf))
    rank = jnp.argsort(order).astype(jnp.int32)
    return jnp.sum(rank).astype(jnp.float32) * 1e-30


timeit("depth argsort + inverse rank", f_rank, jnp.float32(0))


# 2. bbox + two-bucket emit (area argsort + key pack), no entry sort
@jax.jit
def f_emit(carry):
    m2d = proj.means2d + carry * 1e-30
    tx0, tx1, ty0, ty1, ctx, cty = RT._true_bbox(
        m2d, proj.radii, tiles_x, tiles_y, TILE)
    order = jnp.argsort(jnp.where(proj.valid, proj.depths, jnp.inf))
    rank = jnp.argsort(order).astype(jnp.int32)
    k_big = N // 8
    area = jnp.where(proj.valid, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
    by_area = jnp.argsort(-area).astype(jnp.int32)
    cols = jnp.stack(
        [tx0, tx1, ty0, ty1, ctx, cty, rank,
         proj.valid.astype(jnp.int32)], axis=1)
    fcols = jnp.concatenate([m2d, proj.radii[:, None]], axis=1)
    rank_bits = min(max(N - 1, 1).bit_length(),
                    30 - (num_tiles + 1).bit_length())

    def bucket(ids, expand):
        c = cols[ids]
        f = fcols[ids]
        v = c[:, 7] > 0
        x0c, y0c, sx, sy = RT._window(
            c[:, 0], c[:, 1], c[:, 2], c[:, 3], c[:, 4], c[:, 5], v, expand)
        return RT._emit_entries(
            x0c, y0c, sx, sy, c[:, 6], ids, expand, tiles_x, num_tiles,
            rank_bits, TILE, f[:, 0], f[:, 1], f[:, 2])

    kb, pb = bucket(by_area[:k_big], EXPAND)
    ks, ps = bucket(by_area[k_big:], SMALL)
    return (jnp.sum(kb) + jnp.sum(ks)).astype(jnp.float32) * 1e-30


timeit("bbox + rank + two-bucket emit", f_emit, jnp.float32(0))

# 3. the big unstable entry sort alone (fixed emitted keys)
rows = (N // 8) * EXPAND + (N - N // 8) * SMALL
kk = jax.random.randint(jax.random.PRNGKey(5), (rows,), 0,
                        np.int32(2**30), jnp.int32)
pp = jax.random.randint(jax.random.PRNGKey(6), (rows,), 0, N, jnp.int32)
kk, pp = jax.block_until_ready((kk, pp))
print(f"  entry rows: {rows}")


@jax.jit
def f_sort(carry):
    # chain: a data-dependent low bit feeds the next iteration's keys so
    # the sort can be neither elided nor constant-folded (CLAUDE.md)
    k2_ = kk + carry
    sk, sp = jax.lax.sort((k2_, pp), num_keys=1, is_stable=False)
    return sp[0] & 1


timeit("entry sort (unstable, packed key)", f_sort, jnp.int32(0))

# 4. searchsorted + dynamic-slice table build (sorted keys fixed)
sk0, sp0 = jax.block_until_ready(
    jax.jit(lambda: jax.lax.sort((kk, pp), num_keys=1,
                                 is_stable=False))())
rank_bits = min(max(N - 1, 1).bit_length(), 30 - (num_tiles + 1).bit_length())


@jax.jit
def f_table(carry):
    # chain through the payloads (see f_sort)
    sp_ = sp0 + carry
    starts = jnp.searchsorted(
        sk0, jnp.arange(num_tiles + 1) << rank_bits, side="left")
    r_idx = jnp.arange(CAP, dtype=jnp.int32)
    src = starts[:-1, None] + r_idx[None, :]
    in_seg = src < starts[1:, None]
    pay_pad = jnp.concatenate([sp_, jnp.full((CAP,), N, jnp.int32)])
    vals = jax.vmap(
        lambda s: jax.lax.dynamic_slice(pay_pad, (s,), (CAP,))
    )(starts[:-1])
    tl = jnp.where(in_seg, vals, N)
    return tl[0, 0] & 1


timeit("searchsorted + table build", f_table, jnp.int32(0))
print("ENCODE BREAKDOWN DONE")
