"""SDF train-step stage profiling at the Replica operating point (dev tool).

Chained-iteration timings for: occupancy raymarch + sampling, compaction,
fused field eval (value+grad), full loss fwd, full step fwd+bwd+Adam, and
the raw hash-grid gather / segment-sum primitives at step scale.

Run from the repo root: python -u scripts/profile_sdf.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from gssdf_tpu.fields.occupancy import build_occupancy_grid
from gssdf_tpu.fields.sampling import RayBatch, compact_samples, sample_points
from gssdf_tpu.fields.sdf_field import (
    MapGeometry, SDFFieldSpec, init_sdf_field, sdf_apply,
    sdf_apply_with_grad,
)
from gssdf_tpu.fields.hashgrid import (
    _corner_idx_weights, hashgrid_encode,
)
from gssdf_tpu.ops.pallas import segsum as SS
from gssdf_tpu.train.optim import adam_init
from gssdf_tpu.train.sdf import SDFTrainSpec, make_sdf_train_step


def chain(fn, state, iters=10, name=""):
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:44s} {dt:8.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(1)
    field = SDFFieldSpec()
    spec = SDFTrainSpec(
        field=field, batch_rays=32768 // 7, truncated_dis=0.15,
        inner_half_extent=4.0,
    )
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=10.0)
    k1, k2 = jax.random.split(key)
    pts = np.asarray(
        jax.random.uniform(k1, (100_000, 3), minval=-3.5, maxval=3.5)
    )
    grid = build_occupancy_grid(pts, geom, 256)
    params = init_sdf_field(k2, field)
    opt = adam_init(params)

    r = spec.batch_rays
    ko, kd = jax.random.split(key)
    origin = jax.random.uniform(ko, (r, 3), minval=-0.5, maxval=0.5)
    d = jax.random.normal(kd, (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    depth = jnp.full((r, 1), 3.0)

    # full step
    step = make_sdf_train_step(spec, geom, grid)

    def one(carry):
        p, o, k = carry
        k, sub = jax.random.split(k)
        p, o, _ = step(p, o, origin, d, depth, sub, 0.05, 1e-3)
        return (p, o, k)

    chain(one, (params, opt, key), 10, "full SDF step (fwd+bwd+adam)")

    # sampling + compaction only
    def samp(k):
        k, sub = jax.random.split(k)
        rays = RayBatch(origin=origin, direction=d, depth=depth,
                        xyz=origin + d * depth)
        s = sample_points(
            rays, grid, geom, sub,
            surface_sample_num=spec.surface_sample_num,
            free_sample_num=spec.free_sample_num,
            max_hits=spec.max_hits, max_steps=spec.max_steps,
            sample_std=0.05, truncated_dis=spec.truncated_dis,
            inner_half_extent=spec.inner_half_extent,
        )
        s = compact_samples(s, spec.point_budget)
        return jax.random.fold_in(k, jnp.sum(s.mask).astype(jnp.int32))

    chain(jax.jit(samp), key, 10, "raymarch sample + compact")

    # fused field eval fwd (value + grad, full batch)
    n = spec.point_budget
    xyz0 = jax.random.uniform(key, (n, 3), minval=-3.0, maxval=3.0)

    def feval(x):
        sdf, isig, g, _ = sdf_apply_with_grad(params, x, geom, field,
                                              with_hessian=False)
        return x + 1e-30 * (sdf.sum() + g.sum() + isig.sum())

    chain(jax.jit(feval), xyz0, 10, "fused eval fwd (sdf+grad, 32k pts)")

    # eval fwd + bwd wrt params
    def feval_grad(x):
        def loss(p):
            sdf, isig, g, _ = sdf_apply_with_grad(p, x, geom, field,
                                                  with_hessian=False)
            return jnp.sum(sdf ** 2) + jnp.sum((jnp.linalg.norm(g, axis=-1)
                                                - 1.0) ** 2)
        gp = jax.grad(loss)(params)
        return x + 1e-30 * sum(jnp.sum(l) for l in jax.tree.leaves(gp))

    chain(jax.jit(feval_grad), xyz0, 10, "fused eval fwd+bwd (32k pts)")

    # raw hash gather at step scale
    spec_g = field.grid
    idx, w, dw = jax.jit(
        lambda x: _corner_idx_weights(x * 0.1 + 0.5, spec_g, True)
    )(xyz0)
    table = params["table"] if "table" in params else None
    if table is None:
        # locate the table leaf
        for k_, v in params.items():
            if hasattr(v, "shape") and v.ndim == 2 and v.shape[-1] == 2:
                table = v
                break
    flat_idx = idx.reshape(-1)
    print(f"gather rows: {flat_idx.shape[0]} table {table.shape}")

    def g_fwd(t):
        return t + 1e-30 * t[flat_idx].sum()

    chain(jax.jit(g_fwd), table, 10, "hash gather fwd (XLA)")

    ct = jax.random.normal(key, (flat_idx.shape[0], 2))

    def g_vjp(c):
        out = SS.segment_sum(flat_idx, c, table.shape[0])
        return c + 1e-30 * (out * out).sum()

    chain(jax.jit(g_vjp), ct, 10, "hash segsum (sort+kernel)")

    def g_vjp_scatter(c):
        out = jnp.zeros_like(table).at[flat_idx].add(c)
        return c + 1e-30 * (out * out).sum()

    chain(jax.jit(g_vjp_scatter), ct, 5, "hash scatter-add (XLA)")


if __name__ == "__main__":
    main()
