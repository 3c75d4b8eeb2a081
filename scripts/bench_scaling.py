"""Multi-chip scaling harness: rays/s (SDF phase) and cameras/s (GS phase)
vs device count on a 1-D data mesh (BASELINE.md configs 4-5).

On real multi-chip hardware this measures ICI scaling; in this sealed
single-chip environment it runs on the virtual CPU mesh
(--xla_force_host_platform_device_count), which validates that the SPMD
program scales structurally (per-device work constant, collectives in the
graph) — absolute numbers then reflect host-CPU throughput, not TPU.

WEAK scaling: the global batch grows with the mesh (fixed per-device batch),
the reference semantics of "one camera per chip per step".

Usage: python scripts/bench_scaling.py [--devices 1 2 4 8] [--tpu]
"""

import argparse
import json
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))


def main():
    ap = argparse.ArgumentParser()
    ap.add_argument("--devices", type=int, nargs="+", default=[1, 2, 4, 8])
    ap.add_argument("--tpu", action="store_true",
                    help="run on the real backend (default: 8 virtual CPU)")
    ap.add_argument("--rays-per-dev", type=int, default=4096)
    ap.add_argument("--iters", type=int, default=10)
    args = ap.parse_args()

    if not args.tpu:
        import os
        os.environ["XLA_FLAGS"] = (
            os.environ.get("XLA_FLAGS", "")
            + " --xla_force_host_platform_device_count=8"
        )
        import jax
        jax.config.update("jax_platforms", "cpu")
    import jax
    import jax.numpy as jnp
    import numpy as np

    from gssdf_tpu.fields.occupancy import build_occupancy_grid
    from gssdf_tpu.fields.sdf_field import (
        MapGeometry, SDFFieldSpec, init_sdf_field,
    )
    from gssdf_tpu.gs.model import build_splat_model
    from gssdf_tpu.gs.render import RenderSettings
    from gssdf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
    from gssdf_tpu.parallel.train import (
        make_multicam_gs_train_step, make_sharded_sdf_train_step,
    )
    from gssdf_tpu.sensors.cameras import Camera
    from gssdf_tpu.train.gs import GSTrainSpec, RefineSpec, gs_state_init
    from gssdf_tpu.train.optim import adam_init
    from gssdf_tpu.train.sdf import SDFTrainSpec
    from gssdf_tpu.utils.math import logit

    avail = len(jax.devices())
    sizes = [d for d in args.devices if d <= avail]

    field = SDFFieldSpec()
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=8.0)
    rng = np.random.RandomState(0)
    sph = rng.randn(50_000, 3)
    sph /= np.linalg.norm(sph, axis=1, keepdims=True)
    grid = build_occupancy_grid((sph * 2.5).astype(np.float32), geom, 128)

    params0 = init_sdf_field(jax.random.PRNGKey(0), field)
    opt0 = adam_init(params0)

    results = []
    for nd in sizes:
        mesh = make_mesh(nd)
        spec = SDFTrainSpec(
            field=field, batch_rays=args.rays_per_dev * nd,
            truncated_dis=0.15, inner_half_extent=3.0,
        )
        step = make_sharded_sdf_train_step(spec, geom, grid, mesh)
        # fresh copies per mesh size: the step donates params/opt buffers
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        params = replicate(mesh, copy(params0))
        opt = replicate(mesh, copy(opt0))
        r = spec.batch_rays
        key = jax.random.PRNGKey(1)
        d = jax.random.normal(key, (r, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o, dd, t = shard_batch(
            mesh, (jnp.zeros((r, 3)), d, jnp.full((r, 1), 2.5))
        )

        def one(carry):
            p, op, k = carry
            k, sub = jax.random.split(k)
            p, op, _ = step(p, op, o, dd, t, sub, 0.05, 1e-3)
            return (p, op, k)

        state = one((params, opt, key))
        jax.block_until_ready(state)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            state = one(state)
        jax.block_until_ready(state)
        dt = (time.perf_counter() - t0) / args.iters
        rec = {
            "metric": "sdf_rays_per_s", "devices": nd,
            "value": round(r / dt, 1), "per_device": round(r / dt / nd, 1),
            "step_ms": round(dt * 1e3, 2), "unit": "rays/s",
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    # GS phase: one camera per device per step (weak scaling)
    W = H = 128
    cam = Camera(fx=120.0, fy=120.0, cx=W / 2, cy=H / 2, width=W, height=H)
    n = 4096
    anchors = jnp.asarray(
        (sph[:n] * 2.5 + rng.randn(n, 3) * 0.01).astype(np.float32)
    )
    model = build_splat_model(
        jax.random.PRNGKey(2), anchors, jnp.full((n, 3), np.log(0.05)),
        jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        jnp.full((n,), logit(0.5)), 0, n,
    )
    sdf_spec = SDFTrainSpec(
        field=field, batch_rays=1024, truncated_dis=0.15,
        inner_half_extent=3.0,
    )
    for nd in sizes:
        mesh = make_mesh(nd)
        spec = GSTrainSpec(
            sdf=sdf_spec,
            render=RenderSettings(width=W, height=H, tile_cap=128,
                                  tile_expand=16, tile_expand_small=8),
            refine=RefineSpec(),
            num_train_data=nd,
            gs_iter_step=100,
        )
        step = make_multicam_gs_train_step(spec, geom, grid, cam, mesh)
        copy = lambda t: jax.tree_util.tree_map(jnp.array, t)
        state = replicate(mesh, gs_state_init(copy(params0), copy(model)))
        gt = jnp.zeros((nd, H, W, 3))
        poses = jnp.tile(jnp.eye(4)[None], (nd, 1, 1))
        poses = poses.at[:, 2, 3].set(-4.0)
        gt_s, poses_s = shard_batch(mesh, (gt, poses))
        r = sdf_spec.batch_rays
        key = jax.random.PRNGKey(3)
        d = jax.random.normal(key, (r, 3))
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        o, dd, t = shard_batch(
            mesh, (jnp.zeros((r, 3)), d, jnp.full((r, 1), 2.5))
        )

        def one(carry):
            st, k = carry
            k, sub = jax.random.split(k)
            st, _ = step(st, gt_s, poses_s, o, dd, t, sub, 0.05, 1e-3,
                         1.6e-3, 0, True, False, None)
            return (st, k)

        carry = one((state, key))
        jax.block_until_ready(carry)
        t0 = time.perf_counter()
        for _ in range(args.iters):
            carry = one(carry)
        jax.block_until_ready(carry)
        dt = (time.perf_counter() - t0) / args.iters
        rec = {
            "metric": "gs_cams_per_s", "devices": nd,
            "value": round(nd / dt, 2), "step_ms": round(dt * 1e3, 2),
            "unit": "cams/s",
        }
        results.append(rec)
        print(json.dumps(rec), flush=True)

    return results


if __name__ == "__main__":
    main()
