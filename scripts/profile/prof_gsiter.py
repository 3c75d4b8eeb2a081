"""Chip profiler: where do the 628 ms/gs_iter of the synth-replica smoke go?

Builds the pipeline at the committed smoke operating point, then times
  (a) the jitted joint step alone (chained),
  (b) step + host fetch + callback (the real loop body),
  (c) the SDF-only step for reference.
"""
import time
from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from gssdf_tpu.config import load_config
from gssdf_tpu.train.pipeline import (
    Pipeline, _frame_order, _FrameFetcher, pick_ray_batch,
)
from gssdf_tpu.train.gs import sdf_lr_at, xyz_lr_at

cfg = load_config(Path("/tmp/synth_cfg/run.yaml"), Path("/tmp/synth_replica"),
                  make_run_dir=False)
cfg.output_path = ""
cfg.model_path = ""
pipe = Pipeline(cfg)
pipe.build_occ_map()
pipe.nsdf_train(60)
pipe.init_gs()

spec = pipe._gs_spec()
from gssdf_tpu.train.gs import GSTrainer
trainer = GSTrainer(spec, pipe.geom, pipe.grid, pipe.loader.camera, mesh=None)
pipe.gs_trainer = trainer
mask = pipe._train_mask()
n_train = pipe.loader.num_train
order = _frame_order(cfg.seed, n_train, 200, 1)
fetch = _FrameFetcher(pipe.loader, order, 1, True)
it = iter(fetch)
gt_b, pose_b = next(it)
gt0 = jnp.asarray(gt_b[0])
pose0 = jnp.asarray(pose_b[0])

state = pipe.gs_state


def step_once(state, i):
    k1, k2 = jax.random.split(pipe._next_key())
    rays = pick_ray_batch(pipe.pack_dev, k1, spec.sdf.batch_rays)
    xyz_lr = xyz_lr_at(spec, i)
    return trainer.step_fn(
        state, gt0, pose0, *rays, k2, pipe.sample_std,
        sdf_lr_at(spec, xyz_lr), xyz_lr, 0, True, False, mask,
    )


# warm
state, aux = step_once(state, 60)
jax.block_until_ready(state.params)
t0 = time.perf_counter()
N = 20
for i in range(N):
    state, aux = step_once(state, 60 + i)
jax.block_until_ready(state.params)
print(f"joint step_fn only (chained): {(time.perf_counter()-t0)/N*1e3:.1f} ms")

# with fetch + callback like the real loop
t0 = time.perf_counter()
for i in range(N):
    gt_b, pose_b = next(it)
    state, aux = step_once(state, 60 + i)
    state, rinfo = trainer.callback(state, 60 + i, pipe._next_key(), stride=1)
jax.block_until_ready(state.params)
print(f"loop body (fetch+step+callback): {(time.perf_counter()-t0)/N*1e3:.1f} ms")

# color-only variant and sdf-only step for attribution
def step_color(state, i):
    k1, k2 = jax.random.split(pipe._next_key())
    rays = pick_ray_batch(pipe.pack_dev, k1, spec.sdf.batch_rays)
    return trainer.step_fn(
        state, gt0, pose0, *rays, k2, pipe.sample_std,
        0.0, 0.0, 0, False, True, mask,
    )

state, aux = step_color(state, 0)
jax.block_until_ready(state.params)
t0 = time.perf_counter()
for i in range(N):
    state, aux = step_color(state, i)
jax.block_until_ready(state.params)
print(f"color-only step_fn (chained): {(time.perf_counter()-t0)/N*1e3:.1f} ms")
print("PROF DONE")

# gs_sdf_budget attribution: the joint step's GS->SDF regularizer evaluates
# the hash grid at (budget or capacity) splat samples — sweep the budget to
# read its share of the step directly (0 = full capacity).
import dataclasses

cap = int(pipe.gs_state.alive.shape[0])
for budget in (0, 65536, 32768, 16384):
    if budget >= cap:
        continue
    spec_b = dataclasses.replace(spec, gs_sdf_budget=budget)
    tr_b = GSTrainer(spec_b, pipe.geom, pipe.grid, pipe.loader.camera,
                     mesh=None)
    st = jax.tree_util.tree_map(jnp.array, pipe.gs_state)

    def once(st, i):
        k1, k2 = jax.random.split(pipe._next_key())
        rays = pick_ray_batch(pipe.pack_dev, k1, spec.sdf.batch_rays)
        xyz_lr = xyz_lr_at(spec, i)
        return tr_b.step_fn(
            st, gt0, pose0, *rays, k2, pipe.sample_std,
            sdf_lr_at(spec, xyz_lr), xyz_lr, 0, True, False, mask,
        )

    st, _ = once(st, 60)
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    for i in range(N):
        st, _ = once(st, 60 + i)
    jax.block_until_ready(st.params)
    print(f"joint step gs_sdf_budget={budget or cap} (cap {cap}): "
          f"{(time.perf_counter()-t0)/N*1e3:.1f} ms")
print("BUDGET SWEEP DONE")
