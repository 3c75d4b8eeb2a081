"""Chip profiler: attribute the joint GS step at the REAL operating point.

Loads the committed 270k-splat r02 checkpoint + regenerates its synthetic
dataset, then times jitted joint-step variants (chained) to attribute the
~160 ms/iter wall (VERDICT r02 weak #3):

  full            — as configured (gs_sdf_reg on, budget 65536, rays 32768)
  no-reg          — gs_sdf_reg=False: render fwd+bwd + densify + adam only
  tiny-rays       — full but batch_rays=512: SDF ray-loss share
  budget sweep    — gs_sdf reg hash-gather share

Run from the repo root: python - < scripts/profile/prof_joint270k.py
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

from scripts.validate_synth import make_dataset  # noqa: E402
from gssdf_tpu.config import load_config  # noqa: E402
from gssdf_tpu.train.pipeline import Pipeline, pick_ray_batch  # noqa: E402
from gssdf_tpu.train.gs import GSTrainer, sdf_lr_at, xyz_lr_at  # noqa: E402

RUN = Path("output/20260819_034554_synth_scene_run")
root = Path("/tmp/synth_scene_prof")
if not (root / "traj.txt").exists():
    make_dataset(root, 40)

cfg = load_config(RUN / "model" / "config" / "run.yaml", root,
                  make_run_dir=False)
cfg.output_path = ""
cfg.model_path = ""
pipe = Pipeline(cfg)
pipe.build_occ_map()
pipe.load_checkpoint(RUN / "model")
print("splats:", int(np.asarray(pipe.gs_state.alive).sum()),
      "cap:", int(pipe.gs_state.alive.shape[0]))

gt_np, pose_np = pipe.loader.train_frame(0)
gt0 = jnp.asarray(gt_np)
pose0 = jnp.asarray(pose_np, jnp.float32)
mask = pipe._train_mask()
N = 15


def time_spec(tag, spec):
    trainer = GSTrainer(spec, pipe.geom, pipe.grid, pipe.loader.camera)
    st = jax.tree_util.tree_map(jnp.array, pipe.gs_state)

    def once(st, i):
        k1, k2 = jax.random.split(pipe._next_key())
        rays = pick_ray_batch(pipe.pack_dev, k1, spec.sdf.batch_rays)
        xyz_lr = xyz_lr_at(spec, i)
        return trainer.step_fn(
            st, gt0, pose0, *rays, k2, pipe.sample_std,
            sdf_lr_at(spec, xyz_lr), xyz_lr, 0, True, False, mask,
        )

    st, _ = once(st, 700)
    jax.block_until_ready(st.params)
    t0 = time.perf_counter()
    for i in range(N):
        st, _ = once(st, 700 + i)
    jax.block_until_ready(st.params)
    dt = (time.perf_counter() - t0) / N * 1e3
    print(f"{tag:<42s} {dt:7.1f} ms/iter")
    return dt


import dataclasses  # noqa: E402

spec = pipe._gs_spec()
full = time_spec(f"full (budget={spec.gs_sdf_budget}, rays="
                 f"{spec.sdf.batch_rays})", spec)
time_spec("no-reg (gs_sdf_reg=False)",
          dataclasses.replace(spec, gs_sdf_reg=False))
time_spec("tiny-rays (batch_rays=512)",
          dataclasses.replace(
              spec, sdf=dataclasses.replace(
                  spec.sdf, batch_rays=512, point_budget=4096)))
for budget in (32768, 16384):
    time_spec(f"budget={budget}",
              dataclasses.replace(spec, gs_sdf_budget=budget))
time_spec("no-align (align_weight=0)",
          dataclasses.replace(
              spec, sdf=dataclasses.replace(spec.sdf, align_weight=0.0)))
print("PROF270K DONE")
