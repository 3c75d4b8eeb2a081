"""Tile-cap honesty measurement on the FINISHED validation model.

VERDICT r03 item 5: the live run's train-time drop_vis (0.05-0.09 at
~430k alive, cap 512) sits above the e2e test's 5% bound — the claim
"training absorbs its own truncation; exported images are exact" must be
demonstrated on the final model, not asserted. This renders several
frames of the finished reference-budget run at:

  train settings   (tile_cap 512 / expand 64 / small 8)
  eval settings    (cfg.eval_* = 2048 / 256 / 16 — what exports use)
  unbounded ref    (4096 / 256 / 16 — cap high enough that drop_vis ~ 0)

and reports per-frame PSNR of train/eval settings AGAINST the unbounded
reference plus each setting's drop_vis/clamp_frac telemetry.

Run AFTER the validation run completes (gs_resume/gs_done present):
  python - < scripts/profile/cap_honesty.py [run_dir via CAP_RUN env]
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path.cwd()))
sys.path.insert(0, str(Path.cwd() / "scripts"))

import numpy as np

from gssdf_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

run_dir = os.environ.get(
    "CAP_RUN", "output/20260820_012451_synth_scene_run"
)

# rebuild the dataset + config exactly as validate_synth does
from validate_synth import make_dataset  # noqa: E402

root = Path("/tmp/synth_scene")
if not (root / "results").exists():
    import shutil

    shutil.rmtree(root, ignore_errors=True)
    make_dataset(root, 40)
cfg_dir = root / "cfg"
if not (cfg_dir / "run.yaml").exists():
    raise SystemExit("run validate_synth first (config missing)")

from gssdf_tpu.config import load_config  # noqa: E402
from gssdf_tpu.train.pipeline import Pipeline, splat_model  # noqa: E402
from gssdf_tpu.gs.render import RenderSettings  # noqa: E402
from gssdf_tpu.losses import psnr as psnr_fn  # noqa: E402

import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

cfg = load_config(cfg_dir / "run.yaml", root, make_run_dir=False)
cfg.output_path = str(Path(run_dir))
cfg.model_path = str(Path(run_dir) / "model")
pipe = Pipeline(cfg)
if cfg.prefilter > 0:
    pipe.prefilter_data()
pipe.build_occ_map()
pipe.load_checkpoint(Path(cfg.model_path))
start = pipe.load_gs_resume()
print(f"model loaded at gs_iter {start}", flush=True)
model = splat_model(pipe.gs_state)
alive = int(np.asarray(pipe.gs_state.alive).sum())
print(f"alive splats: {alive}", flush=True)

cam = pipe.loader.camera
K = jnp.asarray(cam.K)
SETTINGS = {
    "train(512/64/8)": dict(tile_cap=512, tile_expand=64,
                            tile_expand_small=8),
    "eval(2048/256/16)": dict(tile_cap=cfg.eval_tile_cap,
                              tile_expand=cfg.eval_tile_expand,
                              tile_expand_small=cfg.eval_tile_expand_small),
    "unbounded(4096/256/16)": dict(tile_cap=4096, tile_expand=256,
                                   tile_expand_small=16),
}


def render(s_kw, pose):
    rs = RenderSettings(
        width=cam.width, height=cam.height, near=cfg.near, far=cfg.far,
        sh_degree=cfg.sh_degree, tile_size=cfg.tile_size,
        bck_color=cfg.bck_color, **s_kw)
    out = pipe._render_jit(model, jnp.asarray(pose), K, rs, training=False)
    return (np.asarray(out["color"]), float(out["drop_vis"]),
            float(out["clamp_frac"]))


# window-honesty stats on the final model (DIAGNOSIS_r04): how much of
# the model exceeds what the train windows can render?
try:
    import numpy as _np

    from gssdf_tpu.gs.model import generate_gaussian
    from gssdf_tpu.gs.projection import project_2dgs

    _xyz, _q, _sc, _opa, _ = generate_gaussian(model, training=False)
    _p = project_2dgs(
        _xyz, _q, _sc, jnp.asarray(pipe.loader.parser.color_poses[0]),
        K, cam.width, cam.height, cfg.near, cfg.far,
    )
    _r = _np.asarray(_p.radii)[_np.asarray(_p.valid)]
    _s2 = _np.exp(_np.asarray(model.params.scaling)[
        _np.asarray(pipe.gs_state.alive)][:, :2]).max(1)
    print("world max-scale pct[50,90,99,99.9]:",
          _np.percentile(_s2, [50, 90, 99, 99.9]).round(4),
          "max", round(float(_s2.max()), 2), flush=True)
    print("screen radius px pct[50,90,99]:",
          _np.percentile(_r, [50, 90, 99]).round(1),
          f"| >60px: {100 * (_r > 0.05 * max(cam.width, cam.height)).mean():.2f}%",
          flush=True)
except Exception as e:  # stats are best-effort
    print(f"radius stats failed: {e}", flush=True)

ids = pipe.loader.parser.train_ids
frames = [ids[i] for i in np.linspace(0, len(ids) - 1, 5).astype(int)]
rows = {k: [] for k in SETTINGS}
for fi in frames:
    pose = pipe.loader.parser.color_poses[fi]
    ref_img, ref_dv, _ = render(SETTINGS["unbounded(4096/256/16)"], pose)
    for name, s_kw in SETTINGS.items():
        if name.startswith("unbounded"):
            rows[name].append((np.inf, ref_dv, 0.0))
            continue
        img, dv, cf = render(s_kw, pose)
        p = float(psnr_fn(jnp.asarray(img), jnp.asarray(ref_img)))
        rows[name].append((p, dv, cf))
    print(f"frame {fi} done", flush=True)

print("\nsetting                      PSNR-vs-unbounded   drop_vis   clamp")
for name, vals in rows.items():
    ps = [v[0] for v in vals]
    dv = np.mean([v[1] for v in vals])
    cf = np.mean([v[2] for v in vals])
    ptxt = ("   ref   " if np.isinf(ps[0])
            else f"{np.mean(ps):6.1f} dB (min {np.min(ps):5.1f})")
    print(f"{name:<28s} {ptxt}   {dv:8.5f}  {cf:6.3f}")
print("CAP_HONESTY DONE")
