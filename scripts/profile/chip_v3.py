"""Chip validation + timing for the V3/V4 composite chunk-math variants.

Runs at whatever GSSDF_RASTER_V3 / GSSDF_RASTER_V4 say (the flags are
read at module import):
  GSSDF_RASTER_V3=0 python -u - < scripts/profile/chip_v3.py   # baseline
  GSSDF_RASTER_V3=1 python -u - < scripts/profile/chip_v3.py   # V3
  GSSDF_RASTER_V4=1 python -u - < scripts/profile/chip_v3.py   # V4
  GSSDF_RASTER_V3=1 GSSDF_RASTER_V4=1 ... < chip_v3.py         # V3+V4

Each invocation reports (a) fwd parity of the Pallas path vs the XLA scan
path ON REAL MOSAIC (the raster_v2 lesson: interpret mode cannot see
Mosaic lowering divergences), (b) grad parity vs XLA autodiff, and
(c) chained fwd+bwd / fwd-only timing at the bench operating point
(131k splats / 1200x680 / cap 256).
"""
import os
import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path.cwd()))

import jax
import jax.numpy as jnp
import numpy as np

from gssdf_tpu.utils.compile_cache import enable_compilation_cache

enable_compilation_cache()

from gssdf_tpu.gs.model import SplatModel, build_splat_model, generate_gaussian  # noqa: E402
from gssdf_tpu.gs.projection import project_2dgs  # noqa: E402
from gssdf_tpu.gs.rasterize_tiled import rasterize_tiled  # noqa: E402
from gssdf_tpu.gs.render import RenderSettings, render_splats  # noqa: E402
from gssdf_tpu.ops.pallas import raster  # noqa: E402
from gssdf_tpu.utils.math import logit  # noqa: E402

print(f"V3 = {raster._V3}  V4 = {raster._V4}", flush=True)

W, H, N = 1200, 680, 131072
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

# ---- parity at a reduced point (cheap compile), pallas vs xla scan ----
xyz, q, sc, opa, _ = generate_gaussian(model, training=False)
proj = project_2dgs(xyz, q, sc, pose, K, W, H, 0.3, 100.0)
cols = jax.random.uniform(jax.random.PRNGKey(7), (N, 3))
tgt_c = jax.random.uniform(jax.random.PRNGKey(8), (H, W, 3))
wd = jax.random.normal(jax.random.PRNGKey(9), (H, W))


def make_loss(impl):
    @jax.jit
    def loss(args):
        means2d, M, normals, colors, opac = args
        out = rasterize_tiled(
            means2d, M, proj.depths, normals, colors, opac, proj.valid,
            proj.radii, W, H, tile_cap=256, tile_expand=32,
            tile_expand_small=8, impl=impl)
        return (jnp.mean(jnp.abs(out["color"] - tgt_c))
                + 0.01 * jnp.mean(jnp.squeeze(out["depth"]) * wd)
                + 0.003 * jnp.mean(out["normal"] ** 2)
                + 0.002 * jnp.mean(out["alpha"])
                + 0.05 * jnp.mean(out["visibilities"]))
    return loss


args = (proj.means2d, proj.M, proj.normals, cols, opa)
names = ("means2d", "M", "normals", "colors", "opacity")
res = {}
for impl in ("xla", "pallas"):
    lf = make_loss(impl)
    v = lf(args)
    g = jax.jit(jax.grad(lf))(args)
    jax.block_until_ready(g)
    res[impl] = (float(v), g)
ok = abs(res["xla"][0] - res["pallas"][0]) < 1e-4
print(f"|loss diff| {abs(res['xla'][0] - res['pallas'][0]):.3e}")
for n, gx, gp in zip(names, res["xla"][1], res["pallas"][1]):
    e = float(jnp.max(jnp.abs(gx - gp)))
    rel = e / (float(jnp.max(jnp.abs(gx))) + 1e-30)
    line_ok = rel < 2e-3 or e < 1e-5
    ok &= line_ok
    print(f"grad[{n}]: abs {e:.3e} rel {rel:.3e} "
          f"{'OK' if line_ok else 'FAIL'}", flush=True)
print("PARITY", "PASS" if ok else "FAIL", flush=True)

# ---- chained timing at the bench point ----
settings = RenderSettings(width=W, height=H, tile_cap=256, tile_expand=32,
                          tile_expand_small=8)
target = jnp.zeros((H, W, 3))


def loss_fn(params):
    m = SplatModel(params=params, anchors=model.anchors, alive=model.alive)
    out = render_splats(m, pose, K, settings, training=True)
    return jnp.mean(jnp.abs(out["color"] - target)) + 0.01 * jnp.mean(
        out["depth"])


grad_fn = jax.grad(loss_fn)


@jax.jit
def step(params):
    g = grad_fn(params)
    return jax.tree.map(lambda p, gg: p - 1e-12 * gg, params, g)


@jax.jit
def fwd(params):
    m = SplatModel(params=params, anchors=model.anchors, alive=model.alive)
    out = render_splats(m, pose, K, settings, training=True)
    s = jnp.mean(out["color"]) + jnp.mean(out["depth"])
    return jax.tree.map(lambda p: p + s * 1e-30, params)


def chain(fn, state, iters):
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    return (time.perf_counter() - t0) / iters


dt_f = chain(fwd, model.params, 20)
dt_fb = chain(step, jax.tree_util.tree_map(jnp.array, model.params), 20)
print(f"fwd {dt_f * 1e3:.1f} ms   fwd+bwd {dt_fb * 1e3:.1f} ms "
      f"({N / dt_fb / 1e6:.2f} M splats/s)", flush=True)
print("CHIP_V3 DONE")
