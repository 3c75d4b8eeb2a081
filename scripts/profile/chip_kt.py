"""Chip validation + sweep for the multi-tile composite (GSSDF_RASTER_KT).

Parity on REAL Mosaic first (the raster_v2 lesson: interpret mode cannot
see Mosaic lowering divergences), then timing at the bench operating point.

  1. kt=1 (new parameterized lowering) fwd/bwd vs the XLA path — the
     default path's lowering changed shape-wise and must be revalidated.
  2. kt in {2, 4, 8} fwd/bwd vs kt=1 — must be bit-identical or near.
  3. Chained render fwd+bwd timing per kt at 131k splats / 1200x680.

Run from the repo root: python - < scripts/profile/chip_kt.py
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

from gssdf_tpu.gs.model import SplatModel, build_splat_model  # noqa: E402
from gssdf_tpu.gs.render import RenderSettings, render_splats  # noqa: E402
from gssdf_tpu.utils.math import logit  # noqa: E402

W, H = 1200, 680
N = 131072
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
settings = RenderSettings(width=W, height=H, tile_cap=256, tile_expand=32,
                          tile_expand_small=8)
pose = jnp.eye(4, dtype=jnp.float32)
K = jnp.array([[600.0, 0, W / 2], [0, 600.0, H / 2], [0, 0, 1]], jnp.float32)
target = jnp.zeros((H, W, 3))


def make_step(impl):
    def loss_fn(params):
        m = SplatModel(params=params, anchors=model.anchors,
                       alive=model.alive)
        out = render_splats(m, pose, K, settings, training=True)
        return (jnp.mean(jnp.abs(out["color"] - target))
                + 0.01 * jnp.mean(out["depth"])), out

    def fwd(params):
        return loss_fn(params)

    grad_fn = jax.grad(lambda p: loss_fn(p)[0])

    @jax.jit
    def step(params):
        g = grad_fn(params)
        return jax.tree.map(lambda p, gg: p - 1e-12 * gg, params, g)

    return jax.jit(fwd), grad_fn, step


def run_case(kt):
    os.environ["GSSDF_RASTER_KT"] = str(kt)
    fwd, grad_fn, step = make_step("pallas")
    (val, out) = fwd(model.params)
    g = grad_fn(model.params)
    jax.block_until_ready((val, g))
    s = jax.tree_util.tree_map(jnp.array, model.params)
    s = step(s)
    jax.block_until_ready(s)
    t0 = time.perf_counter()
    iters = 15
    for _ in range(iters):
        s = step(s)
    jax.block_until_ready(s)
    dt = (time.perf_counter() - t0) / iters
    return float(val), out, g, dt


v1, out1, g1, dt1 = run_case(1)
print(f"kt=1: loss {v1:.6f}  fwd+bwd {dt1 * 1e3:.1f} ms "
      f"({N / dt1 / 1e6:.2f} M splats/s)  chunk_active "
      f"{float(out1['chunk_active']):.3f}")

# parity of the re-parameterized kt=1 lowering against the XLA scan path
# (render_splats has no impl knob; call the rasterizer directly)
from gssdf_tpu.gs.projection import project_2dgs  # noqa: E402
from gssdf_tpu.gs.rasterize_tiled import rasterize_tiled  # noqa: E402
from gssdf_tpu.gs.model import generate_gaussian  # noqa: E402

xyz, q, sc, opa, sh = generate_gaussian(model, training=False)
proj = project_2dgs(xyz, q, sc, pose, K, W, H, settings.near, settings.far)
cols = jnp.ones((N, 3)) * 0.5


def raster(impl):
    os.environ["GSSDF_RASTER_KT"] = "1"
    f = jax.jit(lambda: rasterize_tiled(
        proj.means2d, proj.M, proj.depths, proj.normals, cols,
        opa, proj.valid, proj.radii, W, H,
        tile_cap=256, tile_expand=32, tile_expand_small=8, impl=impl))
    r = f()
    jax.block_until_ready(r)
    return r


rx, rp = raster("xla"), raster("pallas")
e = float(jnp.max(jnp.abs(rx["color"] - rp["color"])))
print(f"kt=1 vs XLA fwd: max|color err| {e:.2e} "
      f"{'MOSAIC-OK' if e < 1e-3 else 'MOSAIC-FAIL'}")

for kt in (2, 4, 8):
    vk, outk, gk, dtk = run_case(kt)
    e_img = float(jnp.max(jnp.abs(outk["color"] - out1["color"])))
    e_g = max(
        float(jnp.max(jnp.abs(a - b)))
        for a, b in zip(jax.tree_util.tree_leaves(gk),
                        jax.tree_util.tree_leaves(g1))
        if a.size
    )
    ok = e_img < 1e-6 and e_g < 1e-6
    print(f"kt={kt}: loss {vk:.6f}  fwd+bwd {dtk * 1e3:.1f} ms "
          f"({N / dtk / 1e6:.2f} M splats/s)  |color-kt1| {e_img:.2e} "
          f"|grad-kt1| {e_g:.2e}  {'PARITY-OK' if ok else 'PARITY-FAIL'}")
print("CHIP_KT DONE")
