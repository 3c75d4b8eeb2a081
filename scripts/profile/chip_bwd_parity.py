"""On-Mosaic parity of the Pallas composite analytic backward vs XLA autodiff.

Gates long chip runs on the composite-bwd re-parameterization (gauss
recovered as a_raw/opa, ops/pallas/raster.py) actually agreeing with the
XLA scan path's autodiff ON REAL HARDWARE — interpret mode cannot see
Mosaic lowering divergences (the raster_v2 lesson).

Run from the repo root: timeout 900 python -u - < scripts/profile/chip_bwd_parity.py
"""
import sys
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
from gssdf_tpu.utils.math import logit  # noqa: E402

W, H, N = 608, 336, 32768
key = jax.random.PRNGKey(1)
k1, k2, k3, k4 = jax.random.split(key, 4)
anchors = jnp.concatenate(
    [jax.random.uniform(k1, (N, 2), minval=-1.2, maxval=1.2),
     jax.random.uniform(k2, (N, 1), minval=1.0, maxval=6.0)], -1)
quats = jax.random.normal(k3, (N, 4))
model = build_splat_model(
    k4, anchors, jnp.full((N, 3), np.log(0.015)),
    quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
    jnp.full((N,), logit(0.6)), 0, N)
pose = jnp.eye(4, dtype=jnp.float32)
K = jnp.array([[400.0, 0, W / 2], [0, 400.0, H / 2], [0, 0, 1]], jnp.float32)

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
            proj.radii, W, H, tile_cap=128, tile_expand=32,
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
    print(f"{impl}: loss {res[impl][0]:.8f}", flush=True)

ok = True
dv = abs(res["xla"][0] - res["pallas"][0])
print(f"|loss diff| {dv:.3e}")
ok &= dv < 1e-4
for n, gx, gp in zip(names, res["xla"][1], res["pallas"][1]):
    e = float(jnp.max(jnp.abs(gx - gp)))
    scale = float(jnp.max(jnp.abs(gx))) + 1e-30
    rel = e / scale
    # abs-or-rel: tiny-magnitude grads (e.g. colors ~1e-4 here) hit f32
    # accumulation noise at abs ~4e-7, which is parity, not divergence
    line_ok = rel < 2e-3 or e < 1e-5
    ok &= line_ok
    print(f"grad[{n}]: max|dxla-dpallas| {e:.3e}  rel {rel:.3e}  "
          f"{'OK' if line_ok else 'FAIL'}")
print("CHIP_BWD_PARITY", "PASS" if ok else "FAIL")
