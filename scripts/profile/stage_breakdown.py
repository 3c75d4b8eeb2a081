"""Stage-level timing of the tiled render fwd+bwd at the bench operating
point (real TPU). Chained iterations per CLAUDE.md."""
import time, functools
import jax, jax.numpy as jnp
import numpy as np

from gssdf_tpu.gs.model import build_splat_model, SplatModel
from gssdf_tpu.gs.render import RenderSettings, render_splats
from gssdf_tpu.gs.rasterize_tiled import tile_encode, _cdiv
from gssdf_tpu.gs.rasterize_jax import splat_coeffs
from gssdf_tpu.gs.projection import project_2dgs
from gssdf_tpu.gs.sh import eval_sh
from gssdf_tpu.utils.math import logit
import gssdf_tpu.ops.pallas.raster as R

W, H = 1200, 680
n = 131072
TILE, CAP, EXPAND = 16, 256, 32
tiles_x, tiles_y = _cdiv(W, TILE), _cdiv(H, TILE)
num_tiles = tiles_x * tiles_y

key = jax.random.PRNGKey(0)
k1, k2, k3, k4 = jax.random.split(key, 4)
anchors = jnp.concatenate([
    jax.random.uniform(k1, (n, 2), minval=-2.0, maxval=2.0),
    jax.random.uniform(k2, (n, 1), minval=1.0, maxval=8.0)], -1)
quats = jax.random.normal(k3, (n, 4))
model = build_splat_model(k4, anchors, jnp.full((n, 3), np.log(0.01)),
                          quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
                          jnp.full((n,), logit(0.7)), 0, n)
pose = jnp.eye(4, dtype=jnp.float32)
from gssdf_tpu.sensors.cameras import Camera
cam = Camera(fx=600.0, fy=600.0, cx=W/2, cy=H/2, width=W, height=H)
K = jnp.asarray(cam.K, jnp.float32)
target = jnp.zeros((H, W, 3))
settings = RenderSettings(width=W, height=H, tile_cap=CAP, tile_expand=EXPAND)

def timeit(name, fn, state, iters=10):
    state = jax.block_until_ready(fn(state))   # compile
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters
    print(f"{name:36s} {dt*1e3:9.2f} ms")
    return dt

from gssdf_tpu.gs.model import generate_gaussian

def project_stage(params):
    m = SplatModel(params=params, anchors=model.anchors, alive=model.alive)
    xyz, q, s, o, sh = generate_gaussian(m, True)
    proj = project_2dgs(xyz, q, s, jnp.eye(4), K, W, H, 0.05, 300.0,
                        sample_eps=jnp.zeros((n,2)))
    dirs = xyz * jax.lax.rsqrt(jnp.sum(xyz*xyz,-1,keepdims=True)+1e-24)
    colors = eval_sh(0, sh, dirs)
    return proj, colors, o

proj0, colors0, opa0 = jax.jit(project_stage)(model.params)
proj0 = jax.block_until_ready(proj0)

# 1. projection+SH alone (chained via params perturbation)
@jax.jit
def f_proj(params):
    proj, colors, o = project_stage(params)
    s = jnp.sum(proj.means2d) + jnp.sum(colors)
    return jax.tree.map(lambda x: x + s*1e-30, params)
timeit("project+SH fwd", f_proj, model.params)

# 2. tile_encode alone (chained)
@jax.jit
def f_encode(carry):
    m2d = proj0.means2d + carry*1e-30
    tl, cnt, _drop, _clamp, _raw = tile_encode(m2d, proj0.radii, proj0.depths,
                                  proj0.valid, W, H, TILE, CAP, EXPAND)
    return jnp.sum(tl).astype(jnp.float32)
timeit("tile_encode (sort+seg-gather)", f_encode, jnp.float32(0))

# precompute static tile lists + table for isolation
tl0, cnt0, _d0, _c0, _r0 = jax.jit(lambda: tile_encode(proj0.means2d, proj0.radii,
    proj0.depths, proj0.valid, W, H, TILE, CAP, EXPAND))()
tl0 = jax.block_until_ready(tl0)
print("  entries: mean count/tile=", float(jnp.mean(cnt0)),
      " p99=", float(jnp.percentile(cnt0.astype(jnp.float32), 99)),
      " max=", float(jnp.max(cnt0)), " capped_frac=",
      float(jnp.mean((cnt0 >= CAP).astype(jnp.float32))))

pad = lambda x: jnp.concatenate([x, jnp.zeros((1,)+x.shape[1:], x.dtype)])
M_p = jnp.concatenate([proj0.M, jnp.eye(3)[None]], 0)
coeffs0 = jax.jit(splat_coeffs)(pad(proj0.means2d), M_p,
    pad(jnp.where(proj0.valid, opa0, 0.0)), jnp.zeros((n+1,2)))
feats0 = pad(jnp.concatenate([colors0, proj0.normals], -1))
table0 = jnp.concatenate([coeffs0, feats0], -1)
table24_0 = jnp.concatenate([table0, jnp.zeros((n+1, R.F_ROWS-table0.shape[-1]))], -1)
table24_0 = jax.block_until_ready(table24_0)

# 3. gather+transpose (entry assembly)
@jax.jit
def f_gather(carry):
    t = table24_0 + carry*1e-30
    ent = jnp.swapaxes(t[tl0.reshape(-1)].reshape(num_tiles, CAP, R.F_ROWS), -1, -2)
    return jnp.sum(ent)
timeit("entry gather+transpose", f_gather, jnp.float32(0))

# 3b. gather only (no transpose)
@jax.jit
def f_gather_only(carry):
    t = table24_0 + carry*1e-30
    ent = t[tl0.reshape(-1)]
    return jnp.sum(ent)
timeit("entry gather only", f_gather_only, jnp.float32(0))

ent0 = jax.jit(lambda: jnp.swapaxes(
    table24_0[tl0.reshape(-1)].reshape(num_tiles, CAP, R.F_ROWS), -1, -2))()
ent0 = jax.block_until_ready(ent0)

# 4. composite fwd kernel alone
@jax.jit
def f_comp(carry):
    e = ent0 + carry*1e-30
    out, wm = R._composite_fwd_pallas(e, tiles_x, TILE)
    return jnp.sum(out) + jnp.sum(wm)
timeit("composite fwd kernel", f_comp, jnp.float32(0))

# 5. composite bwd kernel alone
go0 = jnp.ones((num_tiles, R.O_ROWS, TILE*TILE), jnp.float32)
gw0 = jnp.ones((num_tiles, 8, CAP), jnp.float32)
@jax.jit
def f_bwd(carry):
    e = ent0 + carry*1e-30
    d = R._composite_bwd_pallas(e, go0, gw0, tiles_x, TILE)
    return jnp.sum(d)
timeit("composite bwd kernel", f_bwd, jnp.float32(0))

# 6. d_entries -> d_table scatter (the gather transpose)
dent0 = jnp.ones((num_tiles*CAP, R.F_ROWS), jnp.float32)
@jax.jit
def f_scatter(carry):
    d = dent0 + carry*1e-30
    out = jnp.zeros((n+1, R.F_ROWS), jnp.float32).at[tl0.reshape(-1)].add(d)
    return jnp.sum(out)
timeit("d_table scatter-add (T*cap rows)", f_scatter, jnp.float32(0))

# 7. full fwd
@jax.jit
def f_full_fwd(params):
    m = SplatModel(params=params, anchors=model.anchors, alive=model.alive)
    out = render_splats(m, pose, K, settings, training=True)
    s = jnp.sum(out["color"]) + jnp.sum(out["depth"])
    return jax.tree.map(lambda x: x + s*1e-30, params)
timeit("FULL forward", f_full_fwd, model.params)

# 8. full fwd+bwd
def loss_fn(params):
    m = SplatModel(params=params, anchors=model.anchors, alive=model.alive)
    out = render_splats(m, pose, K, settings, training=True)
    return jnp.mean(jnp.abs(out["color"] - target)) + 0.01*jnp.mean(out["depth"])
gradf = jax.grad(loss_fn)
@jax.jit
def f_step(params):
    g = gradf(params)
    return jax.tree.map(lambda p, gg: p + gg*1e-30, params, g)
timeit("FULL fwd+bwd", f_step, model.params)
print("done")
