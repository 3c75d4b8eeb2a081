"""Chip sweep: real-Mosaic parity of the v2 composite kernels, then timing
sweeps at the bench operating point (131k splats, 1200x680).

Run from the repo root on the real TPU (`python - < scripts/profile/
chip_sweep.py` — see CLAUDE.md for the axon gotchas). Sections:

  1. v1-vs-v2 kernel parity on real Mosaic (small scene, fwd + analytic bwd)
  2. full train-step timing: v1 baseline, then v2 x TILES_PER_STEP sweep
  3. encode budget sweep: tile_cap x tile_expand_small with drop/clamp fracs
  4. eval-render forward (need_vis gating) vs training forward

All timings are CHAINED (output feeds next input) per the repo measurement
protocol — unchained repeats report ~0 ms through the axon path.
"""
import os
import time

import jax
import jax.numpy as jnp
import numpy as np

import gssdf_tpu.ops.pallas.raster as R
import gssdf_tpu.ops.pallas.raster_v2 as R2
from gssdf_tpu.gs.projection import project_2dgs
from gssdf_tpu.gs.rasterize_jax import splat_coeffs
from gssdf_tpu.gs.rasterize_tiled import tile_encode

# --- 1. small-scene parity on REAL Mosaic ---
W, H = 256, 128
K = jnp.array([[200.0, 0, W / 2], [0, 200.0, H / 2], [0, 0, 1]])
key = jax.random.PRNGKey(7)
n = 60
k1, k2, k3 = jax.random.split(key, 3)
means = jnp.concatenate([
    jax.random.uniform(k1, (n, 2), minval=-0.3, maxval=0.3),
    jax.random.uniform(k2, (n, 1), minval=0.8, maxval=3.0)], -1)
quats = jax.random.normal(k3, (n, 4))
quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
scales = jnp.concatenate([jnp.full((n, 2), 0.06), jnp.full((n, 1), 1e-6)], -1)
opac = jnp.full((n,), 0.8)
colors = jax.random.uniform(key, (n, 3))
p = project_2dgs(means, quats, scales, jnp.eye(4), K, W, H, 0.01, 100.0)
tiles_x = -(-W // 16)
tl, _, _, _, _ = tile_encode(p.means2d, p.radii, p.depths, p.valid, W, H,
                          16, 128, 32)
pad = lambda x: jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)])
M_p = jnp.concatenate([p.M, jnp.eye(3)[None]], axis=0)
coeffs = splat_coeffs(pad(p.means2d), M_p, pad(jnp.where(p.valid, opac, 0.0)),
                      jnp.zeros((n + 1, 2)))
feats = pad(jnp.concatenate([colors, p.normals], -1))
table = jnp.concatenate([coeffs, feats], -1)
table24 = jnp.concatenate(
    [table, jnp.zeros((n + 1, R.F_ROWS - table.shape[-1]))], -1)
ent = jnp.swapaxes(table24[tl.reshape(-1)].reshape(tl.shape[0], 128, R.F_ROWS),
                   -1, -2)

for kt in (1, 4):
    R2.TILES_PER_STEP = kt
    out_p, wm_p = jax.jit(
        lambda e: R2._composite_fwd_pallas(e, tiles_x, 16))(ent)
    out_t, wm_t = jax.jit(
        lambda e: R.composite_fwd_reference(e, tiles_x, 16))(ent)
    err_out = float(jnp.max(jnp.abs(out_p[:, :10] - out_t[:, :10])))
    err_wm = float(jnp.max(jnp.abs(wm_p[:, 0] - wm_t[:, 0])))
    go = jax.random.normal(key, out_p.shape) * 1e-3
    gw = jax.random.normal(key, wm_p.shape) * 1e-3
    d_p = jax.jit(lambda: R2._composite_bwd_pallas(
        ent, out_p, wm_p, go, gw, tiles_x, 16))()
    d_t = jax.jit(lambda: R.composite_bwd_reference(
        ent, out_t, wm_t, go, gw, tiles_x, 16))()
    err_b = float(jnp.max(jnp.abs(d_p - d_t)))
    print(f"kt={kt} parity: out {err_out:.2e} wm {err_wm:.2e} bwd {err_b:.2e}")
    assert err_out < 5e-3 and err_wm < 2e-5 and err_b < 5e-3
print("KERNEL PARITY OK ON CHIP")

# --- bench-point scene ---
from gssdf_tpu.gs.model import SplatModel, build_splat_model
from gssdf_tpu.gs.render import RenderSettings, render_splats
from gssdf_tpu.sensors.cameras import Camera
from gssdf_tpu.utils.math import logit

W, H, N = 1200, 680, 131072
k1, k2, k3, k4 = jax.random.split(jax.random.PRNGKey(0), 4)
anchors = jnp.concatenate([
    jax.random.uniform(k1, (N, 2), minval=-2.0, maxval=2.0),
    jax.random.uniform(k2, (N, 1), minval=1.0, maxval=8.0)], -1)
quats = jax.random.normal(k3, (N, 4))
model = build_splat_model(
    k4, anchors, jnp.full((N, 3), np.log(0.01)),
    quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
    jnp.full((N,), logit(0.7)), 0, N)
cam = Camera(fx=600.0, fy=600.0, cx=W / 2, cy=H / 2, width=W, height=H)
pose = jnp.eye(4, dtype=jnp.float32)
Km = jnp.asarray(cam.K, jnp.float32)
target = jnp.zeros((H, W, 3))


def settings_for(cap, small):
    return RenderSettings(width=W, height=H, tile_cap=cap, tile_expand=32,
                          tile_expand_small=small, tile_batch=16)


def loss_fn(params, settings, training=True):
    m = SplatModel(params=params, anchors=model.anchors, alive=model.alive)
    out = render_splats(m, pose, Km, settings, training=training)
    return (jnp.mean(jnp.abs(out["color"] - target))
            + 0.01 * jnp.mean(out["depth"]))


def chain(fn, state, iters=20, name=""):
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:48s} {dt:8.2f} ms  ({N / dt * 1e3 / 1e6:.2f}M splats/s)")
    return dt


def make_step(settings):
    return jax.jit(lambda p: jax.tree.map(
        lambda x, g: x - 1e-12 * g, p,
        jax.grad(lambda q: loss_fn(q, settings))(p)))


def make_fwd(settings, training=True):
    return jax.jit(lambda p: jax.tree.map(
        lambda x: x + 1e-30 * loss_fn(p, settings, training), p))


base = settings_for(256, 8)
params0 = jax.tree.map(jnp.array, model.params)

# --- 2. v1 baseline then v2 x TILES_PER_STEP ---
os.environ.pop("GSSDF_RASTER_V2", None)
chain(make_step(base), params0, 20, "fwd+bwd v1 baseline cap256/sm8")
chain(make_fwd(base), params0, 20, "fwd only v1 baseline")

os.environ["GSSDF_RASTER_V2"] = "1"
for kt in (1, 2, 4, 8):
    R2.TILES_PER_STEP = kt
    chain(make_step(base), params0, 20, f"fwd+bwd v2 kt={kt}")
    chain(make_fwd(base), params0, 20, f"fwd only v2 kt={kt}")
os.environ.pop("GSSDF_RASTER_V2", None)

# --- 3. encode budget sweep (v1 kernels): cap x expand_small ---
for cap in (128, 256):
    for small in (4, 8, 16):
        s = settings_for(cap, small)
        # telemetry at this budget
        m0 = SplatModel(params=params0, anchors=model.anchors,
                        alive=model.alive)
        out = jax.jit(lambda: render_splats(m0, pose, Km, s))()
        print(f"  cap={cap} small={small}: drop_frac="
              f"{float(out['drop_frac']):.4f} clamp_frac="
              f"{float(out['clamp_frac']):.4f}")
        chain(make_step(s), params0, 20, f"fwd+bwd v1 cap={cap} small={small}")

# --- 4. eval-render forward: need_vis gating ---
chain(make_fwd(base, training=True), params0, 20, "fwd training=True (vis)")
chain(make_fwd(base, training=False), params0, 20, "fwd training=False (no vis)")

# --- 5. segsum-VJP variants at rasterizer width (825k rows x 24 feats) ---
# The gather-VJP (d_entries -> d_table) currently perm-sorts the keys and
# row-gathers the 24-wide values; time that against a multi-operand sort
# and against the raw pieces to see where the ~8 ms actually goes.
from gssdf_tpu.ops.pallas.segsum import sorted_segment_sum_pallas

RK = jax.random.PRNGKey(3)
n_rows, n_slots, featw = 825_600, N + 1, 24
keys = jax.random.randint(RK, (n_rows,), 0, n_slots, jnp.int32)
vals = jax.random.normal(RK, (n_rows, featw), jnp.float32)


def t_it(fn, x, iters=10, name=""):
    y = fn(x)
    jax.block_until_ready(y)
    t0 = time.perf_counter()
    for _ in range(iters):
        # chain through a data-dependent scalar (outputs differ in shape)
        x = x + y.ravel()[0] * 1e-30
        y = fn(x)
    jax.block_until_ready(y)
    print(f"{name:48s} {(time.perf_counter()-t0)/iters*1e3:8.2f} ms")


def v_permsort(v):
    sk, perm = jax.lax.sort(
        (keys, jnp.arange(n_rows, dtype=jnp.int32)), num_keys=1)
    sv = jnp.take(v, perm, axis=0)
    return sorted_segment_sum_pallas(sk, sv.T, n_slots,
                                     block_slots=1024, chunk=2048, r_width=16)


def v_multiop(v):
    ops = (keys,) + tuple(v[:, i] for i in range(featw))
    sk, *sv = jax.lax.sort(ops, num_keys=1)
    return sorted_segment_sum_pallas(sk, jnp.stack(sv, 0), n_slots,
                                     block_slots=1024, chunk=2048, r_width=16)


def v_sortonly(v):
    sk, perm = jax.lax.sort(
        (keys + (v[0, 0] * 1e-30).astype(jnp.int32),
         jnp.arange(n_rows, dtype=jnp.int32)), num_keys=1)
    return sk + perm


def v_takeonly(v):
    return jnp.take(v, jnp.arange(n_rows - 1, -1, -1), axis=0)


t_it(jax.jit(v_permsort), vals, 10, "segsum-vjp permsort+take (current)")
t_it(jax.jit(v_multiop), vals, 10, "segsum-vjp multi-operand sort")
t_it(jax.jit(v_sortonly), vals, 10, "  isolated: 2-op sort 825k")
t_it(jax.jit(v_takeonly), vals, 10, "  isolated: row take 825k x 24")
print("CHIP SWEEP DONE")
