"""GS render-step stage profiling at the bench operating point (dev tool).

Times each stage with CHAINED iterations (CLAUDE.md measurement protocol):
tile_encode variants, entry gather fwd, gather-VJP accumulation variants,
composite fwd/bwd, and the full fwd+bwd step.

Run from the repo root: python -u scripts/profile_gs.py
"""

import sys
import time
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parents[1]))

import jax
import jax.numpy as jnp
import numpy as np

from gssdf_tpu.gs.model import SplatModel, build_splat_model
from gssdf_tpu.gs.render import RenderSettings, render_splats
from gssdf_tpu.gs.projection import project_2dgs
from gssdf_tpu.gs import rasterize_tiled as RT
from gssdf_tpu.gs.rasterize_jax import splat_coeffs
from gssdf_tpu.ops.pallas.raster import (
    F_ROWS, tile_composite, _composite_fwd_pallas, _composite_bwd_pallas,
)
from gssdf_tpu.ops.pallas import segsum as SS
from gssdf_tpu.sensors.cameras import Camera
from gssdf_tpu.utils.math import logit

W, H = 1200, 680
N = 131072
CAP = 256
EXPAND = 32
TILE = 16
TX, TY = -(-W // TILE), -(-H // TILE)
NT = TX * TY


def chain(fn, state, iters=20, name=""):
    state = fn(state)
    jax.block_until_ready(state)
    t0 = time.perf_counter()
    for _ in range(iters):
        state = fn(state)
    jax.block_until_ready(state)
    dt = (time.perf_counter() - t0) / iters * 1e3
    print(f"{name:42s} {dt:8.2f} ms")
    return dt


def main():
    key = jax.random.PRNGKey(0)
    k1, k2, k3, k4 = jax.random.split(key, 4)
    anchors = jnp.concatenate(
        [
            jax.random.uniform(k1, (N, 2), minval=-2.0, maxval=2.0),
            jax.random.uniform(k2, (N, 1), minval=1.0, maxval=8.0),
        ],
        -1,
    )
    quats = jax.random.normal(k3, (N, 4))
    model = build_splat_model(
        k4, anchors, jnp.full((N, 3), np.log(0.01)),
        quats / jnp.linalg.norm(quats, axis=-1, keepdims=True),
        jnp.full((N,), logit(0.7)), 0, N,
    )
    cam = Camera(fx=600.0, fy=600.0, cx=W / 2, cy=H / 2, width=W, height=H)
    pose = jnp.eye(4, dtype=jnp.float32)
    Km = jnp.asarray(cam.K, jnp.float32)
    target = jnp.zeros((H, W, 3))

    # ---- full step (both encode modes) ----
    for small in (0, 8):
        settings = RenderSettings(
            width=W, height=H, tile_cap=CAP, tile_expand=EXPAND,
            tile_expand_small=small, tile_batch=16,
        )

        def loss_fn(params):
            m = SplatModel(params=params, anchors=model.anchors,
                           alive=model.alive)
            out = render_splats(m, pose, Km, settings, training=True)
            return (jnp.mean(jnp.abs(out["color"] - target))
                    + 0.01 * jnp.mean(out["depth"]))

        grad_fn = jax.jit(
            lambda p: jax.tree.map(
                lambda x, g: x - 1e-12 * g, p, jax.grad(loss_fn)(p)
            )
        )
        chain(grad_fn, model.params, 20, f"full fwd+bwd (small={small})")

        fwd = jax.jit(
            lambda p: jax.tree.map(
                lambda x: x + 1e-30 * loss_fn(p), p
            )
        )
        chain(fwd, model.params, 20, f"full fwd (small={small})")

    # ---- stage timings ----
    from gssdf_tpu.gs.model import generate_gaussian
    xyz, q, s, opa, sh = generate_gaussian(model, True)
    proj = project_2dgs(xyz, q, s, jnp.eye(4), Km, W, H, 0.05, 300.0)

    means2d, radii, depths, valid = (
        proj.means2d, proj.radii, proj.depths, proj.valid & model.alive
    )

    def enc(small):
        def f(m2d):
            tl, _, df, cf, _raw = RT.tile_encode(
                m2d, radii, depths, valid, W, H, TILE, CAP, EXPAND, small
            )
            # chain: feed a data-dependent perturbation back
            return m2d + (df + cf + tl[0, 0] * 1e-30) * 1e-30
        return jax.jit(f)

    chain(enc(0), means2d, 20, "tile_encode single-bucket")
    chain(enc(8), means2d, 20, "tile_encode two-bucket(8, n/8)")

    tl, _, _, _ = jax.jit(
        lambda: RT.tile_encode(means2d, radii, depths, valid, W, H, TILE,
                               CAP, EXPAND, 8)
    )()
    idx = tl.reshape(-1)

    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((1,) + x.shape[1:], x.dtype)]
    )
    M_p = jnp.concatenate([proj.M, jnp.eye(3)[None]], axis=0)
    coeffs = splat_coeffs(
        pad(means2d), M_p, pad(jnp.where(valid, opa, 0.0)),
        jnp.zeros((N + 1, 2)),
    )
    feats = pad(jnp.concatenate([jnp.ones((N, 3)) * 0.5, proj.normals], -1))
    table = jnp.concatenate([coeffs, feats], axis=-1)
    table24 = jnp.concatenate(
        [table, jnp.zeros((N + 1, F_ROWS - table.shape[-1]))], axis=-1
    )

    # gather fwd
    g_f = jax.jit(lambda t: t + 1e-30 * t[idx].sum())
    chain(g_f, table24, 20, "entry gather fwd (XLA)")

    # gather VJP: XLA scatter vs segsum path
    ct = jax.random.normal(key, (NT * CAP, F_ROWS))

    def vjp_scatter(c):
        out = jnp.zeros((N + 1, F_ROWS)).at[idx].add(c)
        return c + 1e-30 * (out * out).sum()

    def vjp_segsum(c):
        out = SS.segment_sum(idx, c, N + 1)
        return c + 1e-30 * (out * out).sum()

    chain(jax.jit(vjp_scatter), ct, 10, "gather-VJP: XLA scatter-add")
    chain(jax.jit(vjp_segsum), ct, 10, "gather-VJP: sort+Pallas segsum")

    # composite kernels
    entries_t = jnp.swapaxes(
        table24[idx].reshape(NT, CAP, F_ROWS), -1, -2
    )

    def comp_f(e):
        out, wm = _composite_fwd_pallas(e, TX, TILE)
        return e + 1e-30 * (out[:, :10].sum() + wm[:, 0].sum())

    chain(jax.jit(comp_f), entries_t, 20, "composite fwd kernel")

    out_v, wm_v = jax.jit(
        lambda e: _composite_fwd_pallas(e, TX, TILE)
    )(entries_t)
    go = jax.random.normal(key, out_v.shape) * 1e-3
    gw = jax.random.normal(key, wm_v.shape) * 1e-3

    def comp_b(e):
        d = _composite_bwd_pallas(e, out_v, wm_v, go, gw, TX, TILE)
        return e + 1e-30 * d.sum()

    chain(jax.jit(comp_b), entries_t, 20, "composite bwd kernel")

    # projection + coeffs + SH assembly
    def proj_fn(x):
        p = project_2dgs(x, q, s, jnp.eye(4), Km, W, H, 0.05, 300.0)
        c = splat_coeffs(
            pad(p.means2d), jnp.concatenate([p.M, jnp.eye(3)[None]], 0),
            pad(jnp.where(p.valid, opa, 0.0)), jnp.zeros((N + 1, 2)),
        )
        return x + 1e-30 * (c.sum() + p.radii.sum())

    chain(jax.jit(proj_fn), xyz, 20, "project + splat_coeffs fwd")

    # vis scatter-max
    wm_flat = wm_v[:, 0, :].reshape(-1)

    def vis_fn(wf):
        v = jnp.zeros((N + 1,)).at[idx].max(wf, mode="drop")
        return wf + 1e-30 * (v * v).sum()

    chain(jax.jit(vis_fn), wm_flat, 20, "vis scatter-max fwd")


if __name__ == "__main__":
    main()
