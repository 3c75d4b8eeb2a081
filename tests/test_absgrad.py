"""absgrad densify variant (k_use_absgrad, neural_gaussian.cpp:215-217,
629-630): per-tile-entry |screen grad| accumulation via the rasterizer's
``entry_pix_delta`` tap.

Invariants tested:
  1. The entry-level fold is EXACT chain-rule-compatible with splat_coeffs'
     pix_delta fold: summing the SIGNED per-entry gradients per splat
     reproduces d(loss)/d(pix_delta).
  2. absgrad (sum of |per-entry grad|) dominates the signed norm
     (triangle inequality) and differs where tile gradients oppose.
  3. A GS train step with spec.use_absgrad runs and accumulates
     non-negative grad2d; the b=1 multicam step matches it.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssdf_tpu.gs.projection import project_2dgs
from gssdf_tpu.gs.rasterize_tiled import rasterize_tiled
from gssdf_tpu.ops.pallas.segsum import segment_sum

W, H = 64, 48
K = jnp.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], jnp.float32)
EYE4 = jnp.eye(4, dtype=jnp.float32)
CAP = 64


def _scene(n=60, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [
            jax.random.uniform(k1, (n, 2), minval=-0.25, maxval=0.25),
            jax.random.uniform(k2, (n, 1), minval=0.6, maxval=3.0),
        ],
        axis=-1,
    )
    quats = jax.random.normal(k3, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    scales = jnp.concatenate(
        [
            jax.random.uniform(k4, (n, 2), minval=0.02, maxval=0.08),
            jnp.full((n, 1), 1e-6),
        ],
        axis=-1,
    )
    opac = jax.random.uniform(k5, (n,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 3))
    return means, quats, scales, opac, colors


def _grads(n=60, seed=0):
    means, quats, scales, opac, colors = _scene(n, seed)
    proj = project_2dgs(means, quats, scales, EYE4, K, W, H, 0.01, 100.0)
    tgt = jax.random.uniform(jax.random.PRNGKey(7), (H, W, 3))
    ntl = (-(-W // 16)) * (-(-H // 16))

    def loss(pix_delta, entry_pd):
        out = rasterize_tiled(
            proj.means2d, proj.M, proj.depths, proj.normals, colors,
            opac, proj.valid, proj.radii, W, H,
            tile_cap=CAP, tile_expand=32, tile_expand_small=8,
            pix_delta=pix_delta, entry_pix_delta=entry_pd,
        )
        return (jnp.mean(jnp.abs(out["color"] - tgt))
                + 0.05 * jnp.mean(out["depth"] ** 2))

    pd0 = jnp.zeros((n, 2), jnp.float32)
    epd0 = jnp.zeros((ntl, CAP, 2), jnp.float32)
    g_pd, g_epd = jax.grad(loss, argnums=(0, 1))(pd0, epd0)
    out = rasterize_tiled(
        proj.means2d, proj.M, proj.depths, proj.normals, colors,
        opac, proj.valid, proj.radii, W, H,
        tile_cap=CAP, tile_expand=32, tile_expand_small=8,
        pix_delta=pd0, entry_pix_delta=epd0,
    )
    return n, g_pd, g_epd, out["tile_lists"]


def test_signed_entry_grads_sum_to_pix_delta_grad():
    n, g_pd, g_epd, tl = _grads()
    signed = segment_sum(tl.reshape(-1), g_epd.reshape(-1, 2), n + 1)[:n]
    np.testing.assert_allclose(
        np.asarray(signed), np.asarray(g_pd), rtol=1e-4, atol=1e-7
    )


def test_pallas_branch_fold_matches_xla_branch():
    """The lane-major entry fold (pallas branch) must agree with the
    row-major one (xla branch) — run via interpreter-mode kernels."""
    from gssdf_tpu.ops.pallas import raster as R

    means, quats, scales, opac, colors = _scene(48, 1)
    proj = project_2dgs(means, quats, scales, EYE4, K, W, H, 0.01, 100.0)
    ntl = (-(-W // 16)) * (-(-H // 16))
    key = jax.random.PRNGKey(11)
    epd = 0.3 * jax.random.normal(key, (ntl, 128, 2))
    tgt = jax.random.uniform(jax.random.PRNGKey(7), (H, W, 3))

    def loss(impl):
        def f(entry_pd):
            out = rasterize_tiled(
                proj.means2d, proj.M, proj.depths, proj.normals, colors,
                opac, proj.valid, proj.radii, W, H,
                tile_cap=128, tile_expand=32, tile_expand_small=8,
                entry_pix_delta=entry_pd, impl=impl)
            return (jnp.mean(jnp.abs(out["color"] - tgt)),
                    out["color"])
        return f

    lx, cx = loss("xla")(epd)
    R._INTERPRET = True
    try:
        lp, cp = loss("pallas")(epd)
    finally:
        R._INTERPRET = False
    np.testing.assert_allclose(np.asarray(cp), np.asarray(cx), atol=2e-4)
    gx = jax.grad(lambda e: loss("xla")(e)[0])(epd)
    R._INTERPRET = True
    try:
        gp = jax.grad(lambda e: loss("pallas")(e)[0])(epd)
    finally:
        R._INTERPRET = False
    np.testing.assert_allclose(np.asarray(gp), np.asarray(gx), atol=2e-4)


def test_absgrad_dominates_signed_norm():
    n, g_pd, g_epd, tl = _grads()
    absg = segment_sum(
        tl.reshape(-1), jnp.abs(g_epd).reshape(-1, 2), n + 1
    )[:n]
    assert np.all(np.asarray(absg) >= 0)
    # per-component triangle inequality: sum|g_e| >= |sum g_e| (up to f32
    # accumulation noise, relative on the component magnitude)
    gpd = np.abs(np.asarray(g_pd))
    assert np.all(np.asarray(absg) >= gpd - (1e-6 + 1e-6 * gpd))
    # multi-tile splats with opposing tile gradients make it strict
    assert float(jnp.sum(absg)) > float(jnp.sum(jnp.abs(g_pd))) + 1e-3


def _mini_spec(use_absgrad):
    from gssdf_tpu.gs.render import RenderSettings
    from gssdf_tpu.train.gs import GSTrainSpec, RefineSpec
    from gssdf_tpu.train.sdf import SDFTrainSpec
    from gssdf_tpu.fields.sdf_field import SDFFieldSpec

    from gssdf_tpu.fields.hashgrid import HashGridSpec

    field = SDFFieldSpec(
        grid=HashGridSpec(n_levels=2, log2_hashmap_size=10,
                          base_resolution=4),
        hidden_dim=16, geo_num_layer=1,
    )
    return GSTrainSpec(
        sdf=SDFTrainSpec(field=field, batch_rays=32, point_budget=256,
                         max_hits=2, max_steps=32),
        render=RenderSettings(width=W, height=H, tile_cap=CAP,
                              tile_expand=16, tile_expand_small=0),
        refine=RefineSpec(),
        gs_sdf_reg=False,
        use_absgrad=use_absgrad,
    )


@pytest.mark.parametrize("multicam", [False, True])
def test_train_step_absgrad_populates_grad2d(multicam):
    from gssdf_tpu.fields.occupancy import build_occupancy_grid
    from gssdf_tpu.fields.sdf_field import MapGeometry, init_sdf_field
    from gssdf_tpu.gs.model import build_splat_model
    from gssdf_tpu.sensors.cameras import Camera
    from gssdf_tpu.train.gs import gs_state_init, make_gs_train_step
    from gssdf_tpu.utils.math import logit

    spec = _mini_spec(True)
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=8.0)
    pts = np.random.RandomState(0).uniform(-2, 2, (2000, 3)).astype(
        np.float32
    )
    grid = build_occupancy_grid(pts, geom, 64)
    cam = Camera(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2, width=W, height=H)

    n = 64
    key = jax.random.PRNGKey(3)
    means, quats, scales, opac, _ = _scene(n, seed=3)
    model = build_splat_model(
        key, means, jnp.log(scales), quats, logit(opac), 0, n
    )
    sdf_params = init_sdf_field(jax.random.PRNGKey(1), spec.sdf.field)
    state = gs_state_init(sdf_params, model)

    gt = jax.random.uniform(jax.random.PRNGKey(5), (H, W, 3))
    r = spec.sdf.batch_rays
    origin = jnp.zeros((r, 3))
    d = jax.random.normal(jax.random.PRNGKey(6), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    depth = jnp.full((r, 1), 2.0)

    if multicam:
        from gssdf_tpu.parallel.train import make_multicam_gs_train_step

        step = make_multicam_gs_train_step(spec, geom, grid, cam, None)
        state2, aux = step(
            state, gt[None], EYE4[None], origin, d, depth,
            jax.random.PRNGKey(9), 0.05, 1e-3, 1e-3, 0, False,
        )
    else:
        step = make_gs_train_step(spec, geom, grid, cam)
        state2, aux = step(
            state, gt, EYE4, origin, d, depth,
            jax.random.PRNGKey(9), 0.05, 1e-3, 1e-3, 0, False,
        )
    g2d = np.asarray(state2.dstate.grad2d)
    assert np.all(np.isfinite(g2d))
    assert np.all(g2d >= 0)
    assert g2d.max() > 0


def test_multicam_b1_absgrad_matches_single():
    """b=1 multicam absgrad step must be bit-compatible with the single
    step (the established multicam-vs-single parity rule)."""
    from gssdf_tpu.fields.occupancy import build_occupancy_grid
    from gssdf_tpu.fields.sdf_field import MapGeometry, init_sdf_field
    from gssdf_tpu.gs.model import build_splat_model
    from gssdf_tpu.sensors.cameras import Camera
    from gssdf_tpu.train.gs import gs_state_init, make_gs_train_step
    from gssdf_tpu.parallel.train import make_multicam_gs_train_step
    from gssdf_tpu.utils.math import logit

    spec = _mini_spec(True)
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=8.0)
    pts = np.random.RandomState(0).uniform(-2, 2, (2000, 3)).astype(
        np.float32
    )
    grid = build_occupancy_grid(pts, geom, 64)
    cam = Camera(fx=100.0, fy=100.0, cx=W / 2, cy=H / 2, width=W, height=H)

    n = 64
    means, quats, scales, opac, _ = _scene(n, seed=3)
    model = build_splat_model(
        jax.random.PRNGKey(3), means, jnp.log(scales), quats,
        logit(opac), 0, n
    )
    sdf_params = init_sdf_field(jax.random.PRNGKey(1), spec.sdf.field)
    state = gs_state_init(sdf_params, model)

    gt = jax.random.uniform(jax.random.PRNGKey(5), (H, W, 3))
    r = spec.sdf.batch_rays
    origin = jnp.zeros((r, 3))
    d = jax.random.normal(jax.random.PRNGKey(6), (r, 3))
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    depth = jnp.full((r, 1), 2.0)
    args = (origin, d, depth, jax.random.PRNGKey(9), 0.05, 1e-3, 1e-3,
            0, False)

    s1, _ = make_gs_train_step(spec, geom, grid, cam)(
        jax.tree.map(jnp.array, state), gt, EYE4, *args
    )
    sm, _ = make_multicam_gs_train_step(spec, geom, grid, cam, None)(
        jax.tree.map(jnp.array, state), gt[None], EYE4[None], *args
    )
    np.testing.assert_allclose(
        np.asarray(sm.dstate.grad2d), np.asarray(s1.dstate.grad2d),
        rtol=1e-5, atol=1e-8,
    )
