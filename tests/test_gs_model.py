"""Splat store, slot allocation, densification, and refine-op tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssdf_tpu.gs.model import (
    DensifyState,
    RefineSpec,
    SplatModel,
    SplatParams,
    _alloc_slots,
    build_splat_model,
    densify_state_init,
    generate_gaussian,
    init_scales_from_knn,
    prune_invisible,
    refine_splats,
    reset_opacity,
    sky_sphere_splats,
    update_densify_state,
)
from gssdf_tpu.ops.knn import knn_mean_sq_dist
from gssdf_tpu.utils.math import logit


def _toy_model(n=6, capacity=16, seed=0):
    key = jax.random.PRNGKey(seed)
    anchors = jax.random.uniform(key, (n, 3), minval=-1.0, maxval=1.0)
    scales = jnp.full((n, 3), np.log(0.02), jnp.float32)
    quats = jnp.tile(jnp.array([[1.0, 0, 0, 0]], jnp.float32), (n, 1))
    opa = jnp.full((n,), logit(0.6), jnp.float32)
    return build_splat_model(key, anchors, scales, quats, opa, 0, capacity)


def test_build_and_generate():
    m = _toy_model(n=6, capacity=16)
    assert int(jnp.sum(m.alive)) == 6
    xyz, quats, scales, opa, sh = generate_gaussian(m)
    assert xyz.shape == (16, 3)
    np.testing.assert_allclose(np.asarray(opa[:6]), 0.6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(opa[6:]), 0.0)
    assert sh.shape == (16, 1, 3)


def test_alloc_slots():
    free = jnp.array([False, True, False, True, True, False])
    want = jnp.array([True, False, True, False, False, True])
    prio = jnp.array([1.0, 0.0, 3.0, 0.0, 0.0, 2.0])
    dest, ok = _alloc_slots(free, want, prio)
    dest = np.asarray(dest)
    # highest priority (idx 2) -> first free slot 1; idx 5 -> 3; idx 0 -> 4
    assert dest[2] == 1 and dest[5] == 3 and dest[0] == 4
    assert np.asarray(ok).sum() == 3
    # non-wanted rows get sentinel
    assert dest[1] == 6 and dest[3] == 6


def test_alloc_slots_insufficient_free():
    free = jnp.array([False, True, False, False])
    want = jnp.array([True, False, True, True])
    prio = jnp.array([1.0, 0.0, 3.0, 2.0])
    dest, ok = _alloc_slots(free, want, prio)
    # only the highest-priority want (idx 2) gets the single free slot
    assert np.asarray(dest)[2] == 1
    assert np.asarray(ok).tolist() == [False, False, True, False]


def _zero_moments(params):
    return jax.tree_util.tree_map(jnp.zeros_like, params)


def test_refine_duplicates_small_high_grad():
    m = _toy_model(n=4, capacity=12)
    c = 12
    state = densify_state_init(c)
    # splat 1: high grad, small scale -> duplicate
    state = state._replace(
        grad2d=jnp.zeros(c).at[1].set(10.0), count=jnp.ones(c)
    )
    spec = RefineSpec(grow_grad2d=0.1, grow_scale3d=0.05, spatial_scale=1.0)
    mu = _zero_moments(m.params)._replace(opacity=jnp.ones(c))
    nu = _zero_moments(m.params)
    m2, s2, mu2, nu2, info = refine_splats(
        m, state, mu, nu, jax.random.PRNGKey(0), spec,
        jnp.int32(100), 3000, False,
    )
    assert int(info["n_dup"]) == 1 and int(info["n_split"]) == 0
    assert int(jnp.sum(m2.alive)) == 5
    # the duplicate landed in slot 4 (first free) as a copy of row 1
    np.testing.assert_allclose(np.asarray(m2.anchors[4]), np.asarray(m.anchors[1]))
    np.testing.assert_allclose(
        np.asarray(m2.params.opacity[4]), np.asarray(m.params.opacity[1])
    )
    # new row's Adam moments zeroed; survivors keep theirs
    assert float(mu2.opacity[4]) == 0.0
    assert float(mu2.opacity[0]) == 1.0
    # densify state reset
    assert float(jnp.sum(s2.grad2d)) == 0.0


def test_refine_splits_large_high_grad():
    m = _toy_model(n=4, capacity=12)
    # make splat 2 large
    scaling = m.params.scaling.at[2].set(jnp.log(0.2))
    m = m._replace(params=m.params._replace(scaling=scaling))
    c = 12
    state = densify_state_init(c)._replace(
        grad2d=jnp.zeros(c).at[2].set(10.0), count=jnp.ones(c)
    )
    spec = RefineSpec(
        grow_grad2d=0.1, grow_scale3d=0.05, spatial_scale=1.0,
        prune_scale3d=100.0,
    )
    mu = _zero_moments(m.params)._replace(scaling=jnp.ones((c, 3)))
    nu = _zero_moments(m.params)
    m2, s2, mu2, nu2, info = refine_splats(
        m, state, mu, nu, jax.random.PRNGKey(1), spec,
        jnp.int32(100), 3000, False,
    )
    assert int(info["n_split"]) == 1
    assert int(jnp.sum(m2.alive)) == 5
    # both children have scale = parent/1.6 in the first two axes
    child_scale = np.exp(np.asarray(m2.params.scaling[2, :2]))
    np.testing.assert_allclose(child_scale, 0.2 / 1.6, rtol=1e-5)
    child2_scale = np.exp(np.asarray(m2.params.scaling[4, :2]))
    np.testing.assert_allclose(child2_scale, 0.2 / 1.6, rtol=1e-5)
    # parent slot moments were reset (split semantics)
    assert float(jnp.sum(jnp.abs(mu2.scaling[2]))) == 0.0
    assert float(jnp.sum(jnp.abs(mu2.scaling[0]))) > 0.0


def test_refine_scale2d_splits_big_screen_radius():
    """splatfacto screen-size split (neural_gaussian.cpp:705-707): a splat
    whose tracked max screen radius exceeds grow_scale2d is split while
    iter < refine_scale2d_stop_iter, and NOT after (dynamic gate)."""
    c = 12
    spec = RefineSpec(
        grow_grad2d=1e9, grow_scale3d=0.05, spatial_scale=1.0,
        prune_scale3d=100.0, refine_scale2d_stop_iter=1000,
    )
    for it, want_split in ((jnp.int32(100), 1), (jnp.int32(2000), 0)):
        m = _toy_model(n=4, capacity=c)
        state = densify_state_init(c)._replace(
            radii=jnp.zeros(c).at[2].set(0.3), count=jnp.ones(c)
        )
        mu = _zero_moments(m.params)
        nu = _zero_moments(m.params)
        m2, s2, *_, info = refine_splats(
            m, state, mu, nu, jax.random.PRNGKey(2), spec,
            it, 3000, True,
        )
        assert int(info["n_split"]) == want_split, int(it)


def test_refine_grow_gate_suppresses_grad_growth():
    """Renderer-aware densify gate (DIAGNOSIS_r04 addendum 2):
    grow_ok=False kills grad-driven duplicate/split but leaves the
    scale2d window-honesty split and the prunes active."""
    c = 12
    spec = RefineSpec(
        grow_grad2d=0.1, grow_scale3d=0.05, spatial_scale=1.0,
        prune_scale3d=100.0, refine_scale2d_stop_iter=1000,
    )
    m = _toy_model(n=4, capacity=c)
    state = densify_state_init(c)._replace(
        grad2d=jnp.zeros(c).at[1].set(10.0),   # would duplicate splat 1
        radii=jnp.zeros(c).at[2].set(0.3),     # scale2d-splits splat 2
        count=jnp.ones(c),
    )
    mu = _zero_moments(m.params)
    nu = _zero_moments(m.params)
    m2, *_, info = refine_splats(
        m, state, mu, nu, jax.random.PRNGKey(3), spec,
        jnp.int32(100), 3000, True, grow_ok=jnp.bool_(False),
    )
    assert int(info["n_dup"]) == 0                 # gated
    assert int(info["n_split"]) == 1               # scale2d split survives
    # and with the gate open the duplicate happens
    m3, *_, info3 = refine_splats(
        m, state, mu, nu, jax.random.PRNGKey(3), spec,
        jnp.int32(100), 3000, True, grow_ok=jnp.bool_(True),
    )
    assert int(info3["n_dup"]) == 1


def test_refine_prunes_low_opacity():
    m = _toy_model(n=4, capacity=8)
    opa = m.params.opacity.at[3].set(logit(0.01))
    m = m._replace(params=m.params._replace(opacity=opa))
    c = 8
    state = densify_state_init(c)._replace(count=jnp.ones(c))
    spec = RefineSpec(prune_opa=0.05)
    mu = _zero_moments(m.params)
    nu = _zero_moments(m.params)
    m2, _, _, _, info = refine_splats(
        m, state, mu, nu, jax.random.PRNGKey(0), spec,
        jnp.int32(100), 3000, False,
    )
    assert int(info["n_prune"]) == 1
    assert not bool(m2.alive[3])
    assert int(jnp.sum(m2.alive)) == 3


def test_prune_invisible_and_reset_opacity():
    m = _toy_model(n=4, capacity=8)
    state = densify_state_init(8)._replace(
        vis=jnp.zeros(8).at[:4].set(jnp.array([0.5, 0.0, 0.2, 0.0])),
        seen=jnp.zeros(8).at[:4].set(1.0),
    )
    mu = _zero_moments(m.params)
    nu = _zero_moments(m.params)
    m2, s2, mu2, nu2, n = prune_invisible(m, state, mu, nu)
    assert int(n) == 2
    assert np.asarray(m2.alive[:4]).tolist() == [True, False, True, False]
    assert float(jnp.sum(s2.vis)) == 0.0

    m3, mu3, nu3 = reset_opacity(m2, mu2, nu2, prune_opa=0.05)
    sig = jax.nn.sigmoid(m3.params.opacity)
    assert float(jnp.max(sig)) <= 0.1 + 1e-5


def test_update_densify_state():
    s = densify_state_init(4)
    g = jnp.array([[0.01, 0.0], [0.0, 0.02], [0.0, 0.0], [1.0, 1.0]])
    radii = jnp.array([5.0, 3.0, 0.0, 9.0])
    vis = jnp.array([0.5, 0.1, 0.0, 0.9])
    visible = jnp.array([True, True, False, False])
    s2 = update_densify_state(s, g, radii, vis, visible, 100, 80)
    np.testing.assert_allclose(float(s2.grad2d[0]), 0.01 * 50.0, rtol=1e-6)
    np.testing.assert_allclose(float(s2.grad2d[1]), 0.02 * 40.0, rtol=1e-6)
    assert float(s2.grad2d[3]) == 0.0  # not visible -> not accumulated
    assert np.asarray(s2.count).tolist() == [1.0, 1.0, 0.0, 0.0]
    np.testing.assert_allclose(float(s2.radii[0]), 5.0 / 100.0)


def test_knn_matches_bruteforce():
    key = jax.random.PRNGKey(0)
    pts = jax.random.uniform(key, (200, 3))
    approx = np.asarray(knn_mean_sq_dist(pts, k=3, window=32))
    p = np.asarray(pts)
    d2 = ((p[:, None, :] - p[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    exact = np.sort(d2, axis=1)[:, :3].mean(1)
    # Morton-window KNN is approximate; demand 90% within 2x
    ratio = approx / exact
    assert np.mean((ratio < 2.0) & (ratio >= 1.0 - 1e-6)) > 0.9
    scales = init_scales_from_knn(pts)
    assert scales.shape == (200, 3)
    assert np.isfinite(np.asarray(scales)).all()


def test_sky_sphere():
    sky = sky_sphere_splats(jax.random.PRNGKey(0), np.zeros(3), 10.0, 2.0)
    r = np.linalg.norm(np.asarray(sky["anchors"]), axis=-1)
    np.testing.assert_allclose(r, 6.0, rtol=1e-4)
    assert sky["anchors"].shape[0] == 2000
    assert np.isfinite(np.asarray(sky["quats"])).all()
    # opacity starts ~1
    assert float(jax.nn.sigmoid(sky["opacity_logit"]).min()) > 0.99


def test_gate_scale2d_counts_splits_against_gate():
    """gate_scale2d (round-5 evidence, RESULTS_r05): with it set, a
    closed gate suppresses the scale2d screen-size split too; default
    keeps the split alive (window honesty)."""
    c = 12
    base = dict(
        grow_grad2d=0.1, grow_scale3d=0.05, spatial_scale=1.0,
        prune_scale3d=100.0, refine_scale2d_stop_iter=1000,
    )
    m = _toy_model(n=4, capacity=c)
    state = densify_state_init(c)._replace(
        radii=jnp.zeros(c).at[2].set(0.3), count=jnp.ones(c)
    )
    mu = _zero_moments(m.params)
    nu = _zero_moments(m.params)
    for gate_s2d, want in ((True, 0), (False, 1)):
        spec = RefineSpec(**base, gate_scale2d=gate_s2d)
        *_, info = refine_splats(
            m, state, mu, nu, jax.random.PRNGKey(3), spec,
            jnp.int32(100), 3000, True, grow_ok=jnp.bool_(False),
        )
        assert int(info["n_split"]) == want, (gate_s2d, info)
