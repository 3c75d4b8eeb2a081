"""Per-level VMEM gather parity (interpret mode on CPU).

The GSSDF_ENCODE_VMEM path must be a drop-in for the global table_gather:
identical forward values (same rows, same order), identical table
gradients at every autodiff order, identical under vmap (multicam)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gssdf_tpu.fields.hashgrid as HG
import gssdf_tpu.ops.pallas.lvl_gather as LG
from gssdf_tpu.fields.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_with_grad,
    init_hashgrid,
)

SPEC = HashGridSpec(
    n_levels=6, n_features_per_level=2, log2_hashmap_size=12,
    base_resolution=4, per_level_scale=1.7,
)


@pytest.fixture(autouse=True, params=["take", "loop"])
def vmem_mode(request, monkeypatch):
    monkeypatch.setattr(LG, "_INTERPRET", True)
    monkeypatch.setattr(LG, "_VARIANT", request.param)
    yield request.param


def test_level_gather_matches_take():
    l, s, f, r = 5, 64, 2, 300
    key = jax.random.PRNGKey(0)
    stack = jax.random.normal(key, (l, s, f))
    idx = jax.random.randint(jax.random.PRNGKey(1), (l, r), 0, s)
    out = LG.level_gather(stack, idx)
    ref = jax.vmap(lambda t, ix: t[ix])(stack, idx)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(ref))


def test_level_gather_table_grad():
    l, s, f, r = 3, 32, 2, 111
    stack = jax.random.normal(jax.random.PRNGKey(2), (l, s, f))
    idx = jax.random.randint(jax.random.PRNGKey(3), (l, r), 0, s)
    w = jax.random.normal(jax.random.PRNGKey(4), (l, r, f))

    def loss(st):
        return jnp.sum(LG.level_gather(st, idx) * w)

    g = jax.grad(loss)(stack)
    g_ref = jax.grad(
        lambda st: jnp.sum(jax.vmap(lambda t, ix: t[ix])(st, idx) * w)
    )(stack)
    np.testing.assert_allclose(
        np.asarray(g), np.asarray(g_ref), rtol=1e-6, atol=1e-6
    )


def _encode_both(fn, *args):
    """Run ``fn`` with the default and the VMEM encode path."""
    old = HG._ENCODE_VMEM
    try:
        HG._ENCODE_VMEM = False
        a = fn(*args)
        HG._ENCODE_VMEM = True
        b = fn(*args)
    finally:
        HG._ENCODE_VMEM = old
    return a, b


def test_encode_forward_parity():
    table = init_hashgrid(jax.random.PRNGKey(5), SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(6), (257, 3))
    a, b = _encode_both(lambda: hashgrid_encode(table, x, SPEC))
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))


def test_encode_grad_and_hessian_parity():
    table = init_hashgrid(jax.random.PRNGKey(7), SPEC)
    x = jax.random.uniform(jax.random.PRNGKey(8), (64, 3))
    v = jax.random.normal(jax.random.PRNGKey(9), (64, SPEC.out_dim))

    def loss(t):
        feat, feat_g, jac = hashgrid_encode_with_grad(t, x, SPEC)
        # touches value + spatial-jacobian branches (eikonal-style)
        return jnp.sum(feat * v) + jnp.sum(jac ** 2)

    ga, gb = _encode_both(lambda: jax.grad(loss)(table))
    np.testing.assert_allclose(
        np.asarray(ga), np.asarray(gb), rtol=1e-6, atol=1e-6
    )
    # grad-of-grad (double backward through the gather/scatter pairing)
    def gsum(t):
        return jnp.sum(jax.grad(loss)(t) ** 2)

    ha, hb = _encode_both(lambda: jax.grad(gsum)(table))
    np.testing.assert_allclose(
        np.asarray(ha), np.asarray(hb), rtol=1e-5, atol=1e-6
    )


def test_level_scatter_add_matches_segsum():
    l, s, f, r = 4, 48, 2, 333
    idx = jax.random.randint(jax.random.PRNGKey(12), (l, r), 0, s)
    vals = jax.random.normal(jax.random.PRNGKey(13), (l, r, f))
    out = LG.level_scatter_add(idx, vals, s)
    ref = jax.vmap(
        lambda ix, v: jnp.zeros((s, f)).at[ix].add(v)
    )(idx, vals)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), rtol=1e-6, atol=1e-6
    )


def test_encode_vmap_parity():
    table = init_hashgrid(jax.random.PRNGKey(10), SPEC)
    xs = jax.random.uniform(jax.random.PRNGKey(11), (3, 33, 3))
    a, b = _encode_both(
        lambda: jax.vmap(lambda x: hashgrid_encode(table, x, SPEC))(xs)
    )
    np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
