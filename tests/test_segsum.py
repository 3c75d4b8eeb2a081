"""Windowed segment-sum / gather kernel parity (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gssdf_tpu.ops.pallas.segsum as S


@pytest.fixture(autouse=True)
def _interpret_mode():
    S._INTERPRET = True
    yield
    S._INTERPRET = False


def _data(r=3000, slots=1000, feat=2, seed=0, dupes=True):
    key = jax.random.PRNGKey(seed)
    k1, k2 = jax.random.split(key)
    hi = slots if dupes else slots * 4
    keys = jax.random.randint(k1, (r,), 0, hi).astype(jnp.int32)
    vals = jax.random.normal(k2, (r, feat), jnp.float32)
    return keys, vals


@pytest.mark.parametrize("feat", [1, 2, 4])
def test_sorted_segment_sum_matches_scatter(feat):
    keys, vals = _data(feat=feat)
    slots = 1000
    sk_ops = (keys,) + tuple(vals[:, i] for i in range(feat))
    sk, *sv = jax.lax.sort(sk_ops, num_keys=1)
    sv = jnp.stack(sv, axis=0)            # feature-major [F, R]
    out = S.sorted_segment_sum_pallas(
        sk, sv, slots, block_slots=256, chunk=128, r_width=64
    )
    ref = S.segment_sum_ref(keys, vals, slots)
    # 1e-4: the kernel's split-bf16 contraction carries ~2^-17 relative
    # error per row vs the fp32 scatter reference
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=1e-4)


def test_sorted_segment_sum_wide_feat():
    """feat > 8 path (rasterizer entry tables): 2-op perm sort + row gather
    + small-block kernel tuning, exactly as segment_sum dispatches on TPU."""
    keys, vals = _data(r=2000, slots=500, feat=24, seed=7)
    sk, perm = jax.lax.sort(
        (keys, jnp.arange(2000, dtype=jnp.int32)), num_keys=1
    )
    sv = jnp.take(vals, perm, axis=0)
    out = S.sorted_segment_sum_pallas(
        sk, sv.T, 500, block_slots=128, chunk=128, r_width=16
    )
    ref = S.segment_sum_ref(keys, vals, 500)
    np.testing.assert_allclose(
        np.asarray(out), np.asarray(ref), atol=1e-4, rtol=1e-5
    )


def test_segment_sum_drops_out_of_range():
    keys, vals = _data(r=500, slots=100, dupes=False)  # many keys >= slots
    out_ref = S.segment_sum_ref(keys, vals, 100)
    sk_ops = (keys,) + tuple(vals[:, i] for i in range(2))
    sk, *sv = jax.lax.sort(sk_ops, num_keys=1)
    out = S.sorted_segment_sum_pallas(
        sk, jnp.stack(sv, 0), 100, block_slots=128, chunk=64, r_width=32
    )
    np.testing.assert_allclose(np.asarray(out), np.asarray(out_ref), atol=1e-5)


def test_sorted_segment_sum_empty_and_hot_blocks():
    """One very hot slot (multi-chunk run) plus empty blocks."""
    r = 2000
    keys = jnp.concatenate(
        [jnp.full((1500,), 7, jnp.int32),
         jnp.full((500,), 900, jnp.int32)]
    )
    vals = jnp.ones((2, r), jnp.float32)   # feature-major
    out = S.sorted_segment_sum_pallas(
        keys, vals, 1000, block_slots=256, chunk=128, r_width=64
    )
    assert float(out[7, 0]) == 1500.0
    assert float(out[900, 1]) == 500.0
    assert float(jnp.abs(out).sum()) == 4000.0


def test_sorted_segment_max_matches_scatter_max():
    key = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(key)
    keys = jax.random.randint(k1, (3000,), 0, 900).astype(jnp.int32)
    vals = jax.random.uniform(k2, (3000,))      # non-negative
    sk, sv = jax.lax.sort((keys, vals), num_keys=1)
    out = S.sorted_segment_max_pallas(
        sk, sv, 1000, block_slots=128, chunk=256, sub_rows=4
    )
    ref = S.segment_max_ref(keys, vals, 1000)   # incl. empty slots -> 0
    np.testing.assert_allclose(np.asarray(out), np.asarray(ref), atol=0)


def test_segment_max_vjp_matches_xla_scatter_max():
    """Cotangent splits evenly among ties, zero-init counts as a tie —
    exactly XLA's scatter-max vjp."""
    idx = jnp.array([0, 0, 1, 1, 1, 2, 2], jnp.int32)
    w = jnp.array([1.0, 1.0, 2.0, 3.0, 3.0, 0.0, 0.0])

    def f_ref(w):
        return jnp.zeros((4,)).at[idx].max(w, mode="drop")

    def f_new(w):
        return S.segment_max(idx, w, 4)

    g = jnp.array([1.0, 2.0, 3.0, 4.0])
    v_ref, vjp_ref = jax.vjp(f_ref, w)
    v_new, vjp_new = jax.vjp(f_new, w)
    np.testing.assert_allclose(np.asarray(v_new), np.asarray(v_ref))
    np.testing.assert_allclose(
        np.asarray(vjp_new(g)[0]), np.asarray(vjp_ref(g)[0])
    )


def test_sorted_window_gather_matches_take():
    key = jax.random.PRNGKey(3)
    table = jax.random.normal(key, (1000, 2))
    keys = jnp.sort(jax.random.randint(key, (2500,), 0, 1000)).astype(jnp.int32)
    out = S.sorted_window_gather_pallas(
        table, keys, block_slots=256, chunk=128, r_width=64
    )
    np.testing.assert_allclose(
        np.asarray(out.T), np.asarray(table[keys]), atol=1e-6
    )


def test_table_gather_fwd_bwd_cpu_fallback():
    """On CPU the linear_call falls back to XLA ops; gradients wrt the table
    equal the scatter-add of cotangent rows."""
    key = jax.random.PRNGKey(4)
    table = jax.random.normal(key, (200, 2))
    idx = jax.random.randint(key, (700,), 0, 200)

    def loss(t):
        rows = S.table_gather(t, idx)
        return jnp.sum(rows * rows)

    g = jax.grad(loss)(table)
    rows = table[idx]
    g_ref = S.segment_sum_ref(idx, 2.0 * rows, 200)
    np.testing.assert_allclose(np.asarray(g), np.asarray(g_ref), atol=1e-5)


def test_table_gather_higher_order_autodiff():
    """The linear_call transpose pairing must survive grad-of-grad and
    forward-over-reverse (the eikonal / Hessian paths of the SDF field)."""
    key = jax.random.PRNGKey(5)
    table = jax.random.normal(key, (64, 2))
    n = 37

    def encode(t, x):
        # x-dependent trilinear-style weights over gathered rows
        pos = x * 31.0
        i0 = jnp.floor(pos).astype(jnp.int32)
        frac = pos - jnp.floor(pos)
        rows0 = S.table_gather(t, i0)
        rows1 = S.table_gather(t, jnp.minimum(i0 + 1, 63))
        return jnp.sum(rows0 * (1 - frac)[:, None] + rows1 * frac[:, None])

    x = jax.random.uniform(key, (n,), minval=0.05, maxval=0.95)

    def eik(t):
        g = jax.grad(encode, argnums=1)(t, x)
        return jnp.sum(g * g)

    def eik_ref(t):
        def enc_ref(t, x):
            pos = x * 31.0
            i0 = jnp.floor(pos).astype(jnp.int32)
            frac = pos - jnp.floor(pos)
            return jnp.sum(
                t[i0] * (1 - frac)[:, None]
                + t[jnp.minimum(i0 + 1, 63)] * frac[:, None]
            )

        g = jax.grad(enc_ref, argnums=1)(t, x)
        return jnp.sum(g * g)

    # grad-of-grad wrt the table
    gt = jax.grad(eik)(table)
    gt_ref = jax.grad(eik_ref)(table)
    np.testing.assert_allclose(np.asarray(gt), np.asarray(gt_ref), atol=1e-5)

    # forward-over-reverse (jvp of grad) — the HVP path
    f = lambda xx: jax.grad(encode, argnums=1)(table, xx)
    _, hvp = jax.jvp(f, (x,), (jnp.ones_like(x),))
    assert np.all(np.isfinite(np.asarray(hvp)))
