"""Pallas tile-composite kernel parity (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gssdf_tpu.ops.pallas.raster as R
import gssdf_tpu.ops.pallas.raster_v2 as R2
from gssdf_tpu.gs.projection import project_2dgs
from gssdf_tpu.gs.rasterize_tiled import rasterize_tiled

W, H = 96, 64
K = jnp.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], jnp.float32)
EYE4 = jnp.eye(4, dtype=jnp.float32)


@pytest.fixture(
    autouse=True, params=["v1", "v1_v3", "v1_v4", "v1_v3v4", "v2"]
)
def KMOD(request, monkeypatch):
    """Run the direct kernel tests against BOTH schedulings (raster /
    raster_v2) AND the V3 chunk math (MXU plane construction +
    strict-prefix t_ex, GSSDF_RASTER_V3) AND the V4 multiplicative
    transmittance scan (GSSDF_RASTER_V4, alone and combined with V3).
    raster_v2 is NOT routed through the production dispatch: it fails
    forward parity on real Mosaic (chip sweep 2026-08-19, max err 2.84 —
    interpret mode passes, so these CPU tests can't see the bug) and
    GSSDF_RASTER_V2=1 now raises in rasterize_tiled."""
    R._INTERPRET = True
    R2._INTERPRET = True
    monkeypatch.delenv("GSSDF_RASTER_V2", raising=False)
    variants = {"v1_v3": ("_V3",), "v1_v4": ("_V4",),
                "v1_v3v4": ("_V3", "_V4")}.get(request.param, ())
    for attr in variants:
        monkeypatch.setattr(R, attr, True)
    if variants:
        # variant flags are read at TRACE time: stale executables traced
        # with the other setting must not be reused across fixture params
        jax.clear_caches()
    mod = R2 if request.param == "v2" else R
    yield mod
    if variants:
        jax.clear_caches()
    R._INTERPRET = False
    R2._INTERPRET = False


def _scene(n=80, seed=0):
    key = jax.random.PRNGKey(seed)
    k1, k2, k3, k4, k5 = jax.random.split(key, 5)
    means = jnp.concatenate(
        [
            jax.random.uniform(k1, (n, 2), minval=-0.4, maxval=0.4),
            jax.random.uniform(k2, (n, 1), minval=0.6, maxval=3.0),
        ],
        -1,
    )
    quats = jax.random.normal(k3, (n, 4))
    quats = quats / jnp.linalg.norm(quats, axis=-1, keepdims=True)
    scales = jnp.concatenate(
        [
            jax.random.uniform(k4, (n, 2), minval=0.02, maxval=0.08),
            jnp.full((n, 1), 1e-6),
        ],
        -1,
    )
    opac = jax.random.uniform(k5, (n,), minval=0.3, maxval=0.95)
    colors = jax.random.uniform(jax.random.PRNGKey(seed + 1), (n, 3))
    return means, quats, scales, opac, colors


def _run(impl, means, quats, scales, opac, colors, pix_delta=None):
    p = project_2dgs(means, quats, scales, EYE4, K, W, H, 0.01, 100.0)
    return rasterize_tiled(
        p.means2d, p.M, p.depths, p.normals, colors, opac, p.valid, p.radii,
        W, H, tile_cap=128, tile_expand=32, pix_delta=pix_delta, impl=impl,
    )


def test_pallas_matches_xla_forward(KMOD):
    scene = _scene()
    rx = _run("xla", *scene)
    rp = _run("pallas", *scene)
    for ch in ["color", "normal", "alpha", "depth", "median", "distort",
               "visibilities"]:
        # 1e-4: the kernel's split-bf16 triangular matmuls (_tri_dot)
        # reproduce the fp32 XLA path to ~2^-17 relative; depth-scaled
        # channels see up to ~1e-4 absolute at this scene's depth range.
        np.testing.assert_allclose(
            np.asarray(rp[ch]), np.asarray(rx[ch]), atol=1e-4, err_msg=ch
        )


def test_pallas_gradients_match_xla(KMOD):
    means, quats, scales, opac, colors = _scene(40, seed=3)
    target = jnp.zeros((H, W, 3))

    def loss(impl):
        def f(opac_, pdel):
            r = _run(impl, means, quats, scales, opac_, colors, pdel)
            return (
                jnp.mean((r["color"] - target) ** 2)
                + 0.1 * jnp.mean(jnp.abs(r["depth"]))
                + 0.01 * jnp.sum(r["visibilities"])
            )
        return f

    pd0 = jnp.zeros((40, 2))
    gx = jax.grad(loss("xla"), argnums=(0, 1))(opac, pd0)
    gp = jax.grad(loss("pallas"), argnums=(0, 1))(opac, pd0)
    for a, b, name in zip(gx, gp, ["opac", "pix_delta"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), atol=1e-6, err_msg=name
        )


def _entries_from_scene(n=60, seed=7, tile_cap=128, tile_expand=32):
    """Realistic [T, 24, C] entry table via the production encode path."""
    from gssdf_tpu.gs.rasterize_tiled import tile_encode
    from gssdf_tpu.gs.rasterize_jax import splat_coeffs

    means, quats, scales, opac, colors = _scene(n, seed)
    p = project_2dgs(means, quats, scales, EYE4, K, W, H, 0.01, 100.0)
    tiles_x = -(-W // 16)
    tile_lists, _, _, _, _ = tile_encode(
        p.means2d, p.radii, p.depths, p.valid, W, H, 16, tile_cap,
        tile_expand,
    )
    pad = lambda x: jnp.concatenate(
        [x, jnp.zeros((1,) + x.shape[1:], x.dtype)]
    )
    M_p = jnp.concatenate([p.M, jnp.eye(3)[None]], axis=0)
    coeffs = splat_coeffs(
        pad(p.means2d), M_p, pad(jnp.where(p.valid, opac, 0.0)),
        jnp.zeros((n + 1, 2)),
    )
    feats = pad(jnp.concatenate([colors, p.normals], axis=-1))
    table = jnp.concatenate([coeffs, feats], axis=-1)
    table24 = jnp.concatenate(
        [table, jnp.zeros((n + 1, R.F_ROWS - table.shape[-1]))], axis=-1
    )
    num_tiles = tile_lists.shape[0]
    entries_t = jnp.swapaxes(
        table24[tile_lists.reshape(-1)].reshape(num_tiles, tile_cap,
                                                R.F_ROWS),
        -1, -2,
    )
    return entries_t.astype(jnp.float32), tiles_x


def test_chunked_forward_matches_unchunked_reference(KMOD):
    """The chunk-faithful twin (and thus the Pallas kernel) reproduces the
    independent full-width reference on channel rows and wmax row 0."""
    entries_t, tiles_x = _entries_from_scene()
    # Tolerances: a 1-ulp difference in the log-transmittance cumsum between
    # backends (vmapped-batched vs single matmul) can flip one entry's
    # T_EPS keep-gate; the flipped weight is <= T_EPS but multiplies the
    # (unbounded) intersection depth, so depth/distort channels can move by
    # ~T_EPS * depth. 5e-3 absolute covers it at this scene's depth range.
    out_ref, wm_ref_ = R._composite_ref_jax(entries_t, tiles_x, 16)
    out_ch, wm_ch = R.composite_fwd_reference(entries_t, tiles_x, 16)
    np.testing.assert_allclose(
        np.asarray(out_ch[:, :10]), np.asarray(out_ref[:, :10]),
        atol=5e-3, rtol=1e-3,
    )
    np.testing.assert_allclose(
        # 2e-5: chunk twin uses split-bf16 _tri_dot, the full-width
        # reference is pure fp32 (weights are <= 1, so absolute suffices)
        np.asarray(wm_ch[:, 0]), np.asarray(wm_ref_[:, 0]), atol=2e-5
    )
    # interpreter-mode Pallas forward vs the twin (same flip caveat)
    out_p, wm_p = KMOD._composite_fwd_pallas(entries_t, tiles_x, 16)
    np.testing.assert_allclose(
        np.asarray(out_p), np.asarray(out_ch), atol=5e-3, rtol=1e-3
    )
    np.testing.assert_allclose(
        # 2e-5: XLA CPU may reassociate the two bf16 partial dots of
        # _tri_dot differently between the interpret-mode kernel and the
        # vmapped twin
        np.asarray(wm_p), np.asarray(wm_ch), atol=2e-5
    )


def test_analytic_backward_matches_autodiff(KMOD):
    """d_entries from the hand-derived chunked backward == jax.vjp of the
    pure-JAX reference, under random cotangents on EVERY output channel
    (incl. the median and per-splat max-weight paths)."""
    entries_t, tiles_x = _entries_from_scene()
    t_tiles, _, c = entries_t.shape
    nc = R.n_chunks(c)
    orows = R.o_rows(nc)

    out, vjp = jax.vjp(
        lambda e: R._composite_ref_jax(e, tiles_x, 16), entries_t
    )
    kg = jax.random.PRNGKey(11)
    k1, k2 = jax.random.split(kg)
    row_w = np.zeros((orows,), np.float32)
    row_w[:10] = [1, 1, 1, 1, 1, 1, 0.3, 0.3, 0.3, 0.1]
    g_out = jax.random.normal(k1, out[0].shape) * row_w.reshape(1, orows, 1)
    g_wmax = jax.random.normal(k2, out[1].shape) * jnp.array(
        [1.0, 0, 0, 0, 0, 0, 0, 0]
    ).reshape(1, 8, 1)
    (d_auto,) = vjp((g_out, g_wmax))

    out_vals, wm_vals = R.composite_fwd_reference(entries_t, tiles_x, 16)
    d_analytic = R.composite_bwd_reference(
        entries_t, out_vals, wm_vals, g_out, g_wmax, tiles_x, 16
    )
    # f32 summation-order differs (matmul-cumsum vs autodiff chain) and the
    # near-edge-on coefficient gradients are ill-conditioned (inv_sz^2 ~ 1e18
    # amplification) — both f32 paths carry ~1e-3 relative noise there. The
    # end-to-end test above checks real-scale grads at 1e-6.
    a, b = np.asarray(d_analytic), np.asarray(d_auto)
    tol = 2e-3 * np.abs(b) + 1e-4 * max(np.abs(b).max(), 1.0)
    bad = np.abs(a - b) > tol
    assert not bad.any(), f"{bad.sum()} grad elements beyond tolerance"

    # interpreter-mode Pallas kernel == the vmapped twin (same tolerance:
    # the interpreter lowers the matmuls with different accumulation order).
    # The Pallas backward replays the forward from ITS OWN forward's saved
    # carries (as custom_vjp pairs them in production) — feeding it the
    # twin's carries would break the bit-exact keep-gate/tie replay.
    out_pp, wm_pp = KMOD._composite_fwd_pallas(entries_t, tiles_x, 16)
    d_pallas = KMOD._composite_bwd_pallas(
        entries_t, out_pp, wm_pp, g_out, g_wmax, tiles_x, 16
    )
    p = np.asarray(d_pallas)
    tol = 2e-3 * np.abs(a) + 1e-4 * max(np.abs(a).max(), 1.0)
    bad = np.abs(p - a) > tol
    assert not bad.any(), f"{bad.sum()} pallas-vs-twin elements beyond tol"


def test_raster_v2_env_opt_in_raises(monkeypatch):
    """raster_v2 was rejected on real hardware (fwd parity failure on
    Mosaic); the env opt-in must fail loudly rather than train on wrong
    renders (gs/rasterize_tiled.py dispatch)."""
    monkeypatch.setenv("GSSDF_RASTER_V2", "1")
    scene = _scene(20, seed=5)
    with pytest.raises(RuntimeError, match="parity"):
        _run("pallas", *scene)


@pytest.mark.parametrize("kt", [2, 4])
def test_multitile_kt_matches_kt1(kt, monkeypatch):
    """kt tiles per composite grid step must be BIT-IDENTICAL to kt=1:
    per-subtile math, carries, and skip tests are unchanged — only the
    grid decomposition differs (unlike the rejected raster_v2)."""
    import gssdf_tpu.ops.pallas.raster as R

    monkeypatch.setattr(R, "_INTERPRET", True)
    scene = _scene(n=80, seed=3)
    means, quats, scales, opac, colors = scene
    p = project_2dgs(means, quats, scales, EYE4, K, W, H, 0.01, 100.0)

    def run(kt_val):
        monkeypatch.setenv("GSSDF_RASTER_KT", str(kt_val))

        def loss(op):
            r = rasterize_tiled(
                p.means2d, p.M, p.depths, p.normals, colors, op, p.valid,
                p.radii, W, H, tile_cap=128, tile_expand=32, impl="pallas",
            )
            s = (jnp.sum(r["color"]) + jnp.sum(r["depth"])
                 + jnp.sum(r["visibilities"]))
            return s, r

        (val, r), g = jax.value_and_grad(loss, has_aux=True)(opac)
        return val, r, g

    v1, r1, g1 = run(1)
    vk, rk, gk = run(kt)
    assert float(v1) == float(vk)
    for ch in ("color", "depth", "alpha", "visibilities", "chunk_active"):
        np.testing.assert_array_equal(
            np.asarray(r1[ch]), np.asarray(rk[ch]), err_msg=ch
        )
    np.testing.assert_array_equal(np.asarray(g1), np.asarray(gk))
