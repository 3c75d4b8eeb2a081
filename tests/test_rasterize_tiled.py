"""Tiled rasterizer parity vs the dense reference (forward + gradients)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssdf_tpu.gs.projection import project_2dgs
from gssdf_tpu.gs.rasterize_jax import rasterize_dense
from gssdf_tpu.gs.rasterize_tiled import rasterize_tiled, tile_encode

W, H = 64, 48
K = jnp.array([[100.0, 0, W / 2], [0, 100.0, H / 2], [0, 0, 1]], jnp.float32)
EYE4 = jnp.eye(4, dtype=jnp.float32)


def _random_scene(n=60, seed=0):
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


def _proj(means, quats, scales):
    return project_2dgs(means, quats, scales, EYE4, K, W, H, 0.01, 100.0)


def test_tile_encode_two_bucket_matches_single_when_unclamped():
    """When every small-bucket splat's bbox fits the small window and every
    big splat lands in the big bucket, the two-bucket encode must produce
    EXACTLY the same tile lists as the single-bucket one."""
    n = 128
    key = jax.random.PRNGKey(9)
    k1, k2 = jax.random.split(key)
    means2d = jax.random.uniform(
        k1, (n, 2), minval=4.0, maxval=float(min(W, H)) - 4.0
    )
    depths = jax.random.uniform(k2, (n,), minval=0.5, maxval=5.0)
    # 10 big splats (well under k_big = n//8 = 16), the rest tiny
    radii = jnp.full((n,), 2.0).at[:10].set(40.0)
    valid = jnp.ones((n,), bool)

    a = tile_encode(means2d, radii, depths, valid, W, H, 16, 64, 32)
    b = tile_encode(means2d, radii, depths, valid, W, H, 16, 64, 32,
                    tile_expand_small=8)
    np.testing.assert_array_equal(np.asarray(a[0]), np.asarray(b[0]))
    np.testing.assert_array_equal(np.asarray(a[1]), np.asarray(b[1]))


def test_tile_encode_clamp_frac_reports_small_bucket_clamping():
    """Force > n//8 big splats: the overflow ones land in the small bucket,
    get window-clamped, and must be counted in clamp_frac."""
    n = 64
    means2d = jnp.tile(
        jnp.array([[W / 2.0, H / 2.0]], jnp.float32), (n, 1)
    )
    depths = jnp.arange(n, dtype=jnp.float32) + 1.0
    radii = jnp.full((n,), 30.0)   # every splat spans many tiles
    valid = jnp.ones((n,), bool)
    out = tile_encode(means2d, radii, depths, valid, W, H, 16, 64, 32,
                      tile_expand_small=4)
    clamp_frac = float(out[3])
    assert clamp_frac > 0.5   # most splats are in the clamped small bucket


def test_tile_encode_lists_are_front_to_back():
    means, quats, scales, opac, colors = _random_scene(40)
    p = _proj(means, quats, scales)
    lists, counts, _drop, _clamp, _raw = tile_encode(
        p.means2d, p.radii, p.depths, p.valid, W, H, 16, 64, 64
    )
    n = means.shape[0]
    binned = np.zeros(n + 1, bool)
    binned[np.asarray(lists).ravel()] = True
    binned = binned[:n]
    d = np.asarray(p.depths)
    for t in range(lists.shape[0]):
        idx = np.asarray(lists[t])
        real = idx[idx < n]
        assert len(real) == int(counts[t])
        # front-to-back within the tile
        assert np.all(np.diff(d[real]) >= -1e-6)
    # every valid splat landed in some tile at this capacity
    assert np.asarray(binned)[np.asarray(p.valid)].all()


@pytest.mark.parametrize("seed", [0, 3])
def test_tiled_matches_dense_forward(seed):
    means, quats, scales, opac, colors = _random_scene(60, seed)
    p = _proj(means, quats, scales)
    dense = rasterize_dense(
        p.means2d, p.M, p.depths, p.normals, colors, opac, p.valid, W, H
    )
    tiled = rasterize_tiled(
        p.means2d, p.M, p.depths, p.normals, colors, opac, p.valid, p.radii,
        W, H, tile_cap=128, tile_expand=64, tile_batch=4,
    )
    # rtol covers float sum-order drift on near-edge-on splats whose
    # ray-plane intersection depth is huge (both paths agree to <0.1%)
    for ch in ["color", "normal", "alpha", "depth", "median", "distort"]:
        np.testing.assert_allclose(
            np.asarray(tiled[ch]), np.asarray(dense[ch]), rtol=2e-3,
            atol=2e-5, err_msg=ch,
        )
    # visibilities agree where the dense max-weight pixel lies inside the
    # splat's binned tiles (true at this cap/expand)
    np.testing.assert_allclose(
        np.asarray(tiled["visibilities"]),
        np.asarray(dense["visibilities"]),
        atol=2e-5,
    )


def test_tiled_background():
    means, quats, scales, opac, colors = _random_scene(10)
    p = _proj(means, quats, scales)
    bg = jnp.array([0.2, 0.4, 0.6])
    dense = rasterize_dense(
        p.means2d, p.M, p.depths, p.normals, colors, opac, p.valid, W, H,
        background=bg,
    )
    tiled = rasterize_tiled(
        p.means2d, p.M, p.depths, p.normals, colors, opac, p.valid, p.radii,
        W, H, tile_cap=64, tile_expand=64, background=bg,
    )
    np.testing.assert_allclose(
        np.asarray(tiled["color"]), np.asarray(dense["color"]), atol=2e-5
    )


def test_tiled_gradients_match_dense():
    means, quats, scales, opac, colors = _random_scene(25, seed=7)
    target = jnp.zeros((H, W, 3))

    def loss_with(raster):
        def f(means_, opac_, pix_delta):
            p = _proj(means_, quats, scales)
            if raster == "dense":
                res = rasterize_dense(
                    p.means2d, p.M, p.depths, p.normals, colors, opac_,
                    p.valid, W, H, pix_delta=pix_delta,
                )
            else:
                res = rasterize_tiled(
                    p.means2d, p.M, p.depths, p.normals, colors, opac_,
                    p.valid, p.radii, W, H, tile_cap=64, tile_expand=64,
                    tile_batch=4, pix_delta=pix_delta,
                )
            return (
                jnp.mean((res["color"] - target) ** 2)
                + 0.1 * jnp.mean(jnp.abs(res["depth"]))
                + 0.05 * jnp.mean(res["distort"])
                + 0.01 * jnp.sum(res["visibilities"])
            )
        return f

    pd0 = jnp.zeros((means.shape[0], 2))
    gd = jax.grad(loss_with("dense"), argnums=(0, 1, 2))(means, opac, pd0)
    gt = jax.grad(loss_with("tiled"), argnums=(0, 1, 2))(means, opac, pd0)
    for a, b, name in zip(gd, gt, ["means", "opac", "pix_delta"]):
        np.testing.assert_allclose(
            np.asarray(b), np.asarray(a), rtol=1e-3, atol=1e-6, err_msg=name
        )


def test_tiled_jits_and_caps_degrade_gracefully():
    """Tiny caps must not crash or produce NaN (far splats dropped)."""
    means, quats, scales, opac, colors = _random_scene(80)
    p = _proj(means, quats, scales)
    fn = jax.jit(
        lambda: rasterize_tiled(
            p.means2d, p.M, p.depths, p.normals, colors, opac, p.valid,
            p.radii, W, H, tile_cap=8, tile_expand=4,
        )
    )
    res = fn()
    for v in res.values():
        assert np.isfinite(np.asarray(v)).all()


def test_tile_encode_all_invalid_and_tiny_n():
    """All-invalid splats produce empty tile lists; n < 64 falls back to the
    single-bucket path even when tile_expand_small is set."""
    for n in (8, 128):
        means2d = jnp.full((n, 2), 30.0)
        depths = jnp.ones((n,))
        radii = jnp.full((n,), 5.0)
        valid = jnp.zeros((n,), bool)
        lists, counts, drop, clamp, _raw = tile_encode(
            means2d, radii, depths, valid, W, H, 16, 16, 16,
            tile_expand_small=4,
        )
        assert int(counts.sum()) == 0
        assert np.all(np.asarray(lists) == n)
        assert float(drop) == 0.0 and float(clamp) == 0.0


def test_tile_encode_rank_quantization_large_n():
    """n beyond the int32 rank-bit budget quantizes depth ranks instead of
    overflowing: keys stay int32, per-tile order stays nondecreasing at
    bucket granularity (the 512k+-splat regime of reference-budget runs)."""
    n = 600_000
    W2, H2 = 1200, 680                           # 3225 tiles: 18 rank bits
    rng = np.random.RandomState(0)
    means2d = jnp.asarray(
        rng.uniform([0, 0], [W2, H2], (n, 2)).astype(np.float32)
    )
    depths = jnp.asarray(rng.uniform(1.0, 9.0, n).astype(np.float32))
    radii = jnp.full((n,), 4.0, jnp.float32)
    valid = jnp.asarray(np.arange(n) < 128)      # only 128 real splats
    lists, counts, drop, clamp, _raw = tile_encode(
        means2d, radii, depths, valid, W2, H2, 16, 128, 4,
    )
    li = np.asarray(lists)
    real = li[li < n]
    assert len(real) > 0
    assert (real < 128).all()                    # only valid splats binned
    # per-tile front-to-back at quantized-rank granularity
    rank = np.argsort(np.argsort(np.where(np.asarray(valid),
                                          np.asarray(depths), np.inf)))
    tile_bits = (lists.shape[0] + 1).bit_length()
    shift = max(0, (n - 1).bit_length() - (30 - tile_bits))
    assert shift > 0                             # the fallback actually fired
    for t in range(lists.shape[0]):
        r = li[t][li[t] < n]
        if len(r) > 1:
            q = rank[r] >> shift
            assert (np.diff(q) >= 0).all()


def test_need_vis_false_skips_reduction_but_keeps_images():
    """need_vis=False (eval renders) must not change any image output;
    visibilities come back zero and binned all-True."""
    means, quats, scales, opac, colors = _random_scene()
    p = _proj(means, quats, scales)
    kw = dict(width=W, height=H, tile_cap=64, tile_expand=16)
    a = rasterize_tiled(p.means2d, p.M, p.depths, p.normals, colors, opac,
                        p.valid, p.radii, **kw)
    b = rasterize_tiled(p.means2d, p.M, p.depths, p.normals, colors, opac,
                        p.valid, p.radii, need_vis=False, **kw)
    for ch in ("color", "depth", "normal", "alpha", "median", "distort"):
        np.testing.assert_allclose(np.asarray(a[ch]), np.asarray(b[ch]))
    assert np.asarray(a["visibilities"]).max() > 0
    assert np.asarray(b["visibilities"]).max() == 0
    assert np.asarray(b["binned"]).all()


def test_circle_rect_cull_drops_corner_tiles():
    """A splat centered in a tile with radius barely past the tile edge:
    the bbox window spans 3x3 tiles but the circle only reaches the 4 edge
    neighbors — the 4 corner tiles must be culled at emit time."""
    # center of tile (2, 2) in a 16px grid; radius 18px touches edge
    # neighbors (distance-to-rect 8px) but not corner tiles (~11.3px from
    # center to the nearest corner-rect point... use radius to make it
    # unambiguous: corner rect min distance = sqrt(8^2+8^2) = 11.31 < 18?
    # yes — so pick radius between 8 and 11.3
    means2d = jnp.array([[40.0, 40.0]], jnp.float32)
    radii = jnp.array([10.0], jnp.float32)
    depths = jnp.array([1.0], jnp.float32)
    valid = jnp.array([True])
    lists, counts, _d, _c, _raw = tile_encode(
        means2d, radii, depths, valid, W, H, 16, 16, 16
    )
    cnt = np.asarray(counts).reshape(3, 4)     # tiles_y=3, tiles_x=4
    # edge neighbors + center binned
    assert cnt[2, 2] == 1 and cnt[1, 2] == 1 and cnt[2, 1] == 1
    # corner tiles culled (distance to rect 11.31 > 10)
    assert cnt[1, 1] == 0 and cnt[1, 3] == 0


def test_drop_vis_zero_when_saturated_nonzero_when_translucent():
    """drop_vis = transmittance-weighted drop bound. Overflowing a tile with
    OPAQUE front splats must report drop_vis ~ 0 (the drops composite behind
    a saturated prefix); overflowing with near-transparent splats must
    report drop_vis ~ drop_frac (the drops were still visible)."""
    n, cap = 48, 16
    means2d = jnp.tile(jnp.array([[8.0, 8.0]], jnp.float32), (n, 1))
    M = jnp.tile(
        (jnp.diag(jnp.array([6.0, 6.0, 1.0])).at[0, 2].set(8.0)
         .at[1, 2].set(8.0))[None],
        (n, 1, 1),
    ).astype(jnp.float32)
    depths = jnp.arange(n, dtype=jnp.float32) + 1.0
    normals = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (n, 1))
    colors = jnp.ones((n, 3), jnp.float32)
    valid = jnp.ones((n,), bool)
    radii = jnp.full((n,), 6.0, jnp.float32)

    def render(opac):
        return rasterize_tiled(
            means2d, M, depths, normals, colors, opac, valid, radii,
            W, H, tile_cap=cap, tile_expand=4, impl="xla",
        )

    res_opaque = render(jnp.full((n,), 0.99, jnp.float32))
    res_clear = render(jnp.full((n,), 1e-3, jnp.float32))
    drop_o = float(res_opaque["drop_frac"])
    assert drop_o > 0.3                      # the cap really overflowed
    # mean-over-tile T includes pixels the splats don't cover, so the bound
    # isn't exactly 0 — but it must be orders of magnitude below drop_frac
    assert float(res_opaque["drop_vis"]) < 0.01 * drop_o
    drop_c = float(res_clear["drop_frac"])
    vis_c = float(res_clear["drop_vis"])
    assert vis_c > 0.8 * drop_c              # translucent drops stay visible


def test_table_dma_matches_xla_slices():
    """ops/pallas/table_build.py (interpret mode): the DMA-row tile table
    equals the vmapped dynamic-slice build inside a real tile_encode."""
    import gssdf_tpu.gs.rasterize_tiled as RT
    import gssdf_tpu.ops.pallas.table_build as tb

    rng = np.random.RandomState(4)
    n = 500
    means2d = jnp.asarray(rng.uniform(0, 64, (n, 2)), jnp.float32)
    radii = jnp.asarray(rng.uniform(1, 12, (n,)), jnp.float32)
    depths = jnp.asarray(rng.uniform(0.5, 5.0, (n,)), jnp.float32)
    valid = jnp.asarray(rng.rand(n) > 0.1)

    def encode():
        return RT.tile_encode(
            means2d, radii, depths, valid, 64, 48, 16, 32, 16, 0
        )

    ref = encode()
    old_flag, old_interp = RT._TABLE_DMA, tb._INTERPRET
    RT._TABLE_DMA, tb._INTERPRET = True, True
    tb.table_rows_dma.clear_cache()
    try:
        got = encode()
    finally:
        RT._TABLE_DMA, tb._INTERPRET = old_flag, old_interp
        tb.table_rows_dma.clear_cache()
    for a, b in zip(ref, got):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
