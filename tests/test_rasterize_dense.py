"""Analytic-property tests of the 2DGS projection + dense rasterizer."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssdf_tpu.gs.projection import project_2dgs
from gssdf_tpu.gs.rasterize_jax import rasterize_dense

W, H = 64, 48
FX = FY = 100.0
CX, CY = W / 2, H / 2
K = jnp.array([[FX, 0, CX], [0, FY, CY], [0, 0, 1]], jnp.float32)
EYE4 = jnp.eye(4, dtype=jnp.float32)

IDQ = jnp.array([1.0, 0.0, 0.0, 0.0])


def _single_splat(z=1.0, s=0.05, opa=0.9, color=(1.0, 0.0, 0.0)):
    means = jnp.array([[0.0, 0.0, z]])
    quats = IDQ[None]
    scales = jnp.array([[s, s, 1e-6]])
    opac = jnp.array([opa])
    colors = jnp.array([color])
    return means, quats, scales, opac, colors


def _render(means, quats, scales, opac, colors, viewmat=EYE4):
    proj = project_2dgs(means, quats, scales, viewmat, K, W, H, 0.01, 100.0)
    return (
        rasterize_dense(
            proj.means2d,
            proj.M,
            proj.depths,
            proj.normals,
            colors,
            opac,
            proj.valid,
            W,
            H,
        ),
        proj,
    )


def test_projection_center_and_radius():
    means, quats, scales, opac, colors = _single_splat(z=1.0, s=0.05)
    proj = project_2dgs(means, quats, scales, EYE4, K, W, H, 0.01, 100.0)
    np.testing.assert_allclose(np.asarray(proj.means2d[0]), [CX, CY], atol=1e-4)
    # frontal disk: screen sigma = f*s/z = 5 px; cutoff rim 3.33 sigma with
    # the 1/cos(pi/8) hull correction -> radius 16.65/cos(pi/8)
    np.testing.assert_allclose(
        float(proj.radii[0]), 16.65 / np.cos(np.pi / 8), rtol=1e-3
    )
    assert bool(proj.valid[0])
    np.testing.assert_allclose(float(proj.depths[0]), 1.0, atol=1e-6)
    # normal faces the viewer (camera looks +z, so normal ~ -z)
    np.testing.assert_allclose(np.asarray(proj.normals[0]), [0, 0, -1], atol=1e-5)


def test_projection_culling():
    means = jnp.array([[0.0, 0.0, -1.0], [0.0, 0.0, 1.0], [100.0, 0.0, 1.0]])
    quats = jnp.tile(IDQ, (3, 1))
    scales = jnp.full((3, 3), 0.05)
    proj = project_2dgs(means, quats, scales, EYE4, K, W, H, 0.01, 100.0)
    assert not bool(proj.valid[0])  # behind camera
    assert bool(proj.valid[1])
    assert not bool(proj.valid[2])  # far outside the image


def test_single_splat_center_pixel():
    means, quats, scales, opac, colors = _single_splat(opa=0.9)
    res, _ = _render(means, quats, scales, opac, colors)
    cy, cx = H // 2, W // 2
    # pixel center (cx+0.5) coincides with principal point = splat center
    a = float(res["alpha"][cy, cx, 0])
    assert abs(a - 0.9) < 0.02
    np.testing.assert_allclose(
        np.asarray(res["color"][cy, cx]), [a, 0, 0], atol=1e-5
    )
    assert abs(float(res["depth"][cy, cx, 0]) - a * 1.0) < 1e-4
    assert abs(float(res["median"][cy, cx, 0]) - 1.0) < 1e-5
    # normal image accumulates the camera-facing normal
    assert res["normal"][cy, cx, 2] < -0.5


def test_gaussian_falloff():
    means, quats, scales, opac, colors = _single_splat(z=1.0, s=0.05, opa=0.9)
    res, _ = _render(means, quats, scales, opac, colors)
    cy, cx = H // 2, W // 2
    # screen sigma = 5 px; pixel (cx+5) center is 5.5 px from the splat
    # center -> rho = (5.5/5)^2 -> alpha = 0.9*exp(-0.5*1.21)
    a5 = float(res["alpha"][cy, cx + 5, 0])
    np.testing.assert_allclose(a5, 0.9 * np.exp(-0.5 * 1.21), rtol=0.02)


def test_two_splat_compositing():
    means = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
    quats = jnp.tile(IDQ, (2, 1))
    scales = jnp.array([[0.05, 0.05, 1e-6], [0.1, 0.1, 1e-6]])
    opac = jnp.array([0.6, 0.5])
    colors = jnp.array([[1.0, 0.0, 0.0], [0.0, 1.0, 0.0]])
    res, _ = _render(means, quats, scales, opac, colors)
    cy, cx = H // 2, W // 2
    c = np.asarray(res["color"][cy, cx])
    np.testing.assert_allclose(c, [0.6, 0.2, 0.0], atol=0.02)
    np.testing.assert_allclose(float(res["alpha"][cy, cx, 0]), 0.8, atol=0.02)
    d = float(res["depth"][cy, cx, 0])
    np.testing.assert_allclose(d, 0.6 * 1.0 + 0.2 * 2.0, atol=0.05)
    # median: cumulative alpha crosses 0.5 at the front splat
    np.testing.assert_allclose(float(res["median"][cy, cx, 0]), 1.0, atol=1e-4)


def test_visibilities():
    # an occluded splat behind an opaque one
    means = jnp.array([[0.0, 0.0, 1.0], [0.0, 0.0, 2.0]])
    quats = jnp.tile(IDQ, (2, 1))
    scales = jnp.array([[0.2, 0.2, 1e-6], [0.05, 0.05, 1e-6]])
    opac = jnp.array([0.999, 0.9])
    colors = jnp.zeros((2, 3))
    res, _ = _render(means, quats, scales, opac, colors)
    vis = np.asarray(res["visibilities"])
    assert vis[0] > 0.9
    assert vis[1] < 0.05


def test_tilted_splat_depth_varies():
    """A tilted disk's per-pixel intersection depth differs across pixels."""
    # rotate splat 45 deg about y: normal tilts
    th = np.pi / 4
    quat = jnp.array([[np.cos(th / 2), 0.0, np.sin(th / 2), 0.0]], jnp.float32)
    means = jnp.array([[0.0, 0.0, 1.0]])
    scales = jnp.array([[0.1, 0.1, 1e-6]])
    opac = jnp.array([0.95])
    colors = jnp.array([[1.0, 1.0, 1.0]])
    proj = project_2dgs(means, quat, scales, EYE4, K, W, H, 0.01, 100.0)
    res = rasterize_dense(
        proj.means2d, proj.M, proj.depths, proj.normals, colors, opac,
        proj.valid, W, H,
    )
    cy, cx = H // 2, W // 2
    dl = float(res["median"][cy, cx - 4, 0])
    dr = float(res["median"][cy, cx + 4, 0])
    assert abs(dl - dr) > 0.01  # tilted: left/right depths differ
    assert abs(dl + dr - 2.0) < 0.05  # symmetric about the center


def test_gradients_flow_and_match_fd():
    means = jnp.array([[0.0, 0.0, 1.0], [0.02, 0.01, 1.5]])
    quats = jnp.tile(IDQ, (2, 1))
    scales = jnp.array([[0.06, 0.05, 1e-6], [0.08, 0.07, 1e-6]])
    opac_raw = jnp.array([0.6, 0.7])
    colors = jnp.array([[0.9, 0.1, 0.2], [0.1, 0.8, 0.3]])
    target = jnp.zeros((H, W, 3))

    def loss(means_, opac_, pix_delta):
        proj = project_2dgs(means_, quats, scales, EYE4, K, W, H, 0.01, 100.0)
        res = rasterize_dense(
            proj.means2d, proj.M, proj.depths, proj.normals, colors, opac_,
            proj.valid, W, H, pix_delta=pix_delta,
        )
        return jnp.mean((res["color"] - target) ** 2) + 0.1 * jnp.mean(
            jnp.abs(res["depth"])
        )

    pd0 = jnp.zeros((2, 2))
    g_means, g_opa, g_pd = jax.grad(loss, argnums=(0, 1, 2))(
        means, opac_raw, pd0
    )
    assert np.isfinite(np.asarray(g_means)).all()
    assert float(jnp.sum(jnp.abs(g_means))) > 0
    assert float(jnp.sum(jnp.abs(g_pd))) > 0

    # FD check on opacity (smooth everywhere)
    eps = 1e-3
    for i in range(2):
        e = jnp.zeros(2).at[i].set(eps)
        fd = (loss(means, opac_raw + e, pd0) - loss(means, opac_raw - e, pd0)) / (
            2 * eps
        )
        np.testing.assert_allclose(float(g_opa[i]), float(fd), rtol=2e-2, atol=1e-6)

    # FD check on the densify tap (x of splat 0)
    e = jnp.zeros((2, 2)).at[0, 0].set(eps)
    fd = (loss(means, opac_raw, pd0 + e) - loss(means, opac_raw, pd0 - e)) / (
        2 * eps
    )
    np.testing.assert_allclose(float(g_pd[0, 0]), float(fd), rtol=5e-2, atol=1e-7)
