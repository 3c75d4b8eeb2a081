"""Pallas tile-composite kernel parity (interpreter mode on CPU)."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

import gssdf_tpu.ops.pallas.raster as R
from gssdf_tpu.gs.projection import project_2dgs
from gssdf_tpu.gs.rasterize_tiled import rasterize_tiled

W, H = 96, 64
K = jnp.array([[80.0, 0, W / 2], [0, 80.0, H / 2], [0, 0, 1]], jnp.float32)
EYE4 = jnp.eye(4, dtype=jnp.float32)


@pytest.fixture(autouse=True)
def _interpret_mode():
    R._INTERPRET = True
    yield
    R._INTERPRET = False


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


def test_pallas_matches_xla_forward():
    scene = _scene()
    rx = _run("xla", *scene)
    rp = _run("pallas", *scene)
    for ch in ["color", "normal", "alpha", "depth", "median", "distort",
               "visibilities"]:
        np.testing.assert_allclose(
            np.asarray(rp[ch]), np.asarray(rx[ch]), atol=1e-5, err_msg=ch
        )


def test_pallas_gradients_match_xla():
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
