"""End-to-end SDF fit on a synthetic sphere (CPU-runnable smoke test).

This is the test-pyramid stage (c) from SURVEY.md §4: a miniature of
BASELINE config 1 (depth-only SDF fit) with an analytic ground truth.
"""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssdf_tpu.fields.hashgrid import HashGridSpec
from gssdf_tpu.fields.occupancy import build_occupancy_grid
from gssdf_tpu.fields.sdf_field import (
    MapGeometry,
    SDFFieldSpec,
    init_sdf_field,
    sdf_apply,
)
from gssdf_tpu.train.optim import adam_init
from gssdf_tpu.train.sdf import SDFTrainSpec, make_sdf_train_step, pick_ray_batch

R_SPHERE = 0.5
R_ORIGIN = 1.2


def _make_scene(n_rays=4096, seed=0):
    rng = np.random.default_rng(seed)
    d = rng.normal(size=(n_rays, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    origins = d * R_ORIGIN
    dirs = -d  # pointing at the center
    depth = np.full((n_rays, 1), R_ORIGIN - R_SPHERE, dtype=np.float32)
    xyz = origins + dirs * depth
    return (
        jnp.asarray(origins, jnp.float32),
        jnp.asarray(dirs, jnp.float32),
        jnp.asarray(depth),
        xyz,
    )


@pytest.fixture(scope="module")
def trained():
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=2.56)
    origins, dirs, depth, xyz = _make_scene()
    grid = build_occupancy_grid(xyz, geom, resolution=64, dilate=True)

    fspec = SDFFieldSpec(
        grid=HashGridSpec(
            n_levels=6,
            n_features_per_level=2,
            log2_hashmap_size=15,
            base_resolution=8,
            per_level_scale=1.7,
        ),
        hidden_dim=32,
        geo_num_layer=1,
        bce_isigma=100.0,
    )
    spec = SDFTrainSpec(
        field=fspec,
        batch_rays=512,
        max_hits=6,
        max_steps=96,
        truncated_dis=0.12,
        inner_half_extent=1.28,
        eikonal_weight=0.1,
        align_weight=0.0,
        numerical_grad=False,
    )
    params = init_sdf_field(jax.random.PRNGKey(0), fspec)
    opt = adam_init(params)
    step = make_sdf_train_step(spec, geom, grid)

    pack = {"origin": origins, "direction": dirs, "depth": depth}
    key = jax.random.PRNGKey(1)
    sample_std = 0.01
    n_iter = 1500
    for i in range(n_iter):
        key, k1, k2 = jax.random.split(key, 3)
        ro, rd, rdep = pick_ray_batch(pack, k1, spec.batch_rays)
        lr = 5e-3 * (1 - i / n_iter) + 1e-4 * (i / n_iter)
        params, opt, aux = step(
            params, opt, ro, rd, rdep, k2, jnp.float32(sample_std), jnp.float32(lr)
        )
        sample_std = float(
            np.clip(1.0 / float(aux["isigma_mean"]), 0.01, 0.12)
        )
    return params, geom, fspec, aux


def test_loss_finite(trained):
    _, _, _, aux = trained
    assert np.isfinite(float(aux["loss"]))


def test_sdf_sign_structure(trained):
    params, geom, fspec, _ = trained
    rng = np.random.default_rng(3)
    d = rng.normal(size=(256, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    surf, _ = sdf_apply(params, jnp.asarray(d * R_SPHERE, jnp.float32), geom, fspec)
    out, _ = sdf_apply(params, jnp.asarray(d * 0.62, jnp.float32), geom, fspec)
    inn, _ = sdf_apply(params, jnp.asarray(d * 0.40, jnp.float32), geom, fspec)

    # near-surface values small
    assert float(jnp.mean(jnp.abs(surf))) < 0.04
    # outside positive, inside negative (vast majority)
    assert float(jnp.mean((out > 0).astype(jnp.float32))) > 0.9
    assert float(jnp.mean((inn < 0).astype(jnp.float32))) > 0.9


def test_surface_localization(trained):
    """Zero crossing along random rays lies at r=0.5 within 2 voxels."""
    params, geom, fspec, _ = trained
    rng = np.random.default_rng(4)
    d = rng.normal(size=(64, 3))
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    rs = np.linspace(0.3, 0.7, 81)
    pts = (d[:, None, :] * rs[None, :, None]).reshape(-1, 3)
    sdf, _ = sdf_apply(params, jnp.asarray(pts, jnp.float32), geom, fspec)
    sdf = np.asarray(sdf).reshape(64, 81)
    # first sign flip position per ray
    sign = np.sign(sdf)
    flips = np.abs(np.diff(sign, axis=1)) > 0
    est = []
    for i in range(64):
        idx = np.argwhere(flips[i])
        if idx.size:
            est.append(rs[idx[0, 0]])
    assert len(est) > 50
    err = np.abs(np.asarray(est) - R_SPHERE)
    assert np.median(err) < 0.04  # one voxel (leaf=0.04)
