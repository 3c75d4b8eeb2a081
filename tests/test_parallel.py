"""Sharded training over a virtual 8-device CPU mesh (conftest forces it)."""

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
)
from gssdf_tpu.gs.model import build_splat_model
from gssdf_tpu.gs.render import RenderSettings
from gssdf_tpu.parallel.mesh import make_mesh, replicate, shard_batch
from gssdf_tpu.parallel.train import (
    make_multicam_gs_train_step,
    make_sharded_sdf_train_step,
)
from gssdf_tpu.sensors.cameras import Camera
from gssdf_tpu.train.gs import GSTrainSpec, RefineSpec, gs_state_init
from gssdf_tpu.train.optim import adam_init
from gssdf_tpu.train.sdf import SDFTrainSpec, make_sdf_train_step
from gssdf_tpu.utils.math import logit


def _field_spec():
    return SDFFieldSpec(
        grid=HashGridSpec(
            n_levels=2, n_features_per_level=2, log2_hashmap_size=10,
            base_resolution=8, per_level_scale=2.0,
        ),
        hidden_dim=16,
        geo_num_layer=2,
    )


def test_mesh_has_8_devices():
    mesh = make_mesh()
    assert mesh.devices.size == 8


def test_sharded_sdf_step_matches_single_device():
    field = _field_spec()
    spec = SDFTrainSpec(
        field=field, batch_rays=64, max_hits=4, max_steps=32,
        inner_half_extent=2.0, align_weight=0.0, numerical_grad=True,
    )
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=4.0)
    pts = np.random.RandomState(0).uniform(-1, 1, (500, 3)).astype(np.float32)
    grid = build_occupancy_grid(pts, geom, 32)

    params = init_sdf_field(jax.random.PRNGKey(0), field)
    opt = adam_init(params)

    key = jax.random.PRNGKey(1)
    o = jnp.zeros((64, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (64, 1))
    t = jnp.full((64, 1), 1.0)

    single = make_sdf_train_step(spec, geom, grid)
    p1, o1, aux1 = single(params, opt, o, d, t, key, 0.05, 1e-3)

    mesh = make_mesh()
    sharded = make_sharded_sdf_train_step(spec, geom, grid, mesh)
    params_r = replicate(mesh, params)
    opt_r = replicate(mesh, opt)
    o_s, d_s, t_s = shard_batch(mesh, (o, d, t))
    p2, o2, aux2 = sharded(params_r, opt_r, o_s, d_s, t_s, key, 0.05, 1e-3)

    np.testing.assert_allclose(
        float(aux1["loss"]), float(aux2["loss"]), rtol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(p1), jax.tree_util.tree_leaves(p2)
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_multicam_gs_step_sharded():
    """8 cameras sharded over 8 devices; one joint step runs and is finite."""
    W = H = 32
    cam = Camera(fx=40.0, fy=40.0, cx=W / 2, cy=H / 2, width=W, height=H)
    field = _field_spec()
    sdf_spec = SDFTrainSpec(
        field=field, batch_rays=64, max_hits=2, max_steps=32,
        inner_half_extent=2.0, align_weight=0.0,
    )
    spec = GSTrainSpec(
        sdf=sdf_spec,
        render=RenderSettings(width=W, height=H, tile_cap=32, tile_expand=8),
        refine=RefineSpec(),
        num_train_data=8,
        gs_iter_step=10,
    )
    geom = MapGeometry(origin=(0.0, 0.0, 2.0), map_size=4.0)
    pts = np.random.RandomState(0).uniform(-1, 1, (200, 3)).astype(np.float32)
    pts[:, 2] += 2.0
    grid = build_occupancy_grid(pts, geom, 32)

    key = jax.random.PRNGKey(0)
    n = 32
    anchors = jnp.asarray(pts[:n])
    model = build_splat_model(
        key,
        anchors,
        jnp.full((n, 3), np.log(0.05)),
        jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        jnp.full((n,), logit(0.5)),
        0,
        64,
    )
    state = gs_state_init(init_sdf_field(key, field), model)

    mesh = make_mesh()
    step = make_multicam_gs_train_step(spec, geom, grid, cam, mesh)

    b = 8
    gt = jnp.zeros((b, H, W, 3))
    poses = jnp.tile(jnp.eye(4)[None], (b, 1, 1))
    r = sdf_spec.batch_rays
    o = jnp.zeros((r, 3))
    d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
    t = jnp.full((r, 1), 2.0)

    state = jax.device_put(state, jax.sharding.NamedSharding(
        mesh, jax.sharding.PartitionSpec()))
    gt_s, poses_s = shard_batch(mesh, (gt, poses))
    o_s, d_s, t_s = shard_batch(mesh, (o, d, t))

    state2, aux = step(
        state, gt_s, poses_s, o_s, d_s, t_s, jax.random.PRNGKey(2),
        0.05, 1e-4, 1.6e-4, 0, False,
    )
    for k, v in aux.items():
        assert np.isfinite(np.asarray(v)).all(), k
    # params actually moved
    moved = sum(
        float(jnp.sum(jnp.abs(a - b)))
        for a, b in zip(
            jax.tree_util.tree_leaves(state.params),
            jax.tree_util.tree_leaves(state2.params),
        )
    )
    assert moved > 0
