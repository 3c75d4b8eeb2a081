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


def _ctree(t):
    """Deep-copy a pytree: the train steps donate their state argument."""
    return jax.tree_util.tree_map(jnp.array, t)


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
    p1, o1, aux1 = single(_ctree(params), _ctree(opt), o, d, t, key,
                          0.05, 1e-3)

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
        _ctree(state), gt_s, poses_s, o_s, d_s, t_s, jax.random.PRNGKey(2),
        0.05, 1e-4, 1.6e-4, 0, False, False, None,
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


def _gs_setup(gs_sdf_reg, num_train=8):
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
        num_train_data=num_train,
        gs_iter_step=100,
        gs_sdf_reg=gs_sdf_reg,
        refine_start_iter=2,
        refine_every=4,
        reset_every=40,
    )
    geom = MapGeometry(origin=(0.0, 0.0, 2.0), map_size=4.0)
    pts = np.random.RandomState(0).uniform(-1, 1, (200, 3)).astype(np.float32)
    pts[:, 2] += 2.0
    grid = build_occupancy_grid(pts, geom, 32)
    key = jax.random.PRNGKey(0)
    n = 32
    model = build_splat_model(
        key, jnp.asarray(pts[:n]), jnp.full((n, 3), np.log(0.05)),
        jnp.tile(jnp.array([[1.0, 0, 0, 0]]), (n, 1)),
        jnp.full((n,), logit(0.5)), 0, 64,
    )
    state = gs_state_init(init_sdf_field(key, field), model)
    return spec, geom, grid, cam, state, W, H


def test_multicam_step_matches_single_cam():
    """A B=2 multicam step on the SAME frame twice == one single-cam step:
    losses and gradients average over cameras, so duplicated inputs must
    yield the identical Adam update (gs_sdf_reg off for determinism — the
    per-camera disk-sample keys only enter through that regularizer)."""
    from gssdf_tpu.train.gs import make_gs_train_step

    spec, geom, grid, cam, state, W, H = _gs_setup(gs_sdf_reg=False)
    gt = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3)
    pose = jnp.eye(4, dtype=jnp.float32)
    r = spec.sdf.batch_rays
    rays = (
        jnp.zeros((r, 3)),
        jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1)),
        jnp.full((r, 1), 2.0),
    )
    key = jax.random.PRNGKey(3)

    single = make_gs_train_step(spec, geom, grid, cam)
    s1, aux1 = single(
        _ctree(state), gt, pose, *rays, key, 0.05, 1e-4, 1.6e-4, 0,
        False, False,
        None,
    )

    multi = make_multicam_gs_train_step(spec, geom, grid, cam, mesh=None)
    gt_b = jnp.stack([gt, gt])
    pose_b = jnp.stack([pose, pose])
    s2, aux2 = multi(
        _ctree(state), gt_b, pose_b, *rays, key, 0.05, 1e-4, 1.6e-4, 0,
        False,
        False, None,
    )
    np.testing.assert_allclose(
        float(aux1["gs_loss"]), float(aux2["gs_loss"]), rtol=1e-6
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(
            np.asarray(a), np.asarray(b), atol=1e-6
        )


def test_multicam_matches_single_with_gs_sdf_reg():
    """B=1 multicam step vs the single-device step with the FULL joint
    regularizer on (fused analytic gs-eikonal + gs_align + gs_sdf budget
    compaction): key derivation is aligned so the two implementations must
    produce identical losses, aux terms, and parameter updates. Guards the
    semantic gap where a --mesh run trained different math than a
    single-chip run (reference: neural_mapping.cpp:420-462)."""
    import dataclasses

    from gssdf_tpu.train.gs import make_gs_train_step

    spec, geom, grid, cam, state, W, H = _gs_setup(gs_sdf_reg=True)
    spec = dataclasses.replace(
        spec,
        sdf=dataclasses.replace(
            spec.sdf, align_weight=0.1, eikonal_weight=0.1,
            numerical_grad=False,
        ),
        gs_sdf_budget=16,
        gs_sdf_weight=1e-3,
    )
    gt = jnp.linspace(0, 1, H * W * 3).reshape(H, W, 3)
    pose = jnp.eye(4, dtype=jnp.float32)
    r = spec.sdf.batch_rays
    rays = (
        jnp.zeros((r, 3)),
        jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1)),
        jnp.full((r, 1), 2.0),
    )
    key = jax.random.PRNGKey(7)

    single = make_gs_train_step(spec, geom, grid, cam)
    s1, aux1 = single(
        _ctree(state), gt, pose, *rays, key, 0.05, 1e-4, 1.6e-4, 0,
        False, False, None,
    )
    multi = make_multicam_gs_train_step(spec, geom, grid, cam, mesh=None)
    s2, aux2 = multi(
        _ctree(state), gt[None], pose[None], *rays, key, 0.05, 1e-4,
        1.6e-4, 0, False, False, None,
    )

    for k in ("loss", "gs_loss", "sdf_nn", "gs_sdf", "gs_eik", "gs_align"):
        assert k in aux1, f"single step aux missing {k}"
        assert k in aux2, f"multicam step aux missing {k}"
        np.testing.assert_allclose(
            float(aux1[k]), float(aux2[k]), rtol=1e-5, atol=1e-7, err_msg=k
        )
    for a, b in zip(
        jax.tree_util.tree_leaves(s1.params),
        jax.tree_util.tree_leaves(s2.params),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)


def test_sharded_multistep_train_with_refine():
    """Multi-step sharded joint training incl. refine + opacity-reset events
    on the replicated state: alive set changes, everything stays finite and
    replicated."""
    from gssdf_tpu.train.gs import GSTrainer

    spec, geom, grid, cam, state, W, H = _gs_setup(gs_sdf_reg=True)
    mesh = make_mesh()
    trainer = GSTrainer(spec, geom, grid, cam, mesh=mesh)
    assert trainer.batch == 8

    state = replicate(mesh, state)
    b = trainer.batch
    rng = np.random.RandomState(1)
    r = spec.sdf.batch_rays
    alive0 = int(jnp.sum(state.alive))

    key = jax.random.PRNGKey(9)
    fired = set()
    for i in range(0, 48, b):
        key, k1, k2 = jax.random.split(key, 3)
        gt = jnp.asarray(rng.uniform(0, 1, (b, H, W, 3)), jnp.float32)
        poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
        o = jnp.asarray(rng.uniform(-0.2, 0.2, (r, 3)), jnp.float32)
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
        t = jnp.full((r, 1), 2.0)
        gt_s, poses_s = shard_batch(mesh, (gt, poses))
        o_s, d_s, t_s = shard_batch(mesh, (o, d, t))
        state, aux = trainer.step_fn(
            state, gt_s, poses_s, o_s, d_s, t_s, k1,
            0.05, 1e-4, 1.6e-4, 0, True, False, None,
        )
        assert np.isfinite(float(aux["loss"])), i
        state, info = trainer.callback(state, i, k2, stride=b)
        fired.update(info.keys())

    assert "n_grow" in fired or "n_dup" in fired or len(fired) > 0, fired
    alive1 = int(jnp.sum(state.alive))
    assert alive1 != alive0 or "opacity_reset" in fired
    for leaf in jax.tree_util.tree_leaves(state.params):
        assert np.isfinite(np.asarray(leaf)).all()


def test_sharded_rebucket_grows_and_keeps_training():
    """Capacity re-bucketing under the mesh: the re-replicated state must
    keep training through the sharded step at the grown shape."""
    import dataclasses

    from gssdf_tpu.train.gs import GSTrainer

    spec, geom, grid, cam, state, W, H = _gs_setup(gs_sdf_reg=False)
    spec = dataclasses.replace(
        spec,
        # 32 alive / 64 capacity starts BELOW 0.6: growth causes the event
        rebucket_sat=0.6,
        refine_start_iter=1,
        refine_every=2,
        reset_every=10**6,
        refine=RefineSpec(grow_grad2d=1e-12, grow_scale3d=1e-12),
    )
    mesh = make_mesh()
    trainer = GSTrainer(spec, geom, grid, cam, mesh=mesh)
    state = replicate(mesh, state)
    b = trainer.batch
    r = spec.sdf.batch_rays
    rng = np.random.RandomState(2)

    key = jax.random.PRNGKey(5)
    grew = 0
    for i in range(1, 33, b):
        key, k1, k2 = jax.random.split(key, 3)
        gt = jnp.asarray(rng.uniform(0, 1, (b, H, W, 3)), jnp.float32)
        poses = jnp.tile(jnp.eye(4, dtype=jnp.float32)[None], (b, 1, 1))
        o = jnp.zeros((r, 3))
        d = jnp.tile(jnp.array([[0.0, 0.0, 1.0]]), (r, 1))
        t = jnp.full((r, 1), 2.0)
        gt_s, poses_s = shard_batch(mesh, (gt, poses))
        o_s, d_s, t_s = shard_batch(mesh, (o, d, t))
        state, aux = trainer.step_fn(
            state, gt_s, poses_s, o_s, d_s, t_s, k1,
            0.05, 0.0, 1.6e-4, 0, True, False, None,
        )
        assert np.isfinite(float(aux["loss"])), i
        if grew:
            break                    # one post-rebucket sharded step passed
        state, info = trainer.callback(state, i, k2, stride=b)
        grew = info.get("rebucket", 0)

    assert grew > 64, grew                   # quantum scales to the store
    assert state.alive.shape[0] == grew
