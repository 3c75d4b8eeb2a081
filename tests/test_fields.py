import jax
import jax.numpy as jnp
import numpy as np
import pytest

from gssdf_tpu.fields.hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    init_hashgrid,
)
from gssdf_tpu.fields.mlp import init_mlp, mlp_apply
from gssdf_tpu.fields.occupancy import (
    build_occupancy_grid,
    occupied_voxel_centers,
    raymarch,
    valid_mask,
)
from gssdf_tpu.fields.sampling import RayBatch, sample_points
from gssdf_tpu.fields.sdf_field import (
    MapGeometry,
    SDFFieldSpec,
    init_sdf_field,
    sdf_apply,
    sdf_gradient_autodiff,
    sdf_gradient_numerical,
    sdf_only,
)

SMALL = HashGridSpec(
    n_levels=4, n_features_per_level=2, log2_hashmap_size=12, base_resolution=4
)


def test_hashgrid_shapes_and_determinism():
    key = jax.random.PRNGKey(0)
    table = init_hashgrid(key, SMALL)
    x = jax.random.uniform(jax.random.PRNGKey(1), (17, 3))
    f1 = hashgrid_encode(table, x, SMALL)
    f2 = hashgrid_encode(table, x, SMALL)
    assert f1.shape == (17, SMALL.out_dim)
    np.testing.assert_array_equal(f1, f2)


def test_hashgrid_interpolation_is_trilinear():
    """On a single dense level, encoding must reproduce exact trilinear
    interpolation of the corner features."""
    spec = HashGridSpec(
        n_levels=1, n_features_per_level=1, log2_hashmap_size=12, base_resolution=2
    )
    table = init_hashgrid(jax.random.PRNGKey(0), spec)
    # query exactly at a grid point: feature = table value there
    res = 2
    x = jnp.array([[0.5, 0.5, 0.5]])  # grid point (1,1,1) at res 2
    f = hashgrid_encode(table, x, spec)
    side = res + 1
    idx = (1 * side + 1) * side + 1
    np.testing.assert_allclose(f[0, 0], table[idx, 0], rtol=1e-5)
    # midpoint between two grid points along z
    x = jnp.array([[0.5, 0.5, 0.75]])
    f = hashgrid_encode(table, x, spec)
    i0 = (1 * side + 1) * side + 1
    i1 = (1 * side + 1) * side + 2
    np.testing.assert_allclose(
        f[0, 0], 0.5 * (table[i0, 0] + table[i1, 0]), rtol=1e-5
    )


def test_hashgrid_continuity():
    """Feature field must be continuous across cell boundaries."""
    table = init_hashgrid(jax.random.PRNGKey(3), SMALL)
    eps = 1e-5
    for p in [0.25, 0.5, 0.3333]:
        a = hashgrid_encode(table, jnp.array([[p - eps, 0.4, 0.6]]), SMALL)
        b = hashgrid_encode(table, jnp.array([[p + eps, 0.4, 0.6]]), SMALL)
        np.testing.assert_allclose(a, b, atol=1e-3)


def test_hashgrid_gradients_flow_to_table():
    table = init_hashgrid(jax.random.PRNGKey(0), SMALL)
    x = jax.random.uniform(jax.random.PRNGKey(1), (8, 3))

    def loss(t):
        return jnp.sum(hashgrid_encode(t, x, SMALL) ** 2)

    g = jax.grad(loss)(table)
    assert g.shape == table.shape
    assert np.isfinite(np.asarray(g)).all()
    assert float(jnp.sum(jnp.abs(g))) > 0


def test_mlp_matches_manual():
    params = init_mlp(jax.random.PRNGKey(0), 8, 16, 2, 1)
    x = jax.random.normal(jax.random.PRNGKey(1), (4, 8))
    out = mlp_apply(params, x)
    h = np.maximum(np.asarray(x) @ np.asarray(params["w"][0]) + np.asarray(params["b"][0]), 0)
    h = np.maximum(h @ np.asarray(params["w"][1]) + np.asarray(params["b"][1]), 0)
    ref = h @ np.asarray(params["w"][2]) + np.asarray(params["b"][2])
    np.testing.assert_allclose(np.asarray(out), ref, rtol=1e-4, atol=1e-5)


GEOM = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=4.0)
FSPEC = SDFFieldSpec(grid=SMALL, hidden_dim=16, geo_num_layer=1)


def test_sdf_apply_shapes():
    params = init_sdf_field(jax.random.PRNGKey(0), FSPEC)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-1, maxval=1)
    sdf, isig = sdf_apply(params, xyz, GEOM, FSPEC)
    assert sdf.shape == (32, 1) and isig.shape == (32, 1)
    assert bool(jnp.all(isig >= 1.0))


def test_gradient_numerical_vs_autodiff():
    params = init_sdf_field(jax.random.PRNGKey(0), FSPEC)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.5, maxval=0.5)
    g_num, h_num = sdf_gradient_numerical(
        params, xyz, GEOM, FSPEC, delta=1e-3, with_hessian=True
    )
    g_ad, h_ad = sdf_gradient_autodiff(params, xyz, GEOM, FSPEC, with_hessian=True)
    # hash grid is piecewise trilinear; FD with small delta ~ analytic a.e.
    np.testing.assert_allclose(np.asarray(g_num), np.asarray(g_ad), atol=2e-2)
    assert h_num.shape == (64, 3) and h_ad.shape == (64, 3)


def test_fused_grad_matches_autodiff():
    """sdf_apply_with_grad's shared-gather analytic gradient == autodiff."""
    from gssdf_tpu.fields.sdf_field import sdf_apply_with_grad

    params = init_sdf_field(jax.random.PRNGKey(0), FSPEC)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (64, 3), minval=-0.5, maxval=0.5)
    sdf_f, isig_f, g_f, h_f = sdf_apply_with_grad(
        params, xyz, GEOM, FSPEC, with_hessian=True
    )
    sdf, isig = sdf_apply(params, xyz, GEOM, FSPEC)
    np.testing.assert_allclose(np.asarray(sdf_f), np.asarray(sdf), atol=1e-6)
    np.testing.assert_allclose(np.asarray(isig_f), np.asarray(isig), atol=1e-6)
    g_ad, _ = sdf_gradient_autodiff(params, xyz, GEOM, FSPEC)
    np.testing.assert_allclose(np.asarray(g_f), np.asarray(g_ad), atol=1e-5)
    # diag Hessian vs exact per-axis autodiff double-jvp
    def f(x):
        return sdf_apply(params, x, GEOM, FSPEC)[0][..., 0]

    h_cols = []
    for i in range(3):
        e = jnp.zeros_like(xyz).at[:, i].set(1.0)
        inner = lambda x: jax.jvp(f, (x,), (e,))[1]
        h_cols.append(jax.jvp(inner, (xyz,), (e,))[1])
    h_ref = jnp.stack(h_cols, axis=-1)
    np.testing.assert_allclose(np.asarray(h_f), np.asarray(h_ref), atol=1e-4)


def test_fused_grad_table_cotangent_matches_autodiff():
    """Training gradients wrt the hash table through the fused eikonal path
    must equal the pure-autodiff double-backward."""
    from gssdf_tpu.fields.sdf_field import sdf_apply_with_grad

    params = init_sdf_field(jax.random.PRNGKey(0), FSPEC)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (32, 3), minval=-0.5, maxval=0.5)

    def eik_fused(p):
        _, _, g, _ = sdf_apply_with_grad(p, xyz, GEOM, FSPEC)
        return jnp.mean(jnp.square(jnp.linalg.norm(g, axis=-1) - 1.0))

    def eik_ad(p):
        g, _ = sdf_gradient_autodiff(p, xyz, GEOM, FSPEC)
        return jnp.mean(jnp.square(jnp.linalg.norm(g, axis=-1) - 1.0))

    gt_f = jax.grad(eik_fused)(params)
    gt_a = jax.grad(eik_ad)(params)
    np.testing.assert_allclose(
        np.asarray(gt_f["table"]), np.asarray(gt_a["table"]), atol=1e-5
    )
    for a, b in zip(
        jax.tree_util.tree_leaves(gt_f["decoder"]),
        jax.tree_util.tree_leaves(gt_a["decoder"]),
    ):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-5)


def test_fused_grad_detach_positions():
    """detach_grad_positions: grad wrt xyz of the eikonal term is zero; the
    value path keeps its xyz gradient."""
    from gssdf_tpu.fields.sdf_field import sdf_apply_with_grad

    params = init_sdf_field(jax.random.PRNGKey(0), FSPEC)
    xyz = jax.random.uniform(jax.random.PRNGKey(1), (16, 3), minval=-0.5, maxval=0.5)

    def eik(x):
        _, _, g, _ = sdf_apply_with_grad(
            params, x, GEOM, FSPEC, detach_grad_positions=True
        )
        return jnp.sum(jnp.square(g))

    gx = jax.grad(eik)(xyz)
    np.testing.assert_allclose(np.asarray(gx), 0.0, atol=1e-12)

    def val(x):
        s, _, _, _ = sdf_apply_with_grad(
            params, x, GEOM, FSPEC, detach_grad_positions=True
        )
        return jnp.sum(s)

    gv = jax.grad(val)(xyz)
    assert float(jnp.max(jnp.abs(gv))) > 0.0


def test_map_geometry_roundtrip():
    xyz = jnp.array([[0.3, -0.7, 1.1]])
    z = GEOM.xyz_to_zp1(xyz)
    np.testing.assert_allclose(np.asarray(GEOM.zp1_to_xyz(z)), np.asarray(xyz), atol=1e-6)
    m = GEOM.xyz_to_m1p1(xyz)
    np.testing.assert_allclose(np.asarray(GEOM.m1p1_to_xyz(m)), np.asarray(xyz), atol=1e-6)


def test_occupancy_build_and_query():
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=3.2)
    pts = np.array([[0.0, 0.0, 0.0], [1.0, 1.0, 1.0]])
    grid = build_occupancy_grid(pts, geom, resolution=32, dilate=True)
    # the point itself is occupied
    occ = valid_mask(grid, jnp.asarray(pts, dtype=jnp.float32))
    assert bool(jnp.all(occ))
    # one voxel away (0.1m) is occupied via dilation
    occ = valid_mask(grid, jnp.array([[0.1, 0.0, 0.0]]))
    assert bool(occ[0])
    # far away is not
    occ = valid_mask(grid, jnp.array([[-1.4, -1.4, -1.4]]))
    assert not bool(occ[0])
    # out of cube is not
    occ = valid_mask(grid, jnp.array([[10.0, 0.0, 0.0]]))
    assert not bool(occ[0])


def test_occupied_voxel_centers():
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=3.2)
    pts = np.array([[0.05, 0.05, 0.05]])
    grid = build_occupancy_grid(pts, geom, resolution=32, dilate=False)
    centers = occupied_voxel_centers(grid)
    assert centers.shape == (1, 3)
    np.testing.assert_allclose(centers[0], [0.05, 0.05, 0.05], atol=0.06)


def test_raymarch_hits_wall():
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=3.2)
    # wall of points at x = 1.0 (y,z in [-0.5, 0.5])
    ys, zs = np.meshgrid(np.linspace(-0.5, 0.5, 30), np.linspace(-0.5, 0.5, 30))
    wall = np.stack([np.ones(ys.size), ys.ravel(), zs.ravel()], -1)
    grid = build_occupancy_grid(wall, geom, resolution=32, dilate=True)

    origins = jnp.array([[-0.5, 0.0, 0.0]])
    dirs = jnp.array([[1.0, 0.0, 0.0]])
    depth = jnp.array([[1.5]])  # hit at x=1.0
    t, mask = raymarch(
        grid, origins, dirs, depth, jax.random.PRNGKey(0), max_steps=64, max_hits=8
    )
    assert bool(jnp.any(mask))
    hit_ts = np.asarray(t)[np.asarray(mask)]
    # occupied voxels are x in [1.0 +- dilation]; ray from -0.5 -> t ~ 1.4-1.6
    assert hit_ts.min() > 1.2 and hit_ts.max() < 1.5 + 1e-6


def test_sample_points_supervision_signs():
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=3.2)
    ys, zs = np.meshgrid(np.linspace(-0.5, 0.5, 30), np.linspace(-0.5, 0.5, 30))
    wall = np.stack([np.ones(ys.size), ys.ravel(), zs.ravel()], -1)
    grid = build_occupancy_grid(wall, geom, resolution=32, dilate=True)

    n = 16
    origins = jnp.tile(jnp.array([[-0.5, 0.0, 0.0]]), (n, 1))
    dirs = jnp.tile(jnp.array([[1.0, 0.0, 0.0]]), (n, 1))
    depth = jnp.full((n, 1), 1.5)
    rays = RayBatch(origins, dirs, depth, origins + dirs * depth)
    s = sample_points(
        rays,
        grid,
        geom,
        jax.random.PRNGKey(0),
        surface_sample_num=3,
        free_sample_num=3,
        max_hits=8,
        max_steps=64,
        sample_std=0.05,
        truncated_dis=0.15,
        inner_half_extent=1.6,
    )
    S = 8 + 3 + 3 + 1
    assert s.xyz.shape == (n * S, 3)
    assert s.mask.shape == (n * S,)
    m = np.asarray(s.mask)
    sdf = np.asarray(s.ray_sdf)[m]
    assert np.abs(sdf).max() <= 0.15 + 1e-6
    # free samples in front of surface have positive ray_sdf
    assert (sdf > 0).sum() > 0
    # endpoint samples have sdf == 0
    assert np.isclose(np.abs(sdf).min(), 0.0, atol=0.15)
