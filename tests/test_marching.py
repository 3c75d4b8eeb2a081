import jax.numpy as jnp
import numpy as np

from gssdf_tpu.ops.marching import compact_mesh, marching_tets


def _sphere_grid(n=33, r=0.35):
    xs = np.linspace(0, 1, n)
    gx, gy, gz = np.meshgrid(xs, xs, xs, indexing="ij")
    return np.sqrt((gx - 0.5) ** 2 + (gy - 0.5) ** 2 + (gz - 0.5) ** 2) - r


def test_sphere_surface():
    n, r = 33, 0.35
    sdf = _sphere_grid(n, r)
    tri, mask = marching_tets(jnp.asarray(sdf), 0.0)
    assert bool(jnp.any(mask))
    res = 1.0 / (n - 1)
    verts, faces = compact_mesh(np.asarray(tri), np.asarray(mask), [0, 0, 0], res)
    assert verts.shape[0] > 100 and faces.shape[0] > 100
    # every vertex lies on the sphere within a cell size
    d = np.abs(np.linalg.norm(verts - 0.5, axis=-1) - r)
    assert d.max() < 1.5 * res
    # total mesh area ~ 4 pi r^2
    v0 = verts[faces[:, 0]]
    v1 = verts[faces[:, 1]]
    v2 = verts[faces[:, 2]]
    area = 0.5 * np.linalg.norm(np.cross(v1 - v0, v2 - v0), axis=-1).sum()
    np.testing.assert_allclose(area, 4 * np.pi * r * r, rtol=0.05)


def test_orientation_outward():
    """Triangle normals point from inside (sdf<0) to outside."""
    n, r = 25, 0.3
    sdf = _sphere_grid(n, r)
    tri, mask = marching_tets(jnp.asarray(sdf), 0.0)
    res = 1.0 / (n - 1)
    verts, faces = compact_mesh(np.asarray(tri), np.asarray(mask), [0, 0, 0], res)
    v0, v1, v2 = verts[faces[:, 0]], verts[faces[:, 1]], verts[faces[:, 2]]
    nrm = np.cross(v1 - v0, v2 - v0)
    nrm /= np.clip(np.linalg.norm(nrm, axis=-1, keepdims=True), 1e-12, None)
    centers = (v0 + v1 + v2) / 3 - 0.5
    centers /= np.clip(np.linalg.norm(centers, axis=-1, keepdims=True), 1e-12, None)
    # consistent orientation: the dominant sign should cover ~all faces
    dots = np.sum(nrm * centers, axis=-1)
    frac_out = (dots > 0).mean()
    assert frac_out > 0.95 or frac_out < 0.05


def test_empty_field():
    sdf = np.ones((9, 9, 9), dtype=np.float32)
    tri, mask = marching_tets(jnp.asarray(sdf), 0.0)
    assert not bool(jnp.any(mask))
