"""extract_mesh unit tests: analytic-sphere SDF through the slab extractor,
exercising both the on-device triangle compaction path and the dense
fallback (forced overflow), plus the occupancy valid-mask suppression.

Reference analog: LocalMap::meshing_ (local_map.cpp:329-447).
"""

import dataclasses

import jax.numpy as jnp
import numpy as np
import pytest

import gssdf_tpu.fields.meshing as meshing
from gssdf_tpu.fields.meshing import extract_mesh
from gssdf_tpu.fields.occupancy import build_occupancy_grid
from gssdf_tpu.fields.sdf_field import MapGeometry, SDFFieldSpec

RADIUS = 0.55


def _sphere_sdf(params, pts, geom, spec):
    d = jnp.linalg.norm(pts, axis=-1, keepdims=True) - RADIUS
    return d, jnp.ones_like(d)


def _sphere_grad(params, pts, geom, spec, delta, with_hessian=False):
    n = pts / jnp.maximum(
        jnp.linalg.norm(pts, axis=-1, keepdims=True), 1e-9
    )
    return n, None


@pytest.fixture()
def sphere_env(monkeypatch):
    monkeypatch.setattr(meshing, "sdf_apply", _sphere_sdf)
    monkeypatch.setattr(meshing, "sdf_gradient_numerical", _sphere_grad)
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=2.0)
    # fully-observed occupancy: points at every voxel center of a 32-grid
    n = 32
    ax = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    grid = build_occupancy_grid(pts, geom, n)
    return geom, grid


def test_sphere_extraction_compact_path(sphere_env):
    geom, grid = sphere_env
    verts, faces, colors = extract_mesh(
        None, geom, SDFFieldSpec(), grid, resolution=0.05, slab_voxels=8
    )
    assert len(verts) > 0 and len(faces) > 0
    r = np.linalg.norm(verts, axis=-1)
    # all vertices on the analytic sphere to within a voxel
    assert r.min() > RADIUS - 0.05 and r.max() < RADIUS + 0.05
    assert colors.shape == verts.shape
    assert np.isfinite(colors).all()


def test_overflow_fallback_matches_compact(sphere_env, monkeypatch):
    """With the on-device cap forced below the per-slab triangle count,
    every surface slab takes the dense-pull fallback; the mesh must match
    the compacted path exactly."""
    geom, grid = sphere_env
    kwargs = dict(resolution=0.05, slab_voxels=8, with_colors=False)
    v1, f1, _ = extract_mesh(None, geom, SDFFieldSpec(), grid, **kwargs)
    assert len(v1) > 0

    monkeypatch.setattr(meshing, "_TRI_CAP", 64)
    v2, f2, _ = extract_mesh(None, geom, SDFFieldSpec(), grid, **kwargs)
    assert len(v2) == len(v1) and len(f2) == len(f1)
    assert np.allclose(
        np.sort(v1.ravel()), np.sort(v2.ravel()), atol=1e-6
    )


def test_y_banded_matches_unbanded(sphere_env, monkeypatch):
    """Reference-resolution exports exceed the per-call marching cell
    budget in a single x-layer and take the y-banded recursion
    (DIAGNOSIS: a 409,600-cell slab compiled to a 16.94 GB program). The
    banded mesh must cover the same surface: identical triangle count up
    to the band-seam duplicates, same sphere fit."""
    geom, grid = sphere_env
    kwargs = dict(resolution=0.05, slab_voxels=8, with_colors=False)
    v1, f1, _ = extract_mesh(None, geom, SDFFieldSpec(), grid, **kwargs)
    assert len(v1) > 0

    # force banding: one x-layer at res 0.05 has 40*40=1600 cells
    monkeypatch.setattr(meshing, "_CELL_BUDGET", 400)
    v2, f2, _ = extract_mesh(None, geom, SDFFieldSpec(), grid, **kwargs)
    assert len(f2) == len(f1)          # same triangles, re-welded per band
    r = np.linalg.norm(v2, axis=-1)
    assert r.min() > RADIUS - 0.05 and r.max() < RADIUS + 0.05
    # triangle-soup equality up to graze-point weld sensitivity: band
    # origins differ from the global grid by ~1 f64 ulp, which can flip
    # compact_mesh's quantized weld keys where the surface grazes a voxel
    # face (see the xs_all comment in extract_mesh) — a handful of
    # degenerate-boundary triangles may differ, never more
    def soup(v, f):
        return set(map(tuple, np.round(v[f].mean(1), 4)))
    s1, s2 = soup(v1, f1), soup(v2, f2)
    assert len(s1 ^ s2) <= max(4, len(f1) // 500), len(s1 ^ s2)


@pytest.fixture()
def shell_env(monkeypatch):
    """Occupancy observed only in a thin shell around the sphere surface, so
    per-slab valid counts are far below slab_elems — exercises the
    occupancy-compacted SDF eval branch when _BUCKET_CAP is forced low."""
    monkeypatch.setattr(meshing, "sdf_apply", _sphere_sdf)
    monkeypatch.setattr(meshing, "sdf_gradient_numerical", _sphere_grad)
    geom = MapGeometry(origin=(0.0, 0.0, 0.0), map_size=2.0)
    n = 32
    ax = (np.arange(n) + 0.5) / n * 2.0 - 1.0
    gx, gy, gz = np.meshgrid(ax, ax, ax, indexing="ij")
    pts = np.stack([gx, gy, gz], -1).reshape(-1, 3)
    d = np.abs(np.linalg.norm(pts, axis=-1) - RADIUS)
    grid = build_occupancy_grid(pts[d < 0.12], geom, n)
    return geom, grid


def test_compacted_eval_matches_dense(shell_env, monkeypatch):
    """Force bucket < slab_elems with per-slab valid counts under the bucket:
    the compacted-gather SDF eval must reproduce the dense-eval mesh."""
    geom, grid = shell_env
    kwargs = dict(resolution=0.05, slab_voxels=8, with_colors=False)
    v1, f1, _ = extract_mesh(None, geom, SDFFieldSpec(), grid, **kwargs)
    assert len(v1) > 0

    # slab_elems = 8 * 41 * 41 = 13448; shell valid counts are ~1-3k/slab
    monkeypatch.setattr(meshing, "_BUCKET_CAP", 8192)
    v2, f2, _ = extract_mesh(None, geom, SDFFieldSpec(), grid, **kwargs)
    assert len(v2) == len(v1) and len(f2) == len(f1)
    assert np.allclose(np.sort(v1.ravel()), np.sort(v2.ravel()), atol=1e-6)


def test_nv_overflow_dense_redo(sphere_env, monkeypatch):
    """Fully-observed occupancy with bucket forced below slab_elems: every
    slab's valid count overflows the bucket, so each is redone via the dense
    fallback — which must match the default (dense-eval) path exactly."""
    geom, grid = sphere_env
    kwargs = dict(resolution=0.05, slab_voxels=8, with_colors=False)
    v1, f1, _ = extract_mesh(None, geom, SDFFieldSpec(), grid, **kwargs)
    assert len(v1) > 0

    monkeypatch.setattr(meshing, "_BUCKET_CAP", 4096)
    v2, f2, _ = extract_mesh(None, geom, SDFFieldSpec(), grid, **kwargs)
    assert len(v2) == len(v1) and len(f2) == len(f1)
    assert np.allclose(np.sort(v1.ravel()), np.sort(v2.ravel()), atol=1e-6)


def test_unobserved_space_emits_nothing(sphere_env):
    geom, grid = sphere_env
    empty = dataclasses.replace(
        grid,
        packed=jnp.zeros_like(grid.packed),
        packed_core=jnp.zeros_like(grid.packed_core),
        packed_coarse=jnp.zeros_like(grid.packed_coarse),
    )
    verts, faces, _ = extract_mesh(
        None, geom, SDFFieldSpec(), empty, resolution=0.1, slab_voxels=8
    )
    assert len(verts) == 0 and len(faces) == 0
