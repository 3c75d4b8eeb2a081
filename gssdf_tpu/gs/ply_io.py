"""3DGS-compatible splat PLY export/import.

Reference analog: ``NeuralGS::export_gs_to_ply`` / ``load_ply_to_gs``
(neural_gaussian.cpp:928-1188): standard 3DGS property layout
``x, y, z, f_dc_0..2, f_rest_0..(3K-4), opacity, scale_0..2, rot_0..3`` so
dumps interoperate with 3DGS/2DGS viewers. Export materializes
xyz = anchor + offset; import reloads as anchors with zero offsets.
"""

from __future__ import annotations

import numpy as np

from ..utils.math import num_sh_bases
from ..utils.ply import read_ply, write_ply
from .model import SplatModel, SplatParams


def export_gs_ply(path, model: SplatModel) -> int:
    """Writes alive splats; returns count."""
    import jax.numpy as jnp

    alive = np.asarray(model.alive)
    p = model.params
    xyz = np.asarray(model.anchors + p.offsets)[alive]
    f_dc = np.asarray(p.features_dc)[alive]          # [N, 1, 3]
    f_rest = np.asarray(p.features_rest)[alive]      # [N, K-1, 3]
    opa = np.asarray(p.opacity)[alive]
    scale = np.asarray(p.scaling)[alive]
    rot = np.asarray(p.quaternion)[alive]

    n = xyz.shape[0]
    props = {
        "x": xyz[:, 0].astype(np.float32),
        "y": xyz[:, 1].astype(np.float32),
        "z": xyz[:, 2].astype(np.float32),
        "nx": np.zeros(n, np.float32),
        "ny": np.zeros(n, np.float32),
        "nz": np.zeros(n, np.float32),
    }
    # 3DGS stores SH channel-major: f_rest_k = rest[:, k % (K-1), k // (K-1)]
    # matching torch's flatten(start_dim=1) of [N, 3, K-1] transposed layout
    dc_t = f_dc.transpose(0, 2, 1).reshape(n, -1)      # [N, 3]
    rest_t = f_rest.transpose(0, 2, 1).reshape(n, -1)  # [N, 3*(K-1)]
    for i in range(dc_t.shape[1]):
        props[f"f_dc_{i}"] = dc_t[:, i].astype(np.float32)
    for i in range(rest_t.shape[1]):
        props[f"f_rest_{i}"] = rest_t[:, i].astype(np.float32)
    props["opacity"] = opa.astype(np.float32)
    for i in range(3):
        props[f"scale_{i}"] = scale[:, i].astype(np.float32)
    for i in range(4):
        props[f"rot_{i}"] = rot[:, i].astype(np.float32)
    write_ply(path, props)
    return n


def import_gs_ply(path, capacity: int | None = None) -> SplatModel:
    import jax.numpy as jnp

    d = read_ply(path)
    n = d["vertex.x"].shape[0]
    xyz = np.stack([d["vertex.x"], d["vertex.y"], d["vertex.z"]], -1)
    n_rest = len([k for k in d if k.startswith("vertex.f_rest_")])
    k_rest = n_rest // 3
    f_dc = np.stack([d[f"vertex.f_dc_{i}"] for i in range(3)], -1)[:, None, :]
    if k_rest:
        rest = np.stack(
            [d[f"vertex.f_rest_{i}"] for i in range(n_rest)], -1
        ).reshape(n, 3, k_rest).transpose(0, 2, 1)
    else:
        rest = np.zeros((n, 0, 3), np.float32)
    opa = d["vertex.opacity"]
    scale = np.stack([d[f"vertex.scale_{i}"] for i in range(3)], -1)
    rot = np.stack([d[f"vertex.rot_{i}"] for i in range(4)], -1)

    cap = capacity or n
    pad = cap - n
    assert pad >= 0

    def padded(x, fill=0.0):
        return np.concatenate(
            [x, np.full((pad,) + x.shape[1:], fill, x.dtype)]
        ) if pad else x

    params = SplatParams(
        offsets=jnp.zeros((cap, 3), jnp.float32),
        scaling=jnp.asarray(padded(scale.astype(np.float32), -10.0)),
        quaternion=jnp.asarray(
            np.concatenate(
                [rot.astype(np.float32),
                 np.tile(np.array([[1, 0, 0, 0]], np.float32), (pad, 1))]
            ) if pad else rot.astype(np.float32)
        ),
        opacity=jnp.asarray(padded(opa.astype(np.float32), -10.0)),
        features_dc=jnp.asarray(padded(f_dc.astype(np.float32))),
        features_rest=jnp.asarray(padded(rest.astype(np.float32))),
    )
    alive = np.zeros(cap, bool)
    alive[:n] = True
    return SplatModel(
        params=params,
        anchors=jnp.asarray(padded(xyz.astype(np.float32))),
        alive=jnp.asarray(alive),
    )
