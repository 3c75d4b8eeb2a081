"""Device mesh + sharding helpers.

The reference is strictly single-GPU (SURVEY.md §2.3) — this layer is the
TPU-native promotion of parallelism to a first-class subsystem: a 1-D
``data`` mesh over which ray batches (SDF phase) and cameras/pixel-tiles
(GS phase) are sharded, with parameters replicated and gradient all-reduce
inserted by the XLA SPMD partitioner over ICI.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    n_devices: Optional[int] = None, axis: str = "data"
) -> Mesh:
    """1-D data mesh. Multi-host (BASELINE.md config 5): device order comes
    from a hybrid (DCN hosts x ICI local) mesh so that neighboring mesh
    positions are ICI neighbors — the SPMD all-reduce then hierarchically
    reduces within each host over ICI before crossing DCN."""
    if n_devices is None and jax.process_count() > 1:
        from jax.experimental.mesh_utils import create_hybrid_device_mesh

        devs = create_hybrid_device_mesh(
            mesh_shape=(jax.local_device_count(),),
            dcn_mesh_shape=(jax.process_count(),),
        )
        return Mesh(devs.reshape(-1), (axis,))
    devs = jax.devices()
    if n_devices is not None:
        devs = devs[:n_devices]
    return Mesh(np.asarray(devs), (axis,))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def batch_sharded(mesh: Mesh, axis: str = "data") -> NamedSharding:
    """Shard the leading axis over the mesh."""
    return NamedSharding(mesh, P(axis))


def shard_batch(mesh: Mesh, tree, axis: str = "data"):
    """Place every leaf with its leading axis sharded over ``axis``."""
    s = batch_sharded(mesh, axis)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, s), tree)


def replicate(mesh: Mesh, tree):
    r = replicated(mesh)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, r), tree)
