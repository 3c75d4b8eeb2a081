"""Tiny geometry decoder MLP, pure JAX.

Reference analog: the torch decoder stack in LocalMap (local_map.cpp:29-42):
Linear(enc, hidden) + ReLU, then ``geo_num_layer`` x (Linear(hidden, hidden) +
ReLU), then Linear(hidden, 2) -> (sdf, isigma_raw).

Kept as explicit matmuls with fp32 accumulation so XLA fuses the whole chain;
at hidden_dim=64 the weights live in registers/VMEM and the op is purely
bandwidth-bound on activations — ideal MXU shape is [N, 64] x [64, 64].
"""

from __future__ import annotations

from typing import Any, Dict, List

import jax
import jax.numpy as jnp


def init_mlp(
    key: jax.Array,
    in_dim: int,
    hidden_dim: int,
    out_dim: int,
    n_hidden: int,
) -> Dict[str, Any]:
    """Kaiming-uniform init matching torch.nn.Linear defaults
    (U(-1/sqrt(fan_in), 1/sqrt(fan_in)) for both W and b)."""
    dims = [in_dim] + [hidden_dim] * (n_hidden + 1) + [out_dim]
    ws: List[jnp.ndarray] = []
    bs: List[jnp.ndarray] = []
    for i in range(len(dims) - 1):
        key, kw, kb = jax.random.split(key, 3)
        bound = 1.0 / jnp.sqrt(dims[i])
        ws.append(
            jax.random.uniform(
                kw, (dims[i], dims[i + 1]), minval=-bound, maxval=bound
            )
        )
        bs.append(
            jax.random.uniform(kb, (dims[i + 1],), minval=-bound, maxval=bound)
        )
    return {"w": ws, "b": bs}


def mlp_apply(params: Dict[str, Any], x: jnp.ndarray) -> jnp.ndarray:
    ws, bs = params["w"], params["b"]
    n = len(ws)
    for i in range(n):
        x = (
            jnp.dot(x, ws[i], preferred_element_type=jnp.float32)
            + bs[i]
        )
        if i < n - 1:
            x = jax.nn.relu(x)
    return x
