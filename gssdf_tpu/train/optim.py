"""Adam with per-leaf learning rates + moment surgery, as plain pytree ops.

Reference analog: torch::optim::Adam (eps=1e-15, neural_mapping.cpp:825-829)
with per-param groups for the splat model (neural_gaussian.cpp:434-453) and
the densification-time Adam-state rewrites in
optimizer_utils/optimizer_utils.cpp:5-165.

A hand-rolled Adam (instead of optax) keeps ``exp_avg``/``exp_avg_sq`` as
first-class pytrees so splat grow/split/prune become masked scatter updates on
the moments — the jit-stable TPU equivalent of the reference's
index_select/cat surgery.
"""

from __future__ import annotations

from typing import Any, NamedTuple

import jax
import jax.numpy as jnp


class AdamState(NamedTuple):
    step: jnp.ndarray   # scalar int32
    mu: Any             # first moments, same pytree as params
    nu: Any             # second moments


def adam_init(params) -> AdamState:
    zeros = jax.tree_util.tree_map(jnp.zeros_like, params)
    return AdamState(
        step=jnp.zeros((), jnp.int32),
        mu=zeros,
        nu=jax.tree_util.tree_map(jnp.zeros_like, params),
    )


def adam_update(
    grads,
    state: AdamState,
    params,
    lr,
    b1: float = 0.9,
    b2: float = 0.999,
    eps: float = 1e-15,
):
    """One Adam step. ``lr`` is either a scalar or a pytree matching
    ``params`` (per-leaf learning rates = the reference's param groups)."""
    step = state.step + 1
    c1 = 1.0 - b1 ** step.astype(jnp.float32)
    c2 = 1.0 - b2 ** step.astype(jnp.float32)

    mu = jax.tree_util.tree_map(
        lambda m, g: b1 * m + (1.0 - b1) * g, state.mu, grads
    )
    nu = jax.tree_util.tree_map(
        lambda v, g: b2 * v + (1.0 - b2) * jnp.square(g), state.nu, grads
    )

    is_scalar = not isinstance(lr, (dict, list, tuple)) and jnp.ndim(lr) == 0
    lr_tree = jax.tree_util.tree_map(lambda _: lr, params) if is_scalar else lr

    new_params = jax.tree_util.tree_map(
        lambda p, m, v, l: p - l * (m / c1) / (jnp.sqrt(v / c2) + eps),
        params,
        mu,
        nu,
        lr_tree,
    )
    return new_params, AdamState(step=step, mu=mu, nu=nu)


def surgery_reset_rows(state: AdamState, path_fn, rows_mask) -> AdamState:
    """Zero the Adam moments of the leaves selected by ``path_fn`` at the
    rows where ``rows_mask`` is True (replace/cat surgery analog,
    optimizer_utils.cpp:96-165)."""

    def zero_rows(x):
        m = rows_mask
        while m.ndim < x.ndim:
            m = m[..., None]
        return jnp.where(m, jnp.zeros_like(x), x)

    mu = path_fn(state.mu, zero_rows)
    nu = path_fn(state.nu, zero_rows)
    return AdamState(step=state.step, mu=mu, nu=nu)
