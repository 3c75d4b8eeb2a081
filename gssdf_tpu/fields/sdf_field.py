"""Neural SDF field: hash encoding + tiny MLP + map-coordinate normalization.

Reference analog: LocalMap/EncodingMap/SubMap (include/neural_net/):
  - world<->map normalization (sub_map.cpp:85-109): the map is a cube of side
    ``map_size`` centered at ``origin``; m1p1 = [-1,1], zp1 = [0,1].
  - get_sdf (local_map.cpp:87-103): hash-feat -> MLP -> (sdf,
    1 + softplus(raw, beta=100) * bce_isigma).
  - get_gradient (local_map.cpp:105-173): 6-point central differences or
    autodiff. JAX autodiff supports double-backward through the hash grid, so
    the analytic path has no tcnn-style limitation.

Functional style: ``params`` is a pytree; every function is jit/vmap/grad
compatible.
"""

from __future__ import annotations

from dataclasses import dataclass
from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp

from .hashgrid import (
    HashGridSpec,
    hashgrid_encode,
    hashgrid_encode_with_grad,
    init_hashgrid,
)
from .mlp import init_mlp, mlp_apply


@dataclass(frozen=True)
class SDFFieldSpec:
    grid: HashGridSpec = HashGridSpec()
    hidden_dim: int = 64
    geo_num_layer: int = 3
    out_dim: int = 2  # (sdf, isigma_raw) == k_strc_dim (local_map.cpp:24)
    bce_isigma: float = 100.0

    @classmethod
    def from_config(cls, cfg) -> "SDFFieldSpec":
        return cls(
            grid=HashGridSpec(
                n_levels=cfg.n_levels,
                n_features_per_level=cfg.n_features_per_level,
                log2_hashmap_size=cfg.log2_hashmap_size,
                base_resolution=cfg.base_resolution,
                per_level_scale=cfg.per_level_scale,
            ),
            hidden_dim=cfg.hidden_dim,
            geo_num_layer=cfg.geo_num_layer,
            bce_isigma=cfg.bce_isigma,
        )


def init_sdf_field(key: jax.Array, spec: SDFFieldSpec) -> Dict[str, Any]:
    k1, k2 = jax.random.split(key)
    decoder = init_mlp(
        k2, spec.grid.out_dim, spec.hidden_dim, spec.out_dim, spec.geo_num_layer
    )
    # Bias the isigma head positive so isigma starts ~0.5*bce_isigma. The BCE
    # sdf loss has a degenerate flat equilibrium at isigma -> 1 (targets all
    # 0.5); starting sharp keeps targets saturated and training stable. (The
    # reference relies on its init draw to escape the same equilibrium.)
    decoder["b"][-1] = decoder["b"][-1].at[1].set(0.5)
    return {
        "table": init_hashgrid(k1, spec.grid),
        "decoder": decoder,
    }


@dataclass(frozen=True)
class MapGeometry:
    """World<->map cube transform. ``map_size`` is the full (2^level * leaf)
    cube side (params.cpp:250-255)."""

    origin: Tuple[float, float, float]
    map_size: float

    def xyz_to_zp1(self, xyz):
        o = jnp.asarray(self.origin, dtype=xyz.dtype)
        return (xyz - o) / self.map_size + 0.5

    def zp1_to_xyz(self, zp1):
        o = jnp.asarray(self.origin, dtype=zp1.dtype)
        return (zp1 - 0.5) * self.map_size + o

    def xyz_to_m1p1(self, xyz):
        o = jnp.asarray(self.origin, dtype=xyz.dtype)
        return (xyz - o) * (2.0 / self.map_size)

    def m1p1_to_xyz(self, m):
        o = jnp.asarray(self.origin, dtype=m.dtype)
        return m * (0.5 * self.map_size) + o

    def inrange_mask(self, xyz, half_extent: float, padding: float = 0.0):
        """Axis-wise in-range check against the *inner* map bounds
        (sub_map.cpp:38-47)."""
        o = jnp.asarray(self.origin, dtype=xyz.dtype)
        d = xyz - o
        lim = half_extent - padding - 1e-6
        return jnp.all((d < lim) & (d > -lim), axis=-1)


def sdf_apply(
    params: Dict[str, Any],
    xyz: jnp.ndarray,
    geom: MapGeometry,
    spec: SDFFieldSpec,
):
    """World points [N, 3] -> (sdf [N, 1], isigma [N, 1])."""
    x01 = geom.xyz_to_zp1(xyz)
    feat = hashgrid_encode(params["table"], x01, spec.grid)
    out = mlp_apply(params["decoder"], feat)
    sdf = out[..., 0:1]
    # softplus with beta=100: (1/100) * log(1 + exp(100 x)) (local_map.cpp:100-102)
    raw = out[..., 1:2]
    isigma = 1.0 + jax.nn.softplus(100.0 * raw) * (spec.bce_isigma / 100.0)
    return sdf, isigma


def sdf_only(params, xyz, geom, spec):
    return sdf_apply(params, xyz, geom, spec)[0]


# 6-point central-difference stencil (local_map.cpp:110-118)
_FD_OFFSETS = jnp.asarray(
    [
        [1, 0, 0],
        [-1, 0, 0],
        [0, 1, 0],
        [0, -1, 0],
        [0, 0, 1],
        [0, 0, -1],
    ],
    dtype=jnp.float32,
)


def sdf_gradient_numerical(
    params, xyz, geom, spec, delta, with_hessian: bool = False, sdf=None
):
    """6-point FD gradient (+diagonal Hessian) — local_map.cpp:110-149."""
    pts = xyz[None, :, :] + _FD_OFFSETS[:, None, :] * delta  # [6, N, 3]
    vals = sdf_only(params, pts.reshape(-1, 3), geom, spec).reshape(
        6, xyz.shape[0], 1
    )
    inv = 1.0 / delta
    grad = (
        0.5
        * inv
        * jnp.concatenate(
            [vals[0] - vals[1], vals[2] - vals[3], vals[4] - vals[5]], axis=-1
        )
    )
    if not with_hessian:
        return grad, None
    if sdf is None:
        sdf = sdf_only(params, xyz, geom, spec)
    hess = (inv * inv) * (
        jnp.concatenate(
            [vals[0] + vals[1], vals[2] + vals[3], vals[4] + vals[5]], axis=-1
        )
        - 2.0 * sdf
    )
    return grad, hess


def sdf_apply_with_grad(
    params,
    xyz,
    geom,
    spec,
    with_hessian: bool = False,
    detach_grad_positions: bool = False,
):
    """Fused (sdf, isigma, ∇sdf [, diag-Hessian]) from ONE hash-table gather.

    The trilinear weights are multilinear in x, so the encode's exact spatial
    Jacobian reuses the corner rows gathered for the value
    (hashgrid_encode_with_grad); per-axis second derivatives of the encode
    are identically zero, so diag(H) = J_i^T H_mlp J_i needs only tiny-MLP
    forward-over-forward passes. This replaces both the autodiff
    double-backward and the reference's FD probes (local_map.cpp:105-173)
    on the hot path — no second gather, no second segment-sum.

    ``detach_grad_positions``: the returned grad/hessian carry no gradient
    to ``xyz`` (reference's ``.detach()`` on eikonal inputs,
    neural_mapping.cpp:450-452); the sdf/isigma value path stays fully
    differentiable.
    """
    x01 = geom.xyz_to_zp1(xyz)
    feat, feat_g, jac = hashgrid_encode_with_grad(
        params["table"], x01, spec.grid, detach_positions=detach_grad_positions
    )
    scale = 1.0 / geom.map_size  # d(x01)/d(xyz)

    def mlp(f):
        return mlp_apply(params["decoder"], f)

    out = mlp(feat)
    sdf = out[..., 0:1]
    raw = out[..., 1:2]
    isigma = 1.0 + jax.nn.softplus(100.0 * raw) * (spec.bce_isigma / 100.0)

    vs = [jac[..., i] * scale for i in range(3)]  # feature-tangents per axis
    grad = jnp.stack(
        [jax.jvp(mlp, (feat_g,), (v,))[1][..., 0] for v in vs], axis=-1
    )
    if not with_hessian:
        return sdf, isigma, grad, None

    def d1(f, v):
        return jax.jvp(mlp, (f,), (v,))[1][..., 0]

    hd = [
        jax.jvp(lambda f: d1(f, v), (feat_g,), (v,))[1] for v in vs
    ]  # v^T H_mlp v per axis
    return sdf, isigma, grad, jnp.stack(hd, axis=-1)


def sdf_gradient_autodiff(params, xyz, geom, spec, with_hessian: bool = False):
    """Analytic gradient via reverse-mode; Hessian-vector product H @ 1 via
    forward-over-reverse (matches the reference's double-grad semantics,
    local_map.cpp:150-172)."""

    def f_sum(x):
        return jnp.sum(sdf_only(params, x, geom, spec))

    grad = jax.grad(f_sum)(xyz)
    if not with_hessian:
        return grad, None
    ones = jnp.ones_like(xyz)
    _, hvp = jax.jvp(jax.grad(f_sum), (xyz,), (ones,))
    return grad, hvp
