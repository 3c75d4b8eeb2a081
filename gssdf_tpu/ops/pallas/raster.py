"""Pallas TPU kernel: per-tile 2DGS alpha compositing.

The hot inner loop of the rasterizer (SURVEY §3.3). The XLA scan
materializes several [P, C] planes per tile batch in HBM; this kernel fuses
splat-coefficient evaluation, log-space transmittance (triangular matmul on
the MXU), and all channel accumulations in VMEM — one HBM read of the entry
table, one write of the outputs.

Forward only: the backward of ``tile_composite`` is defined via custom_vjp
as a vjp through the pure-JAX reference implementation (exact same math),
so gradients stay correct while the forward (which also runs once more
under residual recompute) takes the fast path.

Layouts (lane axis last, 128-aligned):
  entries  [T, 24, C]   rows 0..14 = splat_coeffs, 15..20 = feats, 21..23 pad
  out      [T, 16, P]   rows 0..9 = color(3) normal(3) acc depth median
                        distort; 10..15 pad   (P = tile_size^2 = 256)
  wmax     [T, 8, C]    row 0 = per-splat max pixel weight
"""

from __future__ import annotations

import functools
from typing import Tuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from ...gs.rasterize_jax import (
    ALPHA_MIN,
    MAX_ALPHA,
    T_EPS,
    FILTER_INV_SQUARE,
    composite,
    pixel_weights_from_coeffs,
)

_INTERPRET = False  # set True to run the kernel in interpreter mode (tests)

F_ROWS = 24   # padded feature rows in the entry table
O_ROWS = 16   # padded output channel rows


def _composite_kernel(ent_ref, out_ref, wmax_ref, *, tiles_x: int,
                      tile_size: int):
    t = pl.program_id(0)
    ent = ent_ref[0]                       # [F_ROWS, C]
    c = ent.shape[-1]
    p = tile_size * tile_size

    tx = (t % tiles_x) * tile_size
    ty = (t // tiles_x) * tile_size
    # pixel centers [P]
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    px = (tx + (lin % tile_size)).astype(jnp.float32) + 0.5
    py = (ty + (lin // tile_size)).astype(jnp.float32) + 0.5
    pxc = px[:, None]                      # [P, 1]
    pyc = py[:, None]

    A0, A1, A2 = ent[0][None], ent[1][None], ent[2][None]      # [1, C]
    B0, B1, B2 = ent[3][None], ent[4][None], ent[5][None]
    C0, C1, C2 = ent[6][None], ent[7][None], ent[8][None]
    dA, dB, dC = ent[9][None], ent[10][None], ent[11][None]
    mx, my = ent[12][None], ent[13][None]
    opa = ent[14][None]

    sx = A0 + pxc * B0 + pyc * C0          # [P, C]
    sy = A1 + pxc * B1 + pyc * C1
    sz = A2 + pxc * B2 + pyc * C2
    safe = jnp.where(jnp.abs(sz) > 1e-9, sz, 1e-9)
    inv_sz = 1.0 / safe
    rho3d = (sx * sx + sy * sy) * (inv_sz * inv_sz)
    dx = pxc - mx
    dy = pyc - my
    rho = jnp.minimum(rho3d, FILTER_INV_SQUARE * (dx * dx + dy * dy))
    depth = (dA + pxc * dB + pyc * dC) * inv_sz

    alpha = jnp.minimum(opa * jnp.exp(-0.5 * rho), MAX_ALPHA)
    alpha = jnp.where(alpha >= ALPHA_MIN, alpha, 0.0)
    alpha = jnp.where(depth > 1e-6, alpha, 0.0)

    # triangular cumsum matrices in VMEM
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    u_incl = (r <= cc).astype(jnp.float32)
    u_excl = (r < cc).astype(jnp.float32)

    log_one_m = jnp.log1p(-alpha)
    cl = jnp.dot(log_one_m, u_incl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    t_in = jnp.exp(cl)
    t_ex = jnp.exp(cl - log_one_m)
    w = jnp.where(t_in >= T_EPS, t_ex * alpha, 0.0)      # [P, C]

    feats = ent[15:21]                                    # [6, C]
    outc = jnp.dot(w, feats.T, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)  # [P, 6]
    acc = jnp.sum(w, axis=-1)                             # [P]
    dmean = jnp.sum(w * depth, axis=-1)

    cum = jnp.dot(w, u_incl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    crossed = (cum >= 0.5).astype(jnp.float32)
    first = crossed - jnp.concatenate(
        [jnp.zeros((p, 1), jnp.float32), crossed[:, :-1]], axis=-1
    )
    first = jnp.maximum(first, 0.0)
    dmed = jnp.sum(depth * first, axis=-1)

    a_ex = jnp.dot(w, u_excl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    b_ex = jnp.dot(w * depth, u_excl, preferred_element_type=jnp.float32, precision=jax.lax.Precision.HIGHEST)
    distort = 2.0 * jnp.sum(w * (depth * a_ex - b_ex), axis=-1)

    stacked = jnp.concatenate(
        [
            outc.T,                      # [6, P]
            acc[None],
            dmean[None],
            dmed[None],
            distort[None],
            jnp.zeros((O_ROWS - 10, p), jnp.float32),
        ],
        axis=0,
    )                                    # [O_ROWS, P]
    out_ref[0] = stacked

    wmax_ref[0] = jnp.concatenate(
        [jnp.max(w, axis=0)[None], jnp.zeros((7, c), jnp.float32)], axis=0
    )


def _composite_fwd_pallas(entries_t: jnp.ndarray, tiles_x: int,
                          tile_size: int):
    """entries_t: [T, F_ROWS, C] -> (out [T, O_ROWS, P], wmax [T, 8, C])."""
    t_tiles, f_rows, c = entries_t.shape
    assert f_rows == F_ROWS and c % 128 == 0
    p = tile_size * tile_size
    kernel = functools.partial(
        _composite_kernel, tiles_x=tiles_x, tile_size=tile_size
    )
    return pl.pallas_call(
        kernel,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, F_ROWS, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((1, O_ROWS, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((t_tiles, O_ROWS, p), jnp.float32),
            jax.ShapeDtypeStruct((t_tiles, 8, c), jnp.float32),
        ),
        interpret=_INTERPRET,
    )(entries_t)


def _composite_ref_jax(entries_t: jnp.ndarray, tiles_x: int, tile_size: int,
                       tile_batch: int = 16, remat: bool = True):
    """Pure-JAX reference with identical in/out layout (used for the custom
    VJP backward and for CPU fallback)."""
    t_tiles, f_rows, c = entries_t.shape
    p = tile_size * tile_size
    lx = jnp.arange(tile_size, dtype=jnp.float32)
    pix_dx = jnp.tile(lx, tile_size) + 0.5
    pix_dy = jnp.repeat(lx, tile_size) + 0.5
    nb = -(-t_tiles // tile_batch)
    pad = nb * tile_batch - t_tiles
    ent = entries_t
    if pad:
        ent = jnp.concatenate(
            [ent, jnp.zeros((pad, f_rows, c), ent.dtype)]
        )
    tids = jnp.arange(nb * tile_batch, dtype=jnp.int32)

    def body(_, args):
        tid, e = args                                      # e [B, F, C]
        tx = (tid % tiles_x).astype(jnp.float32) * tile_size
        ty = (tid // tiles_x).astype(jnp.float32) * tile_size
        px = tx[:, None] + pix_dx[None]
        py = ty[:, None] + pix_dy[None]
        coeffs = jnp.swapaxes(e[:, :15], -1, -2)           # [B, C, 15]
        alpha, depth = jax.vmap(pixel_weights_from_coeffs)(px, py, coeffs)
        feats = jnp.swapaxes(e[:, 15:21], -1, -2)          # [B, C, 6]
        res = jax.vmap(composite)(alpha, feats, depth)
        out = jnp.zeros((e.shape[0], O_ROWS, p), jnp.float32)
        out = out.at[:, 0:6].set(jnp.swapaxes(res["out"], -1, -2))
        out = out.at[:, 6].set(res["alpha"][..., 0])
        out = out.at[:, 7].set(res["depth"][..., 0])
        out = out.at[:, 8].set(res["median"][..., 0])
        out = out.at[:, 9].set(res["distort"][..., 0])
        wm = jnp.zeros((e.shape[0], 8, c), jnp.float32)
        wm = wm.at[:, 0].set(jnp.max(res["w"], axis=1))
        return 0, (out, wm)

    body_fn = (
        functools.partial(jax.checkpoint, prevent_cse=False)(body)
        if remat else body
    )
    _, (outs, wms) = jax.lax.scan(
        body_fn, 0,
        (tids.reshape(nb, tile_batch),
         ent.reshape(nb, tile_batch, f_rows, c)),
    )
    return (
        outs.reshape(-1, O_ROWS, p)[:t_tiles],
        wms.reshape(-1, 8, c)[:t_tiles],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def tile_composite(entries_t, tiles_x: int, tile_size: int):
    """Differentiable fused tile compositing; Pallas forward on TPU, with
    the backward defined through the pure-JAX reference path."""
    return _composite_fwd_pallas(entries_t, tiles_x, tile_size)


def _tc_fwd(entries_t, tiles_x, tile_size):
    out = _composite_fwd_pallas(entries_t, tiles_x, tile_size)
    return out, entries_t


def _tc_bwd(tiles_x, tile_size, entries_t, g):
    # remat stays: without it XLA keeps ~20 scan-carry buffers of
    # [nb, 16, P, C] alive (~18 GB at Replica scale)
    _, vjp = jax.vjp(
        lambda e: _composite_ref_jax(e, tiles_x, tile_size), entries_t
    )
    (d_entries,) = vjp(g)
    return (d_entries,)


tile_composite.defvjp(_tc_fwd, _tc_bwd)


def tile_composite_reference(entries_t, tiles_x: int, tile_size: int):
    """Same contract, fully pure-JAX (CPU and parity tests)."""
    return _composite_ref_jax(entries_t, tiles_x, tile_size)
