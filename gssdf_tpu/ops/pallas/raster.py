"""Pallas TPU kernels: per-tile 2DGS alpha compositing, forward AND backward.

The hot inner loop of the rasterizer (SURVEY §3.3; reference
``rasterize_to_pixels_2dgs`` fwd+bwd called at neural_gaussian.cpp:218-223).
The XLA scan materializes several [P, C] planes per tile batch in HBM; these
kernels fuse splat-coefficient evaluation, log-space transmittance
(triangular matmul on the MXU), and all channel accumulations in VMEM — one
HBM read of the entry table, one write of the outputs.

The backward is HAND-DERIVED (not autodiff): per tile it recomputes the
forward planes (cheap — 3 triangular matmuls) and applies the analytic
adjoints of the compositing chain. All cumulative structure (transmittance
suffix sums, distortion prefix sums) again rides the MXU as [P, C] @ [C, C]
triangular matmuls; suffix sums are derived from the inclusive cumsums
(suffix = total - inclusive) so fwd needs 3 and bwd 4 big matmuls per tile.

Layouts (lane axis last, 128-aligned):
  entries  [T, 24, C]   rows 0..14 = splat_coeffs, 15..20 = feats, 21..23 pad
  out      [T, 16, P]   rows 0..9 = color(3) normal(3) acc depth median
                        distort; 10..15 pad   (P = tile_size^2 = 256)
  wmax     [T, 8, C]    row 0 = per-splat max pixel weight

Gradient semantics intentionally mirror JAX's vjp of the pure-JAX reference
(`_composite_ref_jax`) so the two backends are interchangeable:
  * median depth: cotangent routes to the first splat crossing cum >= 0.5
  * per-splat max weight: cotangent split equally among tying pixels
  * min/gate thresholds: no cotangent through the condition
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

_INTERPRET = False  # set True to run the kernels in interpreter mode (tests)

F_ROWS = 24   # padded feature rows in the entry table
O_ROWS = 16   # padded output channel rows

_HI = jax.lax.Precision.HIGHEST


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _tri_mats(c: int):
    """(inclusive upper, strict upper) [C, C] triangular ones (f32)."""
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (r <= cc).astype(jnp.float32), (r < cc).astype(jnp.float32)


def _tile_pixels(t, tiles_x: int, tile_size: int):
    """Pixel-center columns (pxc, pyc) [P, 1] for tile index t."""
    p = tile_size * tile_size
    tx = (t % tiles_x) * tile_size
    ty = (t // tiles_x) * tile_size
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    px = (tx + (lin % tile_size)).astype(jnp.float32) + 0.5
    py = (ty + (lin // tile_size)).astype(jnp.float32) + 0.5
    return px[:, None], py[:, None]


def _tile_fwd_planes(ent, pxc, pyc):
    """Shared fwd recompute: per-pixel-per-splat planes from an entry block.

    ent [F_ROWS, C]; pxc/pyc [P, 1]. Returns a dict of [P, C] planes and
    masks needed by both forward outputs and the analytic backward.
    """
    A0, A1, A2 = ent[0][None], ent[1][None], ent[2][None]      # [1, C]
    B0, B1, B2 = ent[3][None], ent[4][None], ent[5][None]
    C0, C1, C2 = ent[6][None], ent[7][None], ent[8][None]
    dA, dB, dC = ent[9][None], ent[10][None], ent[11][None]
    mx, my = ent[12][None], ent[13][None]
    opa = ent[14][None]

    sx = A0 + pxc * B0 + pyc * C0          # [P, C]
    sy = A1 + pxc * B1 + pyc * C1
    sz = A2 + pxc * B2 + pyc * C2
    sz_ok = jnp.abs(sz) > 1e-9
    safe = jnp.where(sz_ok, sz, 1e-9)
    inv = 1.0 / safe
    s2 = sx * sx + sy * sy
    rho3d = s2 * (inv * inv)
    dx = pxc - mx
    dy = pyc - my
    rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    Dlin = dA + pxc * dB + pyc * dC
    depth = Dlin * inv

    a_raw = opa * jnp.exp(-0.5 * rho)
    a1 = jnp.minimum(a_raw, MAX_ALPHA)
    gate = (a1 >= ALPHA_MIN) & (depth > 1e-6)
    alpha = jnp.where(gate, a1, 0.0)

    c = ent.shape[-1]
    u_incl, _ = _tri_mats(c)
    log1m = jnp.log1p(-alpha)
    cl = _dot(log1m, u_incl)
    t_in = jnp.exp(cl)
    t_ex = jnp.exp(cl - log1m)
    keep = t_in >= T_EPS
    w = jnp.where(keep, t_ex * alpha, 0.0)     # [P, C]
    wd = w * depth

    cum = _dot(w, u_incl)
    cum_wd = _dot(wd, u_incl)
    # exclusive sums from the inclusive matmuls (no extra MXU work)
    a_ex = cum - w
    b_ex = cum_wd - wd

    crossed = (cum >= 0.5).astype(jnp.float32)
    p = pxc.shape[0]
    first = crossed - jnp.concatenate(
        [jnp.zeros((p, 1), jnp.float32), crossed[:, :-1]], axis=-1
    )
    first = jnp.maximum(first, 0.0)

    return dict(
        sx=sx, sy=sy, sz=sz, sz_ok=sz_ok, inv=inv, s2=s2,
        dx=dx, dy=dy, use3d=use3d,
        Dlin=Dlin, depth=depth, a_raw=a_raw, gate=gate, alpha=alpha,
        t_ex=t_ex, keep=keep, w=w, wd=wd,
        cum=cum, a_ex=a_ex, b_ex=b_ex, first=first,
    )


def _tile_fwd_outputs(ent, pxc, pyc):
    """Per-tile forward: ent [F_ROWS, C] -> (out [O_ROWS, P], wmax [8, C])."""
    f = _tile_fwd_planes(ent, pxc, pyc)
    w, depth = f["w"], f["depth"]
    c = ent.shape[-1]
    p = pxc.shape[0]

    feats = ent[15:21]                                    # [6, C]
    outc = _dot(w, feats.T)                               # [P, 6]
    acc = jnp.sum(w, axis=-1)                             # [P]
    dmean = jnp.sum(f["wd"], axis=-1)
    dmed = jnp.sum(depth * f["first"], axis=-1)
    distort = 2.0 * jnp.sum(
        w * (depth * f["a_ex"] - f["b_ex"]), axis=-1
    )

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
    wmax = jnp.concatenate(
        [jnp.max(w, axis=0)[None], jnp.zeros((7, c), jnp.float32)], axis=0
    )
    return stacked, wmax


def _tile_bwd_math(ent, go, gw, pxc, pyc):
    """Analytic per-tile backward.

    ent [F_ROWS, C], go [O_ROWS, P] (cotangent of out), gw [8, C] (cotangent
    of wmax) -> d_ent [F_ROWS, C]. Pure jnp: used verbatim inside the Pallas
    kernel and (vmapped) as the CPU reference twin.
    """
    c = ent.shape[-1]
    p = pxc.shape[0]
    f = _tile_fwd_planes(ent, pxc, pyc)
    w, wd, depth = f["w"], f["wd"], f["depth"]
    alpha, t_ex, keep = f["alpha"], f["t_ex"], f["keep"]
    a_ex, b_ex = f["a_ex"], f["b_ex"]
    feats = ent[15:21]                   # [6, C]

    _, u_strict = _tri_mats(c)

    go6 = go[0:6]                        # [6, P]
    ga = go[6][:, None]                  # [P, 1]
    gd = go[7][:, None]
    gm = go[8][:, None]
    gq = go[9][:, None]
    gv = gw[0][None]                     # [1, C]

    # --- dL/dw assembly -------------------------------------------------
    # suffix sums over splats k > c, from totals minus inclusive sums
    tot_w = jnp.sum(w, axis=-1, keepdims=True)      # [P, 1]
    tot_wd = jnp.sum(wd, axis=-1, keepdims=True)
    Sw = tot_w - f["cum"]                           # sum_{k>c} w_k
    Smw = tot_wd - (b_ex + wd)                      # sum_{k>c} w_k m_k

    # per-splat max-weight cotangent, split among tying pixels (jnp.max vjp)
    wmax = jnp.max(w, axis=0, keepdims=True)        # [1, C]
    mtie = (w == wmax).astype(jnp.float32)
    cnt = jnp.sum(mtie, axis=0, keepdims=True)
    g_vis = gv * mtie / cnt

    Gw = (
        jax.lax.dot_general(
            go6, feats, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )                                            # [P, C] color/normal
        + ga
        + gd * depth
        + gq * 2.0 * (depth * a_ex - b_ex + Smw - depth * Sw)
        + g_vis
    )

    # --- dL/ddepth (from mean/median/distortion channels) ---------------
    Gdepth = gd * w + gm * f["first"] + gq * 2.0 * w * (a_ex - Sw)

    # --- w -> alpha through the transmittance chain ---------------------
    # w_k = keep_k * alpha_k * prod_{j<k}(1-alpha_j):
    #   dL/da_c = keep_c t_ex,c Gw_c - (1/(1-a_c)) sum_{k>c} Gw_k w_k
    WG = Gw * w
    S_incl = _dot(WG, _tri_mats(c)[0])
    tot_WG = jnp.sum(WG, axis=-1, keepdims=True)
    S_suffix = tot_WG - S_incl
    Galpha = jnp.where(keep, Gw * t_ex, 0.0) - S_suffix / (1.0 - alpha)

    # --- alpha -> (opa, rho, depth-gate has no cotangent) ---------------
    da1 = jnp.where(f["gate"], Galpha, 0.0)
    d_araw = jnp.where(f["a_raw"] <= MAX_ALPHA, da1, 0.0)
    d_rho = -0.5 * f["a_raw"] * d_araw          # a_raw = opa * gauss
    gauss = jnp.where(
        f["use3d"],
        jnp.exp(-0.5 * f["s2"] * (f["inv"] * f["inv"])),
        jnp.exp(
            -0.5 * FILTER_INV_SQUARE * (f["dx"] * f["dx"] + f["dy"] * f["dy"])
        ),
    )
    d_opa = gauss * d_araw

    d_rho3 = jnp.where(f["use3d"], d_rho, 0.0)
    d_rho2 = jnp.where(f["use3d"], 0.0, d_rho)

    inv = f["inv"]
    inv2 = inv * inv
    d_sx = 2.0 * f["sx"] * inv2 * d_rho3
    d_sy = 2.0 * f["sy"] * inv2 * d_rho3
    d_inv = 2.0 * f["s2"] * inv * d_rho3 + Gdepth * f["Dlin"]
    d_Dlin = Gdepth * inv
    d_sz = jnp.where(f["sz_ok"], -inv2 * d_inv, 0.0)
    d_mx = -2.0 * FILTER_INV_SQUARE * f["dx"] * d_rho2
    d_my = -2.0 * FILTER_INV_SQUARE * f["dy"] * d_rho2

    # --- reductions over pixels -> per-entry rows -----------------------
    ones = jnp.ones((p, 1), jnp.float32)
    Q = jnp.concatenate([ones, pxc, pyc], axis=1)    # [P, 3]

    def red(dplane):  # [3, C]: rows = (sum, sum px*, sum py*)
        return jax.lax.dot_general(
            Q, dplane, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

    RX, RY, RZ, RD = red(d_sx), red(d_sy), red(d_sz), red(d_Dlin)
    # rows 0..8: A0 A1 A2 B0 B1 B2 C0 C1 C2 = interleave (RX|RY|RZ) by coeff
    rABC = jnp.stack([RX, RY, RZ], axis=1).reshape(9, c)

    d_feats = jax.lax.dot_general(
        go6, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )                                                # [6, C]

    d_ent = jnp.concatenate(
        [
            rABC,                                    # 0..8
            RD,                                      # 9..11
            jnp.sum(d_mx, axis=0)[None],             # 12
            jnp.sum(d_my, axis=0)[None],             # 13
            jnp.sum(d_opa, axis=0)[None],            # 14
            d_feats,                                 # 15..20
            jnp.zeros((F_ROWS - 21, c), jnp.float32),
        ],
        axis=0,
    )
    return d_ent


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _composite_kernel(ent_ref, out_ref, wmax_ref, *, tiles_x: int,
                      tile_size: int):
    t = pl.program_id(0)
    pxc, pyc = _tile_pixels(t, tiles_x, tile_size)
    out, wmax = _tile_fwd_outputs(ent_ref[0], pxc, pyc)
    out_ref[0] = out
    wmax_ref[0] = wmax


def _composite_bwd_kernel(ent_ref, go_ref, gw_ref, dent_ref, *, tiles_x: int,
                          tile_size: int):
    t = pl.program_id(0)
    pxc, pyc = _tile_pixels(t, tiles_x, tile_size)
    dent_ref[0] = _tile_bwd_math(
        ent_ref[0], go_ref[0], gw_ref[0], pxc, pyc
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


def _composite_bwd_pallas(entries_t, g_out, g_wmax, tiles_x: int,
                          tile_size: int):
    """Analytic backward: [T, F, C], [T, 16, P], [T, 8, C] -> d_ent."""
    t_tiles, f_rows, c = entries_t.shape
    p = tile_size * tile_size
    kernel = functools.partial(
        _composite_bwd_kernel, tiles_x=tiles_x, tile_size=tile_size
    )
    return pl.pallas_call(
        kernel,
        grid=(t_tiles,),
        in_specs=[
            pl.BlockSpec((1, F_ROWS, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, O_ROWS, p), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 8, c), lambda i: (i, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, F_ROWS, c), lambda i: (i, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((t_tiles, F_ROWS, c), jnp.float32),
        interpret=_INTERPRET,
    )(entries_t, g_out, g_wmax)


def composite_bwd_reference(entries_t, g_out, g_wmax, tiles_x: int,
                            tile_size: int):
    """Vmapped pure-JAX twin of the analytic backward (tests/CPU)."""
    t_tiles = entries_t.shape[0]
    tids = jnp.arange(t_tiles, dtype=jnp.int32)

    def one(t, ent, go, gw):
        pxc, pyc = _tile_pixels(t, tiles_x, tile_size)
        return _tile_bwd_math(ent, go, gw, pxc, pyc)

    return jax.vmap(one)(tids, entries_t, g_out, g_wmax)


def _composite_ref_jax(entries_t: jnp.ndarray, tiles_x: int, tile_size: int,
                       tile_batch: int = 16, remat: bool = True):
    """Pure-JAX reference with identical in/out layout (parity tests and the
    autodiff cross-check of the analytic backward)."""
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
    """Differentiable fused tile compositing; Pallas forward on TPU with a
    hand-derived analytic Pallas backward."""
    return _composite_fwd_pallas(entries_t, tiles_x, tile_size)


def _tc_fwd(entries_t, tiles_x, tile_size):
    out = _composite_fwd_pallas(entries_t, tiles_x, tile_size)
    return out, entries_t


def _tc_bwd(tiles_x, tile_size, entries_t, g):
    g_out, g_wmax = g
    d_entries = _composite_bwd_pallas(
        entries_t, g_out, g_wmax, tiles_x, tile_size
    )
    return (d_entries,)


tile_composite.defvjp(_tc_fwd, _tc_bwd)


def tile_composite_reference(entries_t, tiles_x: int, tile_size: int):
    """Same contract, fully pure-JAX (CPU and parity tests)."""
    return _composite_ref_jax(entries_t, tiles_x, tile_size)
