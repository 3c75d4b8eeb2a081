"""Pallas TPU kernels: chunked per-tile 2DGS alpha compositing, fwd AND bwd.

The hot inner loop of the rasterizer (SURVEY §3.3; reference
``rasterize_to_pixels_2dgs`` fwd+bwd called at neural_gaussian.cpp:218-223).
The CUDA kernel walks each pixel's splat list front-to-back and EARLY-STOPS
when transmittance drops below 1e-4. The TPU redesign keeps the early stop
but at *chunk* granularity: the per-tile entry list [cap] is processed in
CHUNK=128 column blocks; a chunk is skipped when

  * every entry in it is a sentinel (max opacity == 0), or
  * the tile is already saturated (max over pixels of log-transmittance at
    the chunk start < log(T_EPS) - margin).

Both conditions imply every weight in the chunk is exactly zero (the w
computation gates on ``t_in >= T_EPS``), so skipping is EXACT for outputs
and gradients — it mirrors the CUDA early-stop semantics rather than
approximating them.

Within a chunk all cumulative structure (transmittance prefix, weight
prefix sums) rides the MXU as [P, CHUNK] @ [CHUNK, CHUNK] triangular
matmuls, with [P, 1] carries threaded across chunks in VMEM scratch.

The backward is HAND-DERIVED (not autodiff) and runs chunks in REVERSE
order. To keep the discrete decisions (T_EPS keep-gate, median 0.5
crossing, per-splat max-weight ties) bit-exact against the forward, the
forward stores each chunk's starting log-transmittance and weight-prefix
carry rows in spare output rows; the backward rebuilds ``w`` from those
carries with the exact same ops. Cross-chunk suffix sums (needed by the
distortion and transmittance adjoints) are carried in reverse.

Layouts (lane axis last, 128-aligned):
  entries  [T, 24, C]     rows 0..14 = splat_coeffs, 15..20 = feats, 21+ pad
  out      [T, OR, P]     rows 0..9 = color(3) normal(3) acc depth median
                          distort; 10..10+NC = per-chunk cl carries;
                          10+NC..10+2NC = per-chunk cum-weight carries
                          (OR = 10 + 2*NC padded to a multiple of 8;
                          P = tile_size^2 = 256, NC = C / CHUNK)
  wmax     [T, 8, C]      row 0 = per-splat max pixel weight,
                          row 1 = chunk-active flag (internal)

Gradient semantics intentionally mirror JAX's vjp of the pure-JAX reference
(`_composite_ref_jax`) so the two backends are interchangeable:
  * median depth: cotangent routes to the first splat crossing cum >= 0.5
  * per-splat max weight: cotangent split equally among tying pixels
  * min/gate thresholds: no cotangent through the condition
"""

from __future__ import annotations

import functools
import os
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
)

_INTERPRET = False  # set True to run the kernels in interpreter mode (tests)

# V3 chunk math (GSSDF_RASTER_V3=1): plane construction rides the MXU as one
# [P, 3] @ [3, 4*ch] dot (vs ~16 [P, ch] VPU mul/adds), and the exclusive
# transmittance t_ex comes straight from a STRICT-prefix matmul + one exp
# (killing the [P, ch] divide t_in/(1-alpha)). Mathematically identical;
# individual f32 roundings differ by ~1 ulp, so discrete gates can flip on
# exact knife edges (measure-zero). Forward and backward share the same
# helpers, so the bwd weight replay stays bit-exact either way.
_V3 = os.environ.get("GSSDF_RASTER_V3", "0") == "1"

# V4 transmittance (GSSDF_RASTER_V4=1): the CUDA reference maintains T by
# sequential multiply with NO transcendentals (rasterize_to_pixels_2dgs);
# the log-space matmul form above pays a [P, ch] log1p plus a [P, ch] exp
# per chunk purely to ride the prefix sum on the MXU. V4 computes the
# exclusive prefix PRODUCT of (1 - alpha) directly with a 7-step
# Hillis-Steele lane scan (static concat-shifts + multiplies on the VPU),
# eliminating BOTH transcendentals — only exp(-0.5 rho) remains. The
# chunk carry becomes the transmittance T itself (init 1.0, stored in the
# same carry rows), and the saturation skip test max(T) >= T_EPS is exact
# with no margin (t_in <= T_carry since every factor <= 1). Orthogonal to
# V3's plane-side MXU change; forward and backward share _transmit, so the
# bwd weight replay stays bit-exact. Numerics: a 128-factor f32 product
# carries <= 128 ulp relative error (~1.5e-5), comparable to the split-
# bf16 _tri_dot it replaces; T underflow to 0 only happens far below the
# T_EPS keep gate, where w is already exactly 0.
_V4 = os.environ.get("GSSDF_RASTER_V4", "0") == "1"

F_ROWS = 24          # padded feature rows in the entry table
CHUNK = 128          # entry-list chunk width (lane dimension)
_LOG_TEPS = float(np.log(T_EPS))
_SKIP_MARGIN = 1e-3  # conservative saturation-skip margin (see module doc)

_HI = jax.lax.Precision.HIGHEST


def n_chunks(cap: int) -> int:
    assert cap % CHUNK == 0, "tile_cap must be a multiple of 128"
    return cap // CHUNK


def o_rows(nc: int) -> int:
    """Output rows: 10 channels + 2*NC carry rows, padded to 8 sublanes."""
    return -(-(10 + 2 * nc) // 8) * 8


O_ROWS = 16  # o_rows for NC <= 3 (cap <= 384); kept for callers/tests


def _dot(a, b):
    return jnp.dot(a, b, preferred_element_type=jnp.float32, precision=_HI)


def _tri_dot(x, tri):
    """Triangular prefix/suffix matmul in SPLIT-bf16 (the kernel's dominant
    FLOPs). ``tri`` is 0/1 — exactly representable in bf16 — so
    ``(hi + lo) @ tri`` with two bf16 passes reproduces the f32 product to
    ~2^-17 relative while running ~3x faster than a 6-pass HIGHEST f32 dot
    on the MXU. Used identically by forward and backward, so the backward's
    weight replay stays bit-exact."""
    hi = x.astype(jnp.bfloat16)
    lo = (x - hi.astype(jnp.float32)).astype(jnp.bfloat16)
    tb = tri.astype(jnp.bfloat16)
    return (
        jnp.dot(hi, tb, preferred_element_type=jnp.float32)
        + jnp.dot(lo, tb, preferred_element_type=jnp.float32)
    )


def _tri_mats(c: int):
    """(inclusive-prefix upper, strict-suffix lower) [C, C] f32 matmuls:
    dot(x, upper)[_, c] = sum_{k<=c} x_k;  dot(x, lower)[_, c] = sum_{k>c}.
    Built from iota so Pallas kernels don't capture host constants."""
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (r <= cc).astype(jnp.float32), (r > cc).astype(jnp.float32)


def _tri_strict_upper(c: int):
    """Strict-prefix [C, C] matmul: dot(x, m)[_, c] = sum_{k<c} x_k."""
    r = jax.lax.broadcasted_iota(jnp.int32, (c, c), 0)
    cc = jax.lax.broadcasted_iota(jnp.int32, (c, c), 1)
    return (r < cc).astype(jnp.float32)


def _tile_pixels(t, tiles_x: int, tile_size: int):
    """Pixel-center columns (pxc, pyc) [P, 1] for tile index t."""
    p = tile_size * tile_size
    tx = (t % tiles_x) * tile_size
    ty = (t // tiles_x) * tile_size
    lin = jax.lax.broadcasted_iota(jnp.int32, (p, 1), 0)[:, 0]
    px = (tx + (lin % tile_size)).astype(jnp.float32) + 0.5
    py = (ty + (lin // tile_size)).astype(jnp.float32) + 0.5
    return px[:, None], py[:, None]


def _chunk_planes(ent, pxc, pyc):
    """Per-entry (non-cumulative) planes from an entry block.

    ent [F_ROWS, ch]; pxc/pyc [P, 1]. Returns a dict of [P, ch] planes and
    masks shared by the forward and the analytic backward.
    """
    mx, my = ent[12][None], ent[13][None]
    opa = ent[14][None]
    dx = pxc - mx                          # (bwd d_mx/d_my; DCE'd in fwd)
    dy = pyc - my

    if _V3:
        # four affine planes in one MXU pass: [P, 3] @ [3, 4*ch]. rho2d
        # stays on the VPU from dx/dy — a |pix|^2 + quad-plane matmul form
        # loses ~6 digits to cancellation (px^2 ~ 1e6 vs dx^2 ~ 1).
        ch = ent.shape[-1]
        w0 = jnp.concatenate(
            [ent[0:1], ent[1:2], ent[2:3], ent[9:10]], axis=1
        )
        w1 = jnp.concatenate(
            [ent[3:4], ent[4:5], ent[5:6], ent[10:11]], axis=1
        )
        w2 = jnp.concatenate(
            [ent[6:7], ent[7:8], ent[8:9], ent[11:12]], axis=1
        )
        Wm = jnp.concatenate([w0, w1, w2], axis=0)          # [3, 4*ch]
        Q = jnp.concatenate(
            [jnp.ones_like(pxc), pxc, pyc], axis=1
        )                                                   # [P, 3]
        P4 = _dot(Q, Wm)                                    # [P, 4*ch]
        sx = P4[:, 0:ch]
        sy = P4[:, ch:2 * ch]
        sz = P4[:, 2 * ch:3 * ch]
        Dlin = P4[:, 3 * ch:4 * ch]
        rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)
    else:
        A0, A1, A2 = ent[0][None], ent[1][None], ent[2][None]  # [1, ch]
        B0, B1, B2 = ent[3][None], ent[4][None], ent[5][None]
        C0, C1, C2 = ent[6][None], ent[7][None], ent[8][None]
        dA, dB, dC = ent[9][None], ent[10][None], ent[11][None]
        sx = A0 + pxc * B0 + pyc * C0      # [P, ch]
        sy = A1 + pxc * B1 + pyc * C1
        sz = A2 + pxc * B2 + pyc * C2
        Dlin = dA + pxc * dB + pyc * dC
        rho2d = FILTER_INV_SQUARE * (dx * dx + dy * dy)

    sz_ok = jnp.abs(sz) > 1e-9
    safe = jnp.where(sz_ok, sz, 1e-9)
    inv = 1.0 / safe
    s2 = sx * sx + sy * sy
    rho3d = s2 * (inv * inv)
    use3d = rho3d <= rho2d
    rho = jnp.minimum(rho3d, rho2d)
    depth = Dlin * inv

    a_raw = opa * jnp.exp(-0.5 * rho)
    a1 = jnp.minimum(a_raw, MAX_ALPHA)
    gate = (a1 >= ALPHA_MIN) & (depth > 1e-6)
    alpha = jnp.where(gate, a1, 0.0)
    log1m = None if _V4 else jnp.log1p(-alpha)

    return dict(
        sx=sx, sy=sy, sz=sz, sz_ok=sz_ok, inv=inv, s2=s2,
        dx=dx, dy=dy, use3d=use3d,
        Dlin=Dlin, depth=depth, a_raw=a_raw, gate=gate, alpha=alpha,
        log1m=log1m,
    )


def _shift_fill1(x, j: int):
    """Lane-axis shift right by static ``j``, filling with the product
    identity (static slices + concat — Mosaic-friendly, no roll)."""
    return jnp.concatenate([jnp.ones_like(x[:, :j]), x[:, :-j]], axis=-1)


def carry_init(shape) -> jnp.ndarray:
    """Initial per-pixel transmittance carry: log-space 0 (V1/V3) or the
    multiplicative identity 1 (V4)."""
    return (
        jnp.ones(shape, jnp.float32) if _V4 else jnp.zeros(shape, jnp.float32)
    )


def _transmit(log1m, alpha, cl0, u_incl):
    """Weights from the transmittance chain, shared verbatim by the
    forward and the backward replay: (w, t_ex, keep, cl_last[P, 1]).

    The carry ``cl0``/``cl_last`` is log-transmittance for V1/V3 and the
    transmittance itself for V4 (see carry_init)."""
    if _V4:
        # exclusive prefix product of (1 - alpha) via Hillis-Steele on the
        # 128-lane axis: 8 static shifts + multiplies, zero transcendentals
        one_m = 1.0 - alpha
        ex = _shift_fill1(one_m, 1)
        j = 1
        while j < alpha.shape[-1]:
            ex = ex * _shift_fill1(ex, j)
            j *= 2
        t_ex = cl0 * ex                    # cl0 IS the transmittance here
        t_in = t_ex * one_m
        cl_last = t_in[:, -1:]
    elif _V3:
        # strict-prefix matmul gives the EXCLUSIVE log-T directly: one exp
        # yields t_ex with no [P, ch] division; t_in (keep gate only) is a
        # multiply. cl carry stays the inclusive value.
        u_strict = _tri_strict_upper(log1m.shape[-1])
        cl_ex = cl0 + _tri_dot(log1m, u_strict)
        t_ex = jnp.exp(cl_ex)
        t_in = t_ex * (1.0 - alpha)
        cl_last = cl_ex[:, -1:] + log1m[:, -1:]
    else:
        cl = cl0 + _tri_dot(log1m, u_incl)
        t_in = jnp.exp(cl)                 # one exp: t_ex = t_in/(1-alpha)
        t_ex = t_in / (1.0 - alpha)
        cl_last = cl[:, -1:]
    keep = t_in >= T_EPS
    w = jnp.where(keep, t_ex * alpha, 0.0)
    return w, t_ex, keep, cl_last


def _chunk_fwd(ent, pxc, pyc, cl0, cw0, cwd0):
    """One forward chunk given [P, 1] carries (cl/cum-w/cum-wd at start).

    Returns (out10 [10, P] channel contributions, wmax_row [ch],
    cl1, cw1, cwd1) with the new carries. Bit-for-bit this is the math the
    backward replays from the stored carries.
    """
    f = _chunk_planes(ent, pxc, pyc)
    u_incl, _ = _tri_mats(ent.shape[-1])
    depth, log1m, alpha = f["depth"], f["log1m"], f["alpha"]

    w, _, _, cl_last = _transmit(log1m, alpha, cl0, u_incl)
    wd = w * depth

    cum = cw0 + _tri_dot(w, u_incl)        # global inclusive weight prefix
    cum_wd = cwd0 + _tri_dot(wd, u_incl)
    a_ex = cum - w
    b_ex = cum_wd - wd
    first = jnp.maximum(
        (cum >= 0.5).astype(jnp.float32) - (a_ex >= 0.5).astype(jnp.float32),
        0.0,
    )

    feats = ent[15:21]                                   # [6, ch]
    outc = _dot(w, feats.T)                              # [P, 6]
    acc = jnp.sum(w, axis=-1)
    dmean = jnp.sum(wd, axis=-1)
    dmed = jnp.sum(depth * first, axis=-1)
    distort = 2.0 * jnp.sum(w * (depth * a_ex - b_ex), axis=-1)

    out10 = jnp.concatenate(
        [outc.T, acc[None], dmean[None], dmed[None], distort[None]], axis=0
    )                                                    # [10, P]
    wmax_row = jnp.max(w, axis=0)                        # [ch]
    return out10, wmax_row, cl_last, cum[:, -1:], cum_wd[:, -1:]


def _chunk_bwd(ent, pxc, pyc, cl0, cw0, tot_w, tot_wd, sfx_wd, sfx_wg,
               wmax_row, go, gw_row):
    """Analytic adjoint of one chunk, replayed from the stored carries.

    ent [F_ROWS, ch]; cl0/cw0 [P, 1] = stored forward carries at chunk
    start; tot_w/tot_wd [P, 1] = full-list totals (fwd acc/dmean rows);
    sfx_wd/sfx_wg [P, 1] = reverse carries (sum of wd / Gw*w over all later
    chunks); wmax_row [ch] = stored per-splat max weight; go [OR, P] output
    cotangent; gw_row [ch] per-splat wmax cotangent.

    Returns (d_ent [F_ROWS, ch], new_sfx_wd, new_sfx_wg).
    """
    ch = ent.shape[-1]
    p = pxc.shape[0]
    f = _chunk_planes(ent, pxc, pyc)
    depth, log1m, alpha = f["depth"], f["log1m"], f["alpha"]
    u_incl, l_strict = _tri_mats(ch)
    feats = ent[15:21]

    # exact replay of the forward weight math from the stored carries
    w, t_ex, keep, _ = _transmit(log1m, alpha, cl0, u_incl)
    wd = w * depth
    cum = cw0 + _tri_dot(w, u_incl)
    a_ex = cum - w
    first = jnp.maximum(
        (cum >= 0.5).astype(jnp.float32) - (a_ex >= 0.5).astype(jnp.float32),
        0.0,
    )

    # global suffix sums: reverse carry + within-chunk strict suffix
    Sw = tot_w - cum                                  # sum_{k>c} w_k (exact)
    Smw = sfx_wd + _tri_dot(wd, l_strict)                 # sum_{k>c} w_k m_k
    b_ex = tot_wd - wd - Smw                          # exclusive wd prefix

    go6 = go[0:6]                                     # [6, P]
    ga = go[6][:, None]                               # [P, 1]
    gd = go[7][:, None]
    gm = go[8][:, None]
    gq = go[9][:, None]

    # per-splat max-weight cotangent, split among tying pixels (jnp.max vjp).
    # w is replayed bit-exactly from the stored carries so the argmax pixel
    # always ties; the max(cnt, 1) guard only protects against NaN if a
    # compiler ever reassociates the replay differently.
    mtie = (w == wmax_row[None]).astype(jnp.float32)
    cnt = jnp.maximum(jnp.sum(mtie, axis=0, keepdims=True), 1.0)
    g_vis = gw_row[None] * mtie / cnt

    Gw = (
        jax.lax.dot_general(
            go6, feats, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )                                             # [P, ch] color/normal
        + ga
        + gd * depth
        + gq * 2.0 * (depth * a_ex - b_ex + Smw - depth * Sw)
        + g_vis
    )
    Gdepth = gd * w + gm * first + gq * 2.0 * w * (a_ex - Sw)

    # w -> alpha through the transmittance chain:
    #   dL/da_c = keep_c t_ex,c Gw_c - (1/(1-a_c)) sum_{k>c} Gw_k w_k
    WG = Gw * w
    S_sfx = sfx_wg + _tri_dot(WG, l_strict)
    Galpha = jnp.where(keep, Gw * t_ex, 0.0) - S_sfx / (1.0 - alpha)

    # alpha -> (opa, rho); gates carry no cotangent
    da1 = jnp.where(f["gate"], Galpha, 0.0)
    d_araw = jnp.where(f["a_raw"] <= MAX_ALPHA, da1, 0.0)
    d_rho = -0.5 * f["a_raw"] * d_araw
    # gauss = exp(-0.5*rho) recovered as a_raw/opa (a_raw = opa*gauss by
    # construction) — saves two [P, ch] exp evaluations per chunk on the
    # VPU. Exactness: only d_opa flows through gauss (the weight replay
    # never does), and sentinel rows (opa == 0) have gate == 0 so
    # d_araw == 0 there — the reciprocal guard value is never observed.
    opa = ent[14][None]
    gauss = f["a_raw"] / jnp.where(opa > 0.0, opa, 1.0)
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

    # reductions over pixels -> per-entry rows
    ones = jnp.ones((p, 1), jnp.float32)
    Q = jnp.concatenate([ones, pxc, pyc], axis=1)     # [P, 3]

    def red(dplane):  # [3, ch]: rows = (sum, sum px*, sum py*)
        return jax.lax.dot_general(
            Q, dplane, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32, precision=_HI,
        )

    RX, RY, RZ, RD = red(d_sx), red(d_sy), red(d_sz), red(d_Dlin)
    rABC = jnp.stack([RX, RY, RZ], axis=1).reshape(9, ch)

    d_feats = jax.lax.dot_general(
        go6, w, (((1,), (0,)), ((), ())),
        preferred_element_type=jnp.float32, precision=_HI,
    )                                                 # [6, ch]

    d_ent = jnp.concatenate(
        [
            rABC,                                     # 0..8
            RD,                                       # 9..11
            jnp.sum(d_mx, axis=0)[None],              # 12
            jnp.sum(d_my, axis=0)[None],              # 13
            jnp.sum(d_opa, axis=0)[None],             # 14
            d_feats,                                  # 15..20
            jnp.zeros((F_ROWS - 21, ch), jnp.float32),
        ],
        axis=0,
    )
    new_sfx_wd = sfx_wd + jnp.sum(wd, axis=-1, keepdims=True)
    new_sfx_wg = sfx_wg + jnp.sum(WG, axis=-1, keepdims=True)
    return d_ent, new_sfx_wd, new_sfx_wg


def _chunk_active(ent, cl_carry):
    """EXACT chunk-skip test: all-sentinel (max opa == 0) or saturated
    chunks contribute exactly zero weight everywhere. V1/V3 carry is
    log-T (margin guards exp rounding); V4 carry is T itself, where
    t_in <= T_carry holds exactly (every (1-alpha) factor <= 1) so the
    T_EPS compare needs no margin."""
    opa_max = jnp.max(ent[14])
    if _V4:
        unsat = jnp.max(cl_carry) >= T_EPS
    else:
        unsat = jnp.max(cl_carry) >= _LOG_TEPS - _SKIP_MARGIN
    return jnp.logical_and(opa_max > 0.0, unsat)


# ---------------------------------------------------------------------------
# Pallas kernels
# ---------------------------------------------------------------------------

def _fwd_kernel(ent_ref, out_ref, wmax_ref, cl_s, cw_s, cwd_s, *,
                tiles_x: int, tile_size: int, nc: int, kt: int = 1):
    """Forward grid step over ``kt`` tiles (static python unroll): fewer
    grid iterations amortize per-step overhead and batch DMA; each subtile
    keeps its OWN carries in scratch and its OWN exact skip test, so the
    semantics are identical to kt=1 (unlike the rejected raster_v2, no
    cross-step in-register carries are introduced)."""
    tb = pl.program_id(0)
    j = pl.program_id(1)
    orows = out_ref.shape[1]
    p = tile_size * tile_size

    @pl.when(j == 0)
    def _init():
        out_ref[...] = jnp.zeros_like(out_ref)
        cl_s[...] = carry_init(cl_s.shape)
        cw_s[...] = jnp.zeros_like(cw_s)
        cwd_s[...] = jnp.zeros_like(cwd_s)

    for k in range(kt):
        ent = ent_ref[k]
        cl0 = cl_s[k]
        active = _chunk_active(ent, cl0)

        @pl.when(active)
        def _work(k=k, ent=ent, cl0=cl0):
            pxc, pyc = _tile_pixels(
                tb * kt + k, tiles_x, tile_size
            )
            cw0, cwd0 = cw_s[k], cwd_s[k]
            out10, wmax_row, cl1, cw1, cwd1 = _chunk_fwd(
                ent, pxc, pyc, cl0, cw0, cwd0
            )
            out_ref[k, 0:10] = out_ref[k, 0:10] + out10
            # stored carries-at-chunk-start: rows 10+j (cl), 10+nc+j (cum-w)
            out_ref[k, pl.ds(10 + j, 1), :] = cl0.T
            out_ref[k, pl.ds(10 + nc + j, 1), :] = cw0.T
            wmax_ref[k] = jnp.concatenate(
                [
                    wmax_row[None],
                    jnp.ones((1, ent.shape[-1]), jnp.float32),
                    jnp.zeros((6, ent.shape[-1]), jnp.float32),
                ],
                axis=0,
            )
            cl_s[k] = cl1
            cw_s[k] = cw1
            cwd_s[k] = cwd1

        @pl.when(jnp.logical_not(active))
        def _skip(k=k, ent=ent):
            wmax_ref[k] = jnp.zeros((8, ent.shape[-1]), jnp.float32)


def _bwd_kernel(ent_ref, outv_ref, wm_ref, go_ref, gw_ref, dent_ref,
                sfx_wd_s, sfx_wg_s, *, tiles_x: int, tile_size: int,
                nc: int, kt: int = 1):
    tb = pl.program_id(0)
    j = pl.program_id(1)          # reverse chunk = nc - 1 - j via index maps
    cj = nc - 1 - j

    @pl.when(j == 0)
    def _init():
        sfx_wd_s[...] = jnp.zeros_like(sfx_wd_s)
        sfx_wg_s[...] = jnp.zeros_like(sfx_wg_s)

    for k in range(kt):
        ent = ent_ref[k]
        ch = ent.shape[-1]
        active = jnp.max(wm_ref[k, 1]) > 0.0

        @pl.when(active)
        def _work(k=k, ent=ent):
            pxc, pyc = _tile_pixels(
                tb * kt + k, tiles_x, tile_size
            )
            cl0 = outv_ref[k, pl.ds(10 + cj, 1), :].T
            cw0 = outv_ref[k, pl.ds(10 + nc + cj, 1), :].T
            tot_w = outv_ref[k, 6][:, None]
            tot_wd = outv_ref[k, 7][:, None]
            d_ent, nwd, nwg = _chunk_bwd(
                ent, pxc, pyc, cl0, cw0, tot_w, tot_wd,
                sfx_wd_s[k], sfx_wg_s[k],
                wm_ref[k, 0], go_ref[k], gw_ref[k, 0],
            )
            dent_ref[k] = d_ent
            sfx_wd_s[k] = nwd
            sfx_wg_s[k] = nwg

        @pl.when(jnp.logical_not(active))
        def _skip(k=k, ch=ch):
            dent_ref[k] = jnp.zeros((F_ROWS, ch), jnp.float32)


def _pad_tiles(x, kt: int):
    """Pad axis 0 to a multiple of kt with zeros (opa row 0 -> inactive)."""
    t = x.shape[0]
    pad = (-t) % kt
    if pad == 0:
        return x
    return jnp.concatenate(
        [x, jnp.zeros((pad,) + x.shape[1:], x.dtype)], axis=0
    )


def _composite_fwd_pallas(entries_t: jnp.ndarray, tiles_x: int,
                          tile_size: int, kt: int = 1):
    """entries_t: [T, F_ROWS, C] -> (out [T, OR, P], wmax [T, 8, C])."""
    t_tiles, f_rows, c = entries_t.shape
    assert f_rows == F_ROWS
    nc = n_chunks(c)
    orows = o_rows(nc)
    p = tile_size * tile_size
    ent_p = _pad_tiles(entries_t, kt)
    tp = ent_p.shape[0]
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, tile_size=tile_size, nc=nc, kt=kt
    )
    out, wm = pl.pallas_call(
        kernel,
        grid=(tp // kt, nc),
        in_specs=[
            pl.BlockSpec((kt, F_ROWS, CHUNK), lambda t, j: (t, 0, j),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((kt, orows, p), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 8, CHUNK), lambda t, j: (t, 0, j),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, orows, p), jnp.float32),
            jax.ShapeDtypeStruct((tp, 8, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((kt, p, 1), jnp.float32),
            pltpu.VMEM((kt, p, 1), jnp.float32),
            pltpu.VMEM((kt, p, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(ent_p)
    return out[:t_tiles], wm[:t_tiles]


def _composite_bwd_pallas(entries_t, out_vals, wm_vals, g_out, g_wmax,
                          tiles_x: int, tile_size: int, kt: int = 1):
    """Analytic backward. Runs chunks in reverse; needs the forward's
    outputs (out_vals carries the per-chunk cl/cum rows; wm_vals carries
    per-splat max weights and the chunk-active flags)."""
    t_tiles, f_rows, c = entries_t.shape
    nc = n_chunks(c)
    orows = o_rows(nc)
    p = tile_size * tile_size
    args = [
        _pad_tiles(a, kt)
        for a in (entries_t, out_vals, wm_vals, g_out, g_wmax)
    ]
    tp = args[0].shape[0]
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, tile_size=tile_size, nc=nc, kt=kt
    )
    rev = lambda t, j: (t, 0, nc - 1 - j)
    d_ent = pl.pallas_call(
        kernel,
        grid=(tp // kt, nc),
        in_specs=[
            pl.BlockSpec((kt, F_ROWS, CHUNK), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, orows, p), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 8, CHUNK), rev, memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, orows, p), lambda t, j: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 8, CHUNK), rev, memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((kt, F_ROWS, CHUNK), rev,
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((tp, F_ROWS, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((kt, p, 1), jnp.float32),
            pltpu.VMEM((kt, p, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(*args)
    return d_ent[:t_tiles]


# ---------------------------------------------------------------------------
# Pure-jnp twins (CPU path + parity tests) — same chunk math, vmapped
# ---------------------------------------------------------------------------

def _fwd_one_tile(t, ent, tiles_x: int, tile_size: int):
    """Chunk-faithful forward for ONE tile: ent [F_ROWS, C]."""
    c = ent.shape[-1]
    nc = n_chunks(c)
    orows = o_rows(nc)
    p = tile_size * tile_size
    pxc, pyc = _tile_pixels(t, tiles_x, tile_size)
    out = jnp.zeros((orows, p), jnp.float32)
    wm = jnp.zeros((8, c), jnp.float32)
    cl = carry_init((p, 1))
    cw = jnp.zeros((p, 1), jnp.float32)
    cwd = jnp.zeros((p, 1), jnp.float32)
    for j in range(nc):
        e = ent[:, j * CHUNK:(j + 1) * CHUNK]
        act = _chunk_active(e, cl).astype(jnp.float32)
        out10, wmax_row, cl1, cw1, cwd1 = _chunk_fwd(e, pxc, pyc, cl, cw, cwd)
        out = out.at[0:10].add(act * out10)
        out = out.at[10 + j].set(
            jnp.where(act > 0, cl[:, 0], out[10 + j])
        )
        out = out.at[10 + nc + j].set(
            jnp.where(act > 0, cw[:, 0], out[10 + nc + j])
        )
        wm = wm.at[0, j * CHUNK:(j + 1) * CHUNK].set(act * wmax_row)
        wm = wm.at[1, j * CHUNK:(j + 1) * CHUNK].set(act)
        cl = jnp.where(act > 0, cl1, cl)
        cw = jnp.where(act > 0, cw1, cw)
        cwd = jnp.where(act > 0, cwd1, cwd)
    return out, wm


def _bwd_one_tile(t, ent, out_vals, wm_vals, go, gw, tiles_x: int,
                  tile_size: int):
    c = ent.shape[-1]
    nc = n_chunks(c)
    p = tile_size * tile_size
    pxc, pyc = _tile_pixels(t, tiles_x, tile_size)
    sfx_wd = jnp.zeros((p, 1), jnp.float32)
    sfx_wg = jnp.zeros((p, 1), jnp.float32)
    tot_w = out_vals[6][:, None]
    tot_wd = out_vals[7][:, None]
    d_ent = jnp.zeros((F_ROWS, c), jnp.float32)
    for cj in reversed(range(nc)):
        sl = slice(cj * CHUNK, (cj + 1) * CHUNK)
        e = ent[:, sl]
        act = (wm_vals[1, sl][0] > 0).astype(jnp.float32)
        cl0 = out_vals[10 + cj][:, None]
        cw0 = out_vals[10 + nc + cj][:, None]
        d, nwd, nwg = _chunk_bwd(
            e, pxc, pyc, cl0, cw0, tot_w, tot_wd, sfx_wd, sfx_wg,
            wm_vals[0, sl], go, gw[0, sl],
        )
        d_ent = d_ent.at[:, sl].set(act * d)
        sfx_wd = jnp.where(act > 0, nwd, sfx_wd)
        sfx_wg = jnp.where(act > 0, nwg, sfx_wg)
    return d_ent


def composite_fwd_reference(entries_t, tiles_x: int, tile_size: int):
    """Vmapped pure-JAX twin of the chunked forward (tests/CPU)."""
    tids = jnp.arange(entries_t.shape[0], dtype=jnp.int32)
    return jax.vmap(
        lambda t, e: _fwd_one_tile(t, e, tiles_x, tile_size)
    )(tids, entries_t)


def composite_bwd_reference(entries_t, out_vals, wm_vals, g_out, g_wmax,
                            tiles_x: int, tile_size: int):
    """Vmapped pure-JAX twin of the chunked analytic backward."""
    tids = jnp.arange(entries_t.shape[0], dtype=jnp.int32)
    return jax.vmap(
        lambda t, e, ov, wv, go, gw: _bwd_one_tile(
            t, e, ov, wv, go, gw, tiles_x, tile_size
        )
    )(tids, entries_t, out_vals, wm_vals, g_out, g_wmax)


def _composite_ref_jax(entries_t: jnp.ndarray, tiles_x: int, tile_size: int,
                       tile_batch: int = 16, remat: bool = True):
    """Independent full-width (unchunked) reference with the same
    channel-row layout — the autodiff cross-check of the analytic backward.
    Carry rows (10+) are left zero; compare rows 0..9 and wmax row 0."""
    from ...gs.rasterize_jax import composite, pixel_weights_from_coeffs

    t_tiles, f_rows, c = entries_t.shape
    nc = n_chunks(c)
    orows = o_rows(nc)
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
        out = jnp.zeros((e.shape[0], orows, p), jnp.float32)
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
        outs.reshape(-1, orows, p)[:t_tiles],
        wms.reshape(-1, 8, c)[:t_tiles],
    )


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2, 3))
def tile_composite(entries_t, tiles_x: int, tile_size: int, kt: int = 1):
    """Differentiable fused tile compositing; chunked early-stop Pallas
    forward with a hand-derived analytic chunked Pallas backward.
    ``kt`` > 1 processes kt tiles per grid step (identical semantics;
    amortized step overhead)."""
    return _composite_fwd_pallas(entries_t, tiles_x, tile_size, kt)


def _tc_fwd(entries_t, tiles_x, tile_size, kt):
    out, wm = _composite_fwd_pallas(entries_t, tiles_x, tile_size, kt)
    return (out, wm), (entries_t, out, wm)


def _tc_bwd(tiles_x, tile_size, kt, res, g):
    entries_t, out, wm = res
    g_out, g_wmax = g
    d_entries = _composite_bwd_pallas(
        entries_t, out, wm, g_out, g_wmax, tiles_x, tile_size, kt
    )
    return (d_entries,)


tile_composite.defvjp(_tc_fwd, _tc_bwd)


def tile_composite_reference(entries_t, tiles_x: int, tile_size: int):
    """Same contract, fully pure-JAX (CPU and parity tests)."""
    return composite_fwd_reference(entries_t, tiles_x, tile_size)
