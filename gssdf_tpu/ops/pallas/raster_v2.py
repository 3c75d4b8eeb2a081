"""Restructured tile-compositing kernels (opt-in, pending chip validation).

Same chunk math and gradient semantics as ``raster.py`` (all shared helpers
are imported from there) with two scheduling changes:

  1. ONE grid step per ``TILES_PER_STEP`` tiles instead of a (T, nc) grid —
     the tile x chunk loops are static unrolls inside the kernel, so carries
     never round-trip through VMEM block boundaries and per-grid-step
     overhead is amortized over kt * nc chunk bodies.
  2. Full-width entry blocks ([kt, F_ROWS, cap] in VMEM, ~24 KB/tile at
     cap 256) instead of CHUNK-wide streamed blocks.

Interpret-mode parity vs the pure-JAX twins is covered by
tests/test_pallas_raster.py (parametrized over both modules). Select at
runtime with ``GSSDF_RASTER_V2=1`` (read in gs/rasterize_tiled.py); promote
to default once real-Mosaic parity + timings are in (see ARCHITECTURE.md).
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from .raster import (
    CHUNK,
    F_ROWS,
    _chunk_active,
    _chunk_bwd,
    _chunk_fwd,
    _tile_pixels,
    n_chunks,
    o_rows,
)
from .raster import (  # re-exported for parity tests
    composite_bwd_reference,
    composite_fwd_reference,
)

_INTERPRET = False

# tiles per Pallas grid step: amortizes per-step overhead over more work;
# sweepable on chip (read at trace time)
TILES_PER_STEP = 4


def _pad_tiles(x: jnp.ndarray, kt: int):
    """Pad the leading tile axis to a multiple of kt with zero tiles
    (zero opacity rows = all-sentinel -> the kernel skips them)."""
    t = x.shape[0]
    pad = -t % kt
    if pad:
        x = jnp.concatenate([x, jnp.zeros((pad,) + x.shape[1:], x.dtype)])
    return x


def _fwd_kernel(ent_ref, out_ref, wmax_ref, cl_s, cw_s, cwd_s, *,
                tiles_x: int, tile_size: int, nc: int, kt: int):
    t = pl.program_id(0)
    orows = out_ref.shape[1]
    p = tile_size * tile_size

    for ki in range(kt):
        out_ref[ki] = jnp.zeros((orows, p), jnp.float32)
        wmax_ref[ki] = jnp.zeros_like(wmax_ref[ki])
        cl_s[...] = jnp.zeros_like(cl_s)
        cw_s[...] = jnp.zeros_like(cw_s)
        cwd_s[...] = jnp.zeros_like(cwd_s)
        pxc, pyc = _tile_pixels(t * kt + ki, tiles_x, tile_size)
        ent_all = ent_ref[ki]

        for j in range(nc):
            sl = slice(j * CHUNK, (j + 1) * CHUNK)
            ent = ent_all[:, sl]
            cl0 = cl_s[...]
            active = _chunk_active(ent, cl0)

            @pl.when(active)
            def _work(ki=ki, j=j, sl=sl, ent=ent, cl0=cl0, pxc=pxc, pyc=pyc):
                cw0, cwd0 = cw_s[...], cwd_s[...]
                out10, wmax_row, cl1, cw1, cwd1 = _chunk_fwd(
                    ent, pxc, pyc, cl0, cw0, cwd0
                )
                out_ref[ki, 0:10] = out_ref[ki, 0:10] + out10
                # carries-at-chunk-start: rows 10+j (cl), 10+nc+j (cum-w)
                out_ref[ki, 10 + j:11 + j, :] = cl0.T
                out_ref[ki, 10 + nc + j:11 + nc + j, :] = cw0.T
                wmax_ref[ki, 0:1, sl] = wmax_row[None]
                wmax_ref[ki, 1:2, sl] = jnp.ones_like(wmax_row)[None]
                cl_s[...] = cl1
                cw_s[...] = cw1
                cwd_s[...] = cwd1


def _bwd_kernel(ent_ref, outv_ref, wm_ref, go_ref, gw_ref, dent_ref,
                sfx_wd_s, sfx_wg_s, *, tiles_x: int, tile_size: int,
                nc: int, kt: int):
    t = pl.program_id(0)
    c = ent_ref.shape[-1]

    for ki in range(kt):
        dent_ref[ki] = jnp.zeros((F_ROWS, c), jnp.float32)
        sfx_wd_s[...] = jnp.zeros_like(sfx_wd_s)
        sfx_wg_s[...] = jnp.zeros_like(sfx_wg_s)
        pxc, pyc = _tile_pixels(t * kt + ki, tiles_x, tile_size)
        ent_all = ent_ref[ki]
        tot_w = outv_ref[ki, 6][:, None]
        tot_wd = outv_ref[ki, 7][:, None]

        for cj in reversed(range(nc)):
            sl = slice(cj * CHUNK, (cj + 1) * CHUNK)
            ent = ent_all[:, sl]
            active = jnp.max(wm_ref[ki, 1, sl]) > 0.0

            @pl.when(active)
            def _work(ki=ki, cj=cj, sl=sl, ent=ent, pxc=pxc, pyc=pyc,
                      tot_w=tot_w, tot_wd=tot_wd):
                cl0 = outv_ref[ki, pl.ds(10 + cj, 1), :].T
                cw0 = outv_ref[ki, pl.ds(10 + nc + cj, 1), :].T
                d_ent, nwd, nwg = _chunk_bwd(
                    ent, pxc, pyc, cl0, cw0, tot_w, tot_wd,
                    sfx_wd_s[...], sfx_wg_s[...],
                    wm_ref[ki, 0, sl], go_ref[ki], gw_ref[ki, 0, sl],
                )
                dent_ref[ki, :, sl] = d_ent
                sfx_wd_s[...] = nwd
                sfx_wg_s[...] = nwg


def _composite_fwd_pallas(entries_t: jnp.ndarray, tiles_x: int,
                          tile_size: int):
    """entries_t: [T, F_ROWS, C] -> (out [T, OR, P], wmax [T, 8, C])."""
    t_tiles, f_rows, c = entries_t.shape
    assert f_rows == F_ROWS
    nc = n_chunks(c)
    orows = o_rows(nc)
    p = tile_size * tile_size
    kt = TILES_PER_STEP
    ent_p = _pad_tiles(entries_t, kt)
    tp = ent_p.shape[0]
    kernel = functools.partial(
        _fwd_kernel, tiles_x=tiles_x, tile_size=tile_size, nc=nc, kt=kt
    )
    out, wm = pl.pallas_call(
        kernel,
        grid=(tp // kt,),
        in_specs=[
            pl.BlockSpec((kt, F_ROWS, c), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=(
            pl.BlockSpec((kt, orows, p), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((kt, 8, c), lambda t: (t, 0, 0),
                         memory_space=pltpu.VMEM),
        ),
        out_shape=(
            jax.ShapeDtypeStruct((tp, orows, p), jnp.float32),
            jax.ShapeDtypeStruct((tp, 8, c), jnp.float32),
        ),
        scratch_shapes=[
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(ent_p)
    return out[:t_tiles], wm[:t_tiles]


def _composite_bwd_pallas(entries_t, out_vals, wm_vals, g_out, g_wmax,
                          tiles_x: int, tile_size: int):
    t_tiles, f_rows, c = entries_t.shape
    nc = n_chunks(c)
    orows = o_rows(nc)
    p = tile_size * tile_size
    kt = TILES_PER_STEP
    args = tuple(
        _pad_tiles(x, kt)
        for x in (entries_t, out_vals, wm_vals, g_out, g_wmax)
    )
    tp = args[0].shape[0]
    kernel = functools.partial(
        _bwd_kernel, tiles_x=tiles_x, tile_size=tile_size, nc=nc, kt=kt
    )
    full = lambda rows: pl.BlockSpec(
        (kt, rows, c), lambda t: (t, 0, 0), memory_space=pltpu.VMEM
    )
    pix = pl.BlockSpec((kt, orows, p), lambda t: (t, 0, 0),
                       memory_space=pltpu.VMEM)
    return pl.pallas_call(
        kernel,
        grid=(tp // kt,),
        in_specs=[full(F_ROWS), pix, full(8), pix, full(8)],
        out_specs=full(F_ROWS),
        out_shape=jax.ShapeDtypeStruct((tp, F_ROWS, c), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((p, 1), jnp.float32),
            pltpu.VMEM((p, 1), jnp.float32),
        ],
        interpret=_INTERPRET,
    )(*args)[:t_tiles]


@functools.partial(jax.custom_vjp, nondiff_argnums=(1, 2))
def tile_composite(entries_t, tiles_x: int, tile_size: int):
    """Differentiable fused tile compositing (v2 scheduling)."""
    return _composite_fwd_pallas(entries_t, tiles_x, tile_size)


def _tc_fwd(entries_t, tiles_x, tile_size):
    out, wm = _composite_fwd_pallas(entries_t, tiles_x, tile_size)
    return (out, wm), (entries_t, out, wm)


def _tc_bwd(tiles_x, tile_size, res, g):
    entries_t, out, wm = res
    g_out, g_wmax = g
    d_entries = _composite_bwd_pallas(
        entries_t, out, wm, g_out, g_wmax, tiles_x, tile_size
    )
    return (d_entries,)


tile_composite.defvjp(_tc_fwd, _tc_bwd)
