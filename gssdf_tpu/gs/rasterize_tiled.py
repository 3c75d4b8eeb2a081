"""Tiled 2DGS rasterizer — the production TPU path.

Reference analog: ``gsplat_cpp::tile_encode`` + ``rasterize_to_pixels_2dgs``
(called at neural_gaussian.cpp:207-223). The CUDA version builds dynamic
per-tile splat lists with atomics and composites pixels sequentially with
early stopping. Neither maps to TPU, so this is a redesign:

  1. **Binning = sort.** Splats are depth-sorted once (stable argsort), then
     each splat emits up to ``tile_expand`` (tile_id, splat) entries covering
     its screen bbox. A single stable sort by tile_id groups entries per
     tile while preserving depth order (XLA sort, no atomics).
  2. **Fixed capacity.** Entries scatter into a ``[num_tiles, tile_cap]``
     index table (nearest ``tile_cap`` splats win — matches CUDA early-stop
     behavior where far splats get negligible transmittance).
  3. **Compositing = cumprod + matmul.** Per 16x16 tile, transmittance is an
     exclusive cumprod over the splat axis and every channel is
     ``w[pixels, splats] @ feats[splats, ch]`` on the MXU.
  4. ``lax.scan`` over tile batches with ``jax.checkpoint`` bounds memory:
     the [pixels, splats] weight matrices are rematerialized in backward.

Gradient taps: d(loss)/d(pix_delta) reproduces the reference's densify
``gradient_2dgs`` tensor; per-splat ``visibilities`` (max pixel weight) are
differentiable and feed the GS->SDF regularizer.
"""

from __future__ import annotations

import functools
import os
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from ..ops.pallas.segsum import segment_max, table_gather
from .rasterize_jax import composite, pixel_weights_from_coeffs, splat_coeffs

# opt-in: build the [T, cap] tile table with overlapped scalar-prefetch
# DMAs instead of a vmapped dynamic-slice gather (chip verdict pending;
# see ops/pallas/table_build.py)
_TABLE_DMA = os.environ.get("GSSDF_TABLE_DMA", "0") == "1"


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def _true_bbox(
    means2d: jnp.ndarray,   # [N, 2]
    radii: jnp.ndarray,     # [N]
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
):
    """Grid-clamped tile-space bbox + center tile per splat (all int32)."""
    mx, my = means2d[:, 0], means2d[:, 1]
    r = radii
    tx0 = jnp.clip(jnp.floor((mx - r) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    ctx = jnp.clip(jnp.floor(mx / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(my / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    return tx0, tx1, ty0, ty1, ctx, cty


def _win_dims(expand: int):
    """Static power-of-2 window (w, h) with w*h == expand: entry decode is
    shift/mask instead of a per-splat integer div/mod."""
    win_w = 1 << max((expand.bit_length() - 1) // 2, 0)  # ~sqrt(expand)
    return win_w, expand // win_w


def _window(tx0, tx1, ty0, ty1, ctx, cty, valid, expand: int):
    """Clamp the true bbox to an ``expand``-tile window containing the
    splat's center tile (huge splats degrade to a centered window instead of
    overflowing the static entry budget)."""
    win_w, win_h = _win_dims(expand)
    sx = jnp.minimum(tx1 - tx0 + 1, win_w)
    sy = jnp.minimum(ty1 - ty0 + 1, win_h)
    tx0c = jnp.clip(ctx - sx // 2, tx0, tx1 - sx + 1)
    ty0c = jnp.clip(cty - sy // 2, ty0, ty1 - sy + 1)
    z = jnp.zeros_like(sx)
    return tx0c, ty0c, jnp.where(valid, sx, z), jnp.where(valid, sy, z)


def tile_bbox(
    means2d: jnp.ndarray,   # [N, 2]
    radii: jnp.ndarray,     # [N]
    valid: jnp.ndarray,     # [N] bool
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    expand: int,
):
    """Clamped tile-space bbox per splat: (tx0, ty0, span_x, span_y)."""
    tx0, tx1, ty0, ty1, ctx, cty = _true_bbox(
        means2d, radii, tiles_x, tiles_y, tile_size
    )
    return _window(tx0, tx1, ty0, ty1, ctx, cty, valid, expand)


def _emit_entries(x0c, y0c, sx, sy, ranks, ids, expand: int, tiles_x: int,
                  num_tiles: int, rank_bits: int, tile_size: int,
                  mx=None, my=None, rad=None):
    """Flat (packed sort key, splat-id payload) entry streams for one bucket.

    Key = (tile_id << rank_bits) | depth_rank — unique, so the binning sort
    can be unstable. Entries outside the window get the sentinel tile.

    When (mx, my, rad) are given, entries whose tile RECT lies entirely
    farther than the splat's alpha-cutoff radius are culled (circle-rect
    intersection): the bbox window includes corner tiles the projected
    Gaussian never reaches at visible alpha — they consume tile capacity
    and sort rows for zero contribution. The CUDA reference composites
    them at negligible alpha instead; culling them here is exact to the
    same cutoff the radius already encodes (projection.py).
    """
    win_w, _ = _win_dims(expand)
    e = jnp.arange(expand, dtype=jnp.int32)                  # [E]
    ex = (e & (win_w - 1))[None, :]
    ey = (e >> (win_w.bit_length() - 1))[None, :]
    ok = (ex < sx[:, None]) & (ey < sy[:, None])
    tx = x0c[:, None] + ex
    ty = y0c[:, None] + ey
    if mx is not None:
        fx = tx.astype(jnp.float32) * tile_size
        fy = ty.astype(jnp.float32) * tile_size
        dx = jnp.clip(mx[:, None], fx, fx + tile_size) - mx[:, None]
        dy = jnp.clip(my[:, None], fy, fy + tile_size) - my[:, None]
        ok = ok & (dx * dx + dy * dy <= (rad * rad)[:, None])
    tid = jnp.where(ok, ty * tiles_x + tx, num_tiles)        # sentinel tile
    key = (tid << rank_bits) | ranks[:, None]
    pay = jnp.broadcast_to(ids[:, None], tid.shape)
    return key.reshape(-1), pay.reshape(-1)


def tile_encode(
    means2d: jnp.ndarray,
    radii: jnp.ndarray,
    depths: jnp.ndarray,
    valid: jnp.ndarray,
    width: int,
    height: int,
    tile_size: int,
    tile_cap: int,
    tile_expand: int,
    tile_expand_small: int = 0,
):
    """Depth-sorted fixed-capacity tile lists.

    Returns (tile_lists [T, C] int32 indices into the ORIGINAL splat arrays
    with sentinel = N, counts [T] int32). Within a tile, indices are
    front-to-back.

    ``tile_expand_small`` > 0 enables TWO-BUCKET entry budgets: the n/8
    largest-bbox splats keep the full ``tile_expand`` window, the rest emit
    only ``tile_expand_small`` entries. Most splats cover 1-4 tiles, so this
    shrinks the binning sort ~3x at the same coverage; splats whose window
    got clamped below their true bbox are counted in ``clamp_frac``.
    """
    n = means2d.shape[0]
    assert tile_expand & (tile_expand - 1) == 0, "tile_expand must be 2^k"
    tiles_x = _cdiv(width, tile_size)
    tiles_y = _cdiv(height, tile_size)
    num_tiles = tiles_x * tiles_y

    # Pack (tile, depth-rank) into ONE int32 key so the binning sort can be
    # UNSTABLE (measurably faster than the stable 2-operand sort on TPU:
    # 6.2 vs 9.6 ms at 4.2M entries). When n splats exceed the rank-bit
    # budget left by the tile id, ranks are QUANTIZED (low bits dropped):
    # keys then collide only between splats adjacent in global depth order,
    # whose within-tile order is arbitrary — the same tolerance every
    # 32-bit-depth-key CUDA rasterizer has.
    rank_bits_needed = max(n - 1, 1).bit_length()
    tile_bits = (num_tiles + 1).bit_length()
    rank_bits = min(rank_bits_needed, 30 - tile_bits)
    rank_shift = rank_bits_needed - rank_bits
    assert rank_bits == rank_bits_needed or rank_bits >= 8, (
        "tile count leaves <8 depth-rank bits; reduce the tile count"
    )

    # bboxes in ORIGINAL splat order (permutation gathers on 131k+ rows cost
    # more than the extra inverse-argsort: TPU gathers pay ~6-10 ns/row)
    tx0, tx1, ty0, ty1, ctx, cty = _true_bbox(
        means2d, radii, tiles_x, tiles_y, tile_size
    )
    order = jnp.argsort(jnp.where(valid, depths, jnp.inf))
    rank = jnp.argsort(order).astype(jnp.int32)   # depth rank per splat
    if rank_shift > 0:
        rank = rank >> rank_shift
    n_valid = jnp.maximum(jnp.sum(valid), 1)

    two_bucket = (
        0 < tile_expand_small < tile_expand and n >= 64
    )
    if two_bucket:
        assert tile_expand_small & (tile_expand_small - 1) == 0
        k_big = max(n // 8, 1)
        area = jnp.where(valid, (tx1 - tx0 + 1) * (ty1 - ty0 + 1), 0)
        by_area = jnp.argsort(-area).astype(jnp.int32)
        # ONE packed row gather per bucket instead of 8 scalar gathers
        cols = jnp.stack(
            [tx0, tx1, ty0, ty1, ctx, cty, rank, valid.astype(jnp.int32)],
            axis=1,
        )

        fcols = jnp.concatenate([means2d, radii[:, None]], axis=1)  # [N, 3]

        def bucket(ids, expand):
            c = cols[ids]
            f = fcols[ids]
            v = c[:, 7] > 0
            x0c, y0c, sx, sy = _window(
                c[:, 0], c[:, 1], c[:, 2], c[:, 3], c[:, 4], c[:, 5], v,
                expand,
            )
            key, pay = _emit_entries(
                x0c, y0c, sx, sy, c[:, 6], ids, expand, tiles_x, num_tiles,
                rank_bits, tile_size, f[:, 0], f[:, 1], f[:, 2],
            )
            clamped = jnp.sum(
                ((sx < c[:, 1] - c[:, 0] + 1) | (sy < c[:, 3] - c[:, 2] + 1))
                & v
            )
            return key, pay, clamped

        kb, pb, cb = bucket(by_area[:k_big], tile_expand)
        ks, ps, cs = bucket(by_area[k_big:], tile_expand_small)
        flat_key = jnp.concatenate([kb, ks])
        flat_pay = jnp.concatenate([pb, ps])
        clamp_frac = ((cb + cs) / n_valid).astype(jnp.float32)
    else:
        x0c, y0c, sx, sy = _window(
            tx0, tx1, ty0, ty1, ctx, cty, valid, tile_expand
        )
        flat_key, flat_pay = _emit_entries(
            x0c, y0c, sx, sy, rank, jnp.arange(n, dtype=jnp.int32),
            tile_expand, tiles_x, num_tiles, rank_bits, tile_size,
            means2d[:, 0], means2d[:, 1], radii,
        )
        clamp_frac = (
            jnp.sum(((sx < tx1 - tx0 + 1) | (sy < ty1 - ty0 + 1)) & valid)
            / n_valid
        ).astype(jnp.float32)
    sorted_key, sorted_pay = jax.lax.sort(
        (flat_key, flat_pay), num_keys=1, is_stable=False
    )

    # entries are now grouped by tile: tile t's run is
    # [starts[t], starts[t+1]). Because each tile's sources are a
    # CONTIGUOUS run, the [T, cap] table is T dynamic slices (lowered to
    # one gather with slice_sizes=[cap]) — per-SLICE latency instead of
    # the ~6-10 ns/row a T*cap-element row gather pays on TPU. The
    # stream is padded with cap sentinels so no slice ever clamps.
    starts = jnp.searchsorted(
        sorted_key, jnp.arange(num_tiles + 1) << rank_bits, side="left"
    )
    r_idx = jnp.arange(tile_cap, dtype=jnp.int32)
    src = starts[:-1, None] + r_idx[None, :]              # [T, cap]
    in_seg = src < starts[1:, None]
    pay_pad = jnp.concatenate(
        [sorted_pay, jnp.full((tile_cap,), n, jnp.int32)]
    )
    if _TABLE_DMA:
        # scalar-prefetch DMA rows (ops/pallas/table_build.py): the slice
        # gather below is dispatch-latency-priced (~1.7 us/slice = 5.4 ms
        # at the bench regime, PERF_r04 section 4); overlapped DMAs price
        # it at bandwidth. Opt-in until a chip verdict.
        from ..ops.pallas.table_build import table_rows_dma

        vals = table_rows_dma(
            pay_pad, starts[:-1].astype(jnp.int32), tile_cap
        )
    else:
        vals = jax.vmap(
            lambda s: jax.lax.dynamic_slice(pay_pad, (s,), (tile_cap,))
        )(starts[:-1])
    tile_lists = jnp.where(in_seg, vals, n)
    raw_counts = starts[1:] - starts[:-1]
    counts = jnp.minimum(raw_counts, tile_cap).astype(jnp.int32)
    # tile-cap telemetry: fraction of candidate entries silently dropped by
    # the fixed capacity (the CUDA reference's lists are unbounded — a
    # saturated budget must be visible in the train log, not silent)
    total_entries = jnp.maximum(jnp.sum(raw_counts), 1)
    drop_frac = (
        jnp.sum(jnp.maximum(raw_counts - tile_cap, 0)) / total_entries
    ).astype(jnp.float32)
    return tile_lists, counts, drop_frac, clamp_frac, raw_counts


def rasterize_tiled(
    means2d: jnp.ndarray,    # [N, 2]
    M: jnp.ndarray,          # [N, 3, 3] uv->screen transforms
    depths: jnp.ndarray,     # [N] center depth (sort key)
    normals: jnp.ndarray,    # [N, 3] camera-space
    colors: jnp.ndarray,     # [N, 3]
    opacities: jnp.ndarray,  # [N]
    valid: jnp.ndarray,      # [N] bool
    radii: jnp.ndarray,      # [N] screen radius (pixels)
    width: int,
    height: int,
    *,
    tile_size: int = 16,
    tile_cap: int = 512,
    tile_expand: int = 64,
    tile_expand_small: int = 0,
    tile_batch: int = 16,
    pix_delta: Optional[jnp.ndarray] = None,
    entry_pix_delta: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    impl: str = "auto",
    need_vis: bool = True,
) -> Dict[str, jnp.ndarray]:
    """Full tiled render. Returns [H, W, .] images + per-splat visibilities.

    All shapes static; the only data-dependent work is the entry sort.
    ``impl``: "auto" uses the fused Pallas composite kernel on TPU (when
    tile_size == 16 and tile_cap % 128 == 0), the XLA scan otherwise;
    "xla" / "pallas" force a path.
    ``need_vis=False`` skips the per-splat visibility/membership reduction
    (a [T*cap]-row sorted segment-max) — eval/novel-view renders don't
    consume it; ``visibilities`` comes back zero and ``binned`` all-True.

    ``entry_pix_delta`` [num_tiles, tile_cap, 2] (zeros): a PER-TILE-ENTRY
    pixel-space shift folded into the gathered entry coefficients with the
    same algebra splat_coeffs uses for ``pix_delta``. Its gradient is the
    per-(splat, tile) screen-space densify gradient BEFORE the entry->splat
    summation — the tap for the ``use_absgrad`` densify variant (gsplat's
    absgrad, enabled at neural_gaussian.cpp:215-217,629-630; per-tile
    granularity is the TPU analog of gsplat's per-pixel |grad|
    accumulation). When given, the output dict gains ``tile_lists``
    [num_tiles, tile_cap] (entry -> splat id, sentinel n) so callers can
    segment-reduce |grad| per splat.
    """
    n = means2d.shape[0]
    tiles_x = _cdiv(width, tile_size)
    tiles_y = _cdiv(height, tile_size)
    num_tiles = tiles_x * tiles_y

    pallas_ok = tile_size == 16 and tile_cap % 128 == 0
    if impl == "auto":
        use_pallas = pallas_ok and jax.default_backend() == "tpu"
    elif impl == "pallas":
        if not pallas_ok:
            raise ValueError(
                "pallas composite needs tile_size=16 and tile_cap % 128 == 0"
            )
        use_pallas = True
    else:
        use_pallas = False
    if pix_delta is None:
        pix_delta = jnp.zeros((n, 2), means2d.dtype)

    tile_lists, _, drop_frac, clamp_frac, raw_counts = tile_encode(
        means2d,
        radii,
        jax.lax.stop_gradient(depths),
        valid,
        width,
        height,
        tile_size,
        tile_cap,
        tile_expand,
        tile_expand_small,
    )

    # sentinel row N: zero opacity — contributes nothing
    pad = lambda x: jnp.concatenate([x, jnp.zeros((1,) + x.shape[1:], x.dtype)])
    M_p = jnp.concatenate(
        [M, jnp.eye(3, dtype=M.dtype)[None]], axis=0
    )  # identity avoids 0/0 in the uv solve
    coeffs = splat_coeffs(
        pad(means2d), M_p, pad(jnp.where(valid, opacities, 0.0)),
        pad(pix_delta),
    )                                                     # [N+1, 15]
    feats = pad(jnp.concatenate([colors, normals], axis=-1))  # [N+1, 6]
    table = jnp.concatenate([coeffs, feats], axis=-1)     # [N+1, 21]

    ts2 = tile_size * tile_size
    if use_pallas:
        import os

        if os.environ.get("GSSDF_RASTER_V2"):
            # Chip-validated 2026-08-19: raster_v2 FAILS forward parity on
            # real Mosaic (max |err| 2.84 vs the reference compositor at
            # kt=1; passes only in interpret mode). Kept for debugging but
            # never silently used for training — fail loudly instead.
            raise RuntimeError(
                "GSSDF_RASTER_V2 fails numerical parity on real TPU Mosaic "
                "(see ARCHITECTURE.md 'Composite kernel v2'); unset it. "
                "Import gssdf_tpu.ops.pallas.raster_v2 directly for kernel "
                "debugging."
            )
        from ..ops.pallas.raster import F_ROWS, tile_composite

        table24 = jnp.concatenate(
            [table, jnp.zeros((n + 1, F_ROWS - table.shape[-1]), table.dtype)],
            axis=-1,
        )
        # ONE gather into [T, C, 24] then lane-major [T, 24, C].
        # table_gather so the backward accumulation runs through the sorted
        # windowed Pallas segment-sum instead of XLA's serial scatter-add
        # (the rasterizer analog of tcnn's fused grid backward).
        entries_t = jnp.swapaxes(
            table_gather(table24, tile_lists.reshape(-1)).reshape(
                num_tiles, tile_cap, F_ROWS
            ),
            -1, -2,
        )
        if entry_pix_delta is not None:
            # entry-level pixel shift, same fold as splat_coeffs: its
            # cotangent = per-tile-entry densify gradient (absgrad tap).
            # Sentinel rows stay inert because opa == 0 zeroes alpha and
            # every gradient through it (their identity-M coeffs are NOT
            # zero; the fold does shift their planes, harmlessly).
            dxl = jnp.swapaxes(entry_pix_delta[..., 0:1], -1, -2)  # [T,1,C]
            dyl = jnp.swapaxes(entry_pix_delta[..., 1:2], -1, -2)
            entries_t = jnp.concatenate(
                [
                    entries_t[:, 0:3]
                    - dxl * entries_t[:, 3:6] - dyl * entries_t[:, 6:9],
                    entries_t[:, 3:9],
                    entries_t[:, 9:10]
                    - dxl * entries_t[:, 10:11] - dyl * entries_t[:, 11:12],
                    entries_t[:, 10:12],
                    entries_t[:, 12:13] + dxl,
                    entries_t[:, 13:14] + dyl,
                    entries_t[:, 14:],
                ],
                axis=1,
            )
        # kt tiles per composite grid step (GSSDF_RASTER_KT, default 1):
        # identical per-tile math/skip, amortized step overhead — opt-in
        # until chip-validated (the raster_v2 rule)
        kt = int(os.environ.get("GSSDF_RASTER_KT", "1"))
        out_t, wm = tile_composite(entries_t, tiles_x, tile_size, kt)
        outs = jnp.swapaxes(out_t[:, :10, :], -1, -2)      # [T, ts2, 10]
        # chunk-skip hit rate: wm row 1 is the kernel's per-chunk active
        # flag (1 = composited, 0 = skipped as all-sentinel/saturated).
        # Telemetry for how often the CUDA-style early stop actually fires.
        from ..ops.pallas.raster import CHUNK

        chunk_active = jnp.mean(
            wm[:, 1, :].reshape(num_tiles, -1, CHUNK)[:, :, 0]
        )
        # ONE segment-max of (w + 1) yields BOTH the per-splat visibility
        # (max w) and list membership: m = max(w)+1 for splats with >= 1
        # tile entry, 0 otherwise. Replaces a separate 825k-row bool
        # scatter for `binned` (capacity-dropped splats must not be judged
        # "invisible" by the pruner; no reference analog — CUDA lists are
        # unbounded).
        if need_vis:
            vis_m = segment_max(
                tile_lists.reshape(-1), wm[:, 0, :].reshape(-1) + 1.0, n + 1
            )
        else:
            vis_m = jnp.ones((n + 1,), jnp.float32)
    else:
        # pad tile count to a multiple of tile_batch with sentinel-only tiles
        nb = _cdiv(num_tiles, tile_batch)
        pad_tiles = nb * tile_batch - num_tiles
        tile_lists_unpadded = tile_lists
        if pad_tiles:
            tile_lists = jnp.concatenate(
                [tile_lists, jnp.full((pad_tiles, tile_cap), n, jnp.int32)]
            )

        # ONE gather into tile-entry order; the scan then reads contiguous
        # slices. (Per-step gathers were the bottleneck: XLA lowers scattered
        # row gathers poorly on TPU, one fused gather is ~linear in bytes.)
        entries = table_gather(table, tile_lists.reshape(-1)).reshape(
            nb, tile_batch, tile_cap, table.shape[-1]
        )
        if entry_pix_delta is not None:
            epd = entry_pix_delta
            if pad_tiles:
                epd = jnp.concatenate(
                    [epd, jnp.zeros((pad_tiles, tile_cap, 2), epd.dtype)]
                )
            epd = epd.reshape(nb, tile_batch, tile_cap, 2)
            dx, dy = epd[..., 0:1], epd[..., 1:2]
            entries = jnp.concatenate(
                [
                    entries[..., 0:3]
                    - dx * entries[..., 3:6] - dy * entries[..., 6:9],
                    entries[..., 3:9],
                    entries[..., 9:10]
                    - dx * entries[..., 10:11] - dy * entries[..., 11:12],
                    entries[..., 10:12],
                    entries[..., 12:13] + dx,
                    entries[..., 13:14] + dy,
                    entries[..., 14:],
                ],
                axis=-1,
            )

        lx = jnp.arange(tile_size, dtype=jnp.float32)
        pix_dx = jnp.tile(lx, tile_size) + 0.5           # [ts2] within-tile x
        pix_dy = jnp.repeat(lx, tile_size) + 0.5

        tids_all = jnp.arange(nb * tile_batch, dtype=jnp.int32)

        @functools.partial(jax.checkpoint, prevent_cse=False)
        def body(_, args):
            tids, ent = args                              # ent [B, C, 21]
            tx = (tids % tiles_x).astype(jnp.float32) * tile_size
            ty = (tids // tiles_x).astype(jnp.float32) * tile_size
            px = tx[:, None] + pix_dx[None, :]            # [B, ts2]
            py = ty[:, None] + pix_dy[None, :]

            alpha, depth = jax.vmap(pixel_weights_from_coeffs)(
                px, py, ent[..., :15]
            )
            res = jax.vmap(composite)(alpha, ent[..., 15:21], depth)

            wmax = jnp.max(res["w"], axis=1)              # [B, C]
            out = jnp.concatenate(
                [res["out"], res["alpha"], res["depth"], res["median"],
                 res["distort"]],
                axis=-1,
            )  # [B, ts2, 10]
            return 0, (out, wmax)

        _, (outs, wmaxes) = jax.lax.scan(
            body, 0, (tids_all.reshape(nb, tile_batch), entries)
        )
        # per-splat visibility + membership: one segment-max of (w + 1)
        if need_vis:
            vis_m = segment_max(
                tile_lists.reshape(-1), wmaxes.reshape(-1) + 1.0, n + 1
            )
        else:
            vis_m = jnp.ones((n + 1,), jnp.float32)
        outs = outs.reshape(nb * tile_batch, ts2, -1)[:num_tiles]
        chunk_active = jnp.float32(1.0)     # XLA scan path has no skip

    # Transmittance-weighted drop bound: entries beyond the cap would have
    # composited AFTER the kept front-to-back prefix, so per pixel their
    # total contribution is bounded by the tile's FINAL transmittance
    # T = 1 - acc. drop_vis weights each tile's dropped entries by that
    # bound — the CUDA early-stop equivalence argument made measurable
    # (reference lists are unbounded, neural_gaussian.cpp:207-223): a
    # saturated tile (T ~ 0) proves its drops contributed ~nothing.
    t_final = 1.0 - jnp.mean(outs[:num_tiles, :, 6], axis=1)      # [T]
    dropped = jnp.maximum(raw_counts - tile_cap, 0).astype(jnp.float32)
    drop_vis = (
        jnp.sum(dropped * jnp.maximum(t_final, 0.0))
        / jnp.maximum(jnp.sum(raw_counts), 1)
    ).astype(jnp.float32)

    # [T, ts2, ch] -> [H, W, ch]
    ch = outs.shape[-1]
    img = outs.reshape(tiles_y, tiles_x, tile_size, tile_size, ch)
    img = img.transpose(0, 2, 1, 3, 4).reshape(
        tiles_y * tile_size, tiles_x * tile_size, ch
    )[:height, :width]

    color = img[..., 0:3]
    normal = img[..., 3:6]
    acc = img[..., 6:7]
    if background is not None:
        color = color + (1.0 - acc) * background[None, None, :]

    binned = vis_m[:n] > 0.5
    vis = jnp.where(vis_m > 0.5, vis_m - 1.0, 0.0)
    extra = {}
    if entry_pix_delta is not None:
        tl = tile_lists if use_pallas else tile_lists_unpadded
        extra["tile_lists"] = jax.lax.stop_gradient(tl)
    return extra | {
        "color": color,
        "normal": normal,
        "alpha": acc,
        "depth": img[..., 7:8],
        "median": img[..., 8:9],
        "distort": img[..., 9:10],
        "visibilities": vis[:n],
        "binned": binned,
        "drop_frac": drop_frac,
        "drop_vis": drop_vis,
        "clamp_frac": clamp_frac,
        "chunk_active": chunk_active,
    }
