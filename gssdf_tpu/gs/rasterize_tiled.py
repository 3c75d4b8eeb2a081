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
from typing import Dict, Optional

import jax
import jax.numpy as jnp

from .rasterize_jax import composite, pixel_weights_from_coeffs, splat_coeffs


def _cdiv(a: int, b: int) -> int:
    return -(-a // b)


def tile_bbox(
    means2d: jnp.ndarray,   # [N, 2]
    radii: jnp.ndarray,     # [N]
    valid: jnp.ndarray,     # [N] bool
    tiles_x: int,
    tiles_y: int,
    tile_size: int,
    expand: int,
):
    """Clamped tile-space bbox per splat.

    Returns (tx0, ty0, span_x, span_y) int32 arrays. The bbox is clamped so
    ``span_x * span_y <= expand`` while always containing the splat's center
    tile (huge splats degrade to an ``expand``-tile window around their
    center instead of overflowing the static entry budget).
    """
    mx, my = means2d[:, 0], means2d[:, 1]
    r = radii
    tx0 = jnp.clip(jnp.floor((mx - r) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    tx1 = jnp.clip(jnp.floor((mx + r) / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    ty0 = jnp.clip(jnp.floor((my - r) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    ty1 = jnp.clip(jnp.floor((my + r) / tile_size), 0, tiles_y - 1).astype(jnp.int32)
    span_x = tx1 - tx0 + 1
    span_y = ty1 - ty0 + 1

    # center tile (always kept inside the clamped window)
    ctx = jnp.clip(jnp.floor(mx / tile_size), 0, tiles_x - 1).astype(jnp.int32)
    cty = jnp.clip(jnp.floor(my / tile_size), 0, tiles_y - 1).astype(jnp.int32)

    # static power-of-2 window width: entry decode becomes shift/mask
    # instead of a 4M-element integer div/mod by a per-splat divisor
    win_w = 1 << max((expand.bit_length() - 1) // 2, 0)  # ~sqrt(expand)
    win_h = expand // win_w
    sx = jnp.minimum(span_x, win_w)
    sy = jnp.minimum(span_y, win_h)
    # shift the clamped window to contain the center tile, staying in-bbox
    tx0c = jnp.clip(ctx - sx // 2, tx0, tx1 - sx + 1)
    ty0c = jnp.clip(cty - sy // 2, ty0, ty1 - sy + 1)

    z = jnp.zeros_like(span_x)
    span_x = jnp.where(valid, sx, z)
    span_y = jnp.where(valid, sy, z)
    return tx0c, ty0c, span_x, span_y


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
):
    """Depth-sorted fixed-capacity tile lists.

    Returns (tile_lists [T, C] int32 indices into the ORIGINAL splat arrays
    with sentinel = N, counts [T] int32). Within a tile, indices are
    front-to-back.
    """
    n = means2d.shape[0]
    assert tile_expand & (tile_expand - 1) == 0, "tile_expand must be 2^k"
    tiles_x = _cdiv(width, tile_size)
    tiles_y = _cdiv(height, tile_size)
    num_tiles = tiles_x * tiles_y

    order = jnp.argsort(jnp.where(valid, depths, jnp.inf))  # stable
    tx0, ty0, span_x, span_y = tile_bbox(
        means2d[order],
        radii[order],
        valid[order],
        tiles_x,
        tiles_y,
        tile_size,
        tile_expand,
    )

    # decode entry slot -> (ex, ey) with a STATIC window width (shift/mask)
    win_w = 1 << max((tile_expand.bit_length() - 1) // 2, 0)
    e = jnp.arange(tile_expand, dtype=jnp.int32)            # [E]
    ex = (e & (win_w - 1))[None, :]                          # [1, E]
    ey = (e >> (win_w.bit_length() - 1))[None, :]
    entry_ok = (ex < span_x[:, None]) & (ey < span_y[:, None])
    tid = (ty0[:, None] + ey) * tiles_x + (tx0[:, None] + ex)
    tid = jnp.where(entry_ok, tid, num_tiles)                # sentinel tile

    # Pack (tile, depth-rank) into ONE int32 key: ranks are the row index
    # (splats already depth-sorted), so key order == (tile, front-to-back).
    # Keys are unique -> the sort can be UNSTABLE (measurably faster than
    # the stable 2-operand sort on TPU: 6.2 vs 9.6 ms at 4.2M entries).
    rank_bits = max(n - 1, 1).bit_length()
    assert (num_tiles + 1) << rank_bits < 2**31, (
        "packed tile/rank key overflows int32; shrink tile count or splats"
    )
    ranks = jax.lax.broadcasted_iota(jnp.int32, tid.shape, 0)
    payload = jnp.broadcast_to(order[:, None], tid.shape).astype(jnp.int32)
    flat_key = ((tid << rank_bits) | ranks).reshape(-1)
    flat_pay = payload.reshape(-1)
    e_total = flat_key.shape[0]
    sorted_key, sorted_pay = jax.lax.sort(
        (flat_key, flat_pay), num_keys=1, is_stable=False
    )

    # entries are now grouped by tile: tile t's run is
    # [starts[t], starts[t+1]). The tile table is a SEGMENT GATHER of
    # T*cap elements — no per-entry rank computation or 4M-element
    # scatter (those dominated this function's cost on TPU).
    starts = jnp.searchsorted(
        sorted_key, jnp.arange(num_tiles + 1) << rank_bits, side="left"
    )
    r_idx = jnp.arange(tile_cap, dtype=jnp.int32)
    src = starts[:-1, None] + r_idx[None, :]              # [T, cap]
    in_seg = src < starts[1:, None]
    pay_pad = jnp.concatenate(
        [sorted_pay, jnp.full((1,), n, jnp.int32)]
    )
    vals = pay_pad[jnp.minimum(src, e_total)]
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
    # splats that made it into >=1 tile list — capacity-dropped splats must
    # not be judged "invisible" by the pruner (no reference analog: the CUDA
    # rasterizer has unbounded tile lists)
    binned = jnp.zeros((n + 1,), bool).at[
        tile_lists.reshape(-1)
    ].set(True, mode="drop")[:n]
    return tile_lists, counts, binned, drop_frac


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
    tile_batch: int = 16,
    pix_delta: Optional[jnp.ndarray] = None,
    background: Optional[jnp.ndarray] = None,
    impl: str = "auto",
) -> Dict[str, jnp.ndarray]:
    """Full tiled render. Returns [H, W, .] images + per-splat visibilities.

    All shapes static; the only data-dependent work is the entry sort.
    ``impl``: "auto" uses the fused Pallas composite kernel on TPU (when
    tile_size == 16 and tile_cap % 128 == 0), the XLA scan otherwise;
    "xla" / "pallas" force a path.
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

    tile_lists, _, binned, drop_frac = tile_encode(
        means2d,
        radii,
        jax.lax.stop_gradient(depths),
        valid,
        width,
        height,
        tile_size,
        tile_cap,
        tile_expand,
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
        from ..ops.pallas.raster import F_ROWS, tile_composite

        table24 = jnp.concatenate(
            [table, jnp.zeros((n + 1, F_ROWS - table.shape[-1]), table.dtype)],
            axis=-1,
        )
        # ONE gather into [T, C, 24] then lane-major [T, 24, C]
        entries_t = jnp.swapaxes(
            table24[tile_lists.reshape(-1)].reshape(
                num_tiles, tile_cap, F_ROWS
            ),
            -1, -2,
        )
        out_t, wm = tile_composite(entries_t, tiles_x, tile_size)
        outs = jnp.swapaxes(out_t[:, :10, :], -1, -2)      # [T, ts2, 10]
        vis = (
            jnp.zeros((n + 1,), dtype=means2d.dtype)
            .at[tile_lists.reshape(-1)]
            .max(wm[:, 0, :].reshape(-1), mode="drop")
        )
    else:
        # pad tile count to a multiple of tile_batch with sentinel-only tiles
        nb = _cdiv(num_tiles, tile_batch)
        pad_tiles = nb * tile_batch - num_tiles
        if pad_tiles:
            tile_lists = jnp.concatenate(
                [tile_lists, jnp.full((pad_tiles, tile_cap), n, jnp.int32)]
            )

        # ONE gather into tile-entry order; the scan then reads contiguous
        # slices. (Per-step gathers were the bottleneck: XLA lowers scattered
        # row gathers poorly on TPU, one fused gather is ~linear in bytes.)
        entries = table[tile_lists.reshape(-1)].reshape(
            nb, tile_batch, tile_cap, table.shape[-1]
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
        # per-splat visibility: one segment-max over all tile entries
        vis = (
            jnp.zeros((n + 1,), dtype=means2d.dtype)
            .at[tile_lists.reshape(-1)]
            .max(wmaxes.reshape(-1), mode="drop")
        )
        outs = outs.reshape(nb * tile_batch, ts2, -1)[:num_tiles]

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

    return {
        "color": color,
        "normal": normal,
        "alpha": acc,
        "depth": img[..., 7:8],
        "median": img[..., 8:9],
        "distort": img[..., 9:10],
        "visibilities": vis[:n],
        "binned": binned,
        "drop_frac": drop_frac,
    }
