"""Tile-windowed history fetch: gather-free temporal reprojection reads.

TPU per-pixel gathers are row-latency bound: one full-frame fetch of the
quad-packed history atlas costs ~43 ms at 800x800 on v5e (scripts/
exp_tilegather.py), and SVGF reprojection needs five -> ~185 ms/frame. This
module replaces them with a decomposition that runs in ~2 ms:

  1. split the image into (ty, tx) tiles; for each tile, DMA one history
     *window* with `vmap(lax.dynamic_slice)` — a coarse, contiguous fetch
     the TPU is good at;
  2. inside each window, reconstruct the per-pixel base texel with a short
     chain of static-slice + select ops keyed on the *diagonal residual*
     r = (tap_row - pixel_row): for locally smooth motion r is nearly
     constant, so (span+1)^2 candidates cover a whole tile;
  3. neighbor taps (the bilinear quad and the 3x3 rescue ring) come from
     the same aligned block by static shifts, with an *exactness mask*: the
     shifted value equals the true tap iff the neighbor pixel's base coords
     are the pixel's own base + offset — an integer identity that holds
     everywhere except across >=1px/px motion-field discontinuities (and
     the integer-crossing contours of a smooth field, ~0.5% of pixels),
     where the caller treats the tap as invalid. Dropped bilinear taps
     renormalize; failed rescue taps fall back to the spatial estimate —
     exactly the algorithm's existing response to invalid history.

(A variant that quad-packs the window channels makes the bilinear taps
exact at the contours too, but 4x the select traffic costs more than the
0.5% tap loss is worth: 26 ms vs ~8 ms per moving reprojection at 1080^2.)

Exactness contract: for every offset e=(dy,dx), wherever `resolved[e]` is
True the returned tap equals atlas[clip(y0)+dy, clip(x0)+dx] with those
coordinates in-image; wherever False the caller must treat the tap as
failed. Pixels whose residual leaves the window span are unresolved for
every offset.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp

Array = jax.Array

# tolerated per-tile variation of the integer motion (pixels)
DEFAULT_SPAN = 4
DEFAULT_TY = 40
DEFAULT_TX = 160

QUAD = ((0, 0), (1, 0), (0, 1), (1, 1))


def _pad_to(x: Array, h: int, w: int) -> Array:
    ph, pw = h - x.shape[0], w - x.shape[1]
    if ph == 0 and pw == 0:
        return x
    return jnp.pad(x, ((0, ph), (0, pw)) + ((0, 0),) * (x.ndim - 2),
                   mode="edge")


def tiled_taps(atlas: Array, y0: Array, x0: Array,
               offsets: tuple[tuple[int, int], ...],
               span: int = DEFAULT_SPAN, ty: int = DEFAULT_TY,
               tx: int = DEFAULT_TX):
    """Fetch atlas[clip(y0)+dy, clip(x0)+dx] for every (dy, dx) in offsets.

    atlas: (H, W, C); y0, x0: (H, W) int32 base-tap coordinates (unclipped).
    Offsets must lie in {-1, 0, 1}^2 or be one of the bilinear quad
    {(0,0),(1,0),(0,1),(1,1)}. Returns (taps, resolved): dicts keyed by
    offset with (H, W, C) values and (H, W) bool exactness masks.
    """
    h, w, c = atlas.shape
    assert all(-1 <= dy <= 1 and -1 <= dx <= 1 for dy, dx in offsets)
    wy, wx = ty + span + 2, tx + span + 2
    nty, ntx = -(-h // ty), -(-w // tx)
    hp, wp = nty * ty, ntx * tx
    n = nty * ntx
    # guard pad: the diagonal window base By = min(yc - i) can sit up to a
    # full tile extent past the image edge (clamped coords near borders,
    # large shifts toward an edge). Padding by the window size lets the
    # fixed-size window land anywhere the base math can put it; resolved
    # pixels never select pad texels (their yc/xc are in-image by
    # construction).
    pad_y, pad_x = wy, wx
    atlas_g = jnp.pad(atlas, ((pad_y, pad_y), (pad_x, pad_x), (0, 0)))

    yc = jnp.clip(y0, 0, h - 1)
    xc = jnp.clip(x0, 0, w - 1)

    # diagonal residuals on the padded pixel grid
    yy, xx = jnp.meshgrid(jnp.arange(h), jnp.arange(w), indexing="ij")
    rg = _pad_to(yc - yy, hp, wp)          # (hp, wp)
    cg = _pad_to(xc - xx, hp, wp)

    # pixels whose every tap is out of image (base coord beyond [-1, dim])
    # are dead: the caller's in-bounds validity rejects them regardless of
    # the value. Exclude them from the window-base min — their clamped
    # residuals would otherwise poison whole tiles near image borders.
    big = jnp.asarray(2**30, rg.dtype)
    relevant = _pad_to((y0 >= -1) & (y0 <= h) & (x0 >= -1) & (x0 <= w),
                       hp, wp)
    rg_min = jnp.where(relevant, rg, big)
    cg_min = jnp.where(relevant, cg, big)

    # per-tile window base: min diagonal residual over the tile + 1px halo,
    # shifted to atlas coordinates. reduce_window(min) with window ty+2 and
    # stride ty scans exactly the halo-extended tile.
    def halo_min(f, t_y, t_x):
        return jax.lax.reduce_window(
            f, big, jax.lax.min, (t_y + 2, t_x + 2), (t_y, t_x),
            [(1, 1), (1, 1)])

    gy = (jnp.arange(nty, dtype=jnp.int32) * ty)[:, None]    # tile origin rows
    gx = (jnp.arange(ntx, dtype=jnp.int32) * tx)[None, :]
    by = jnp.clip(halo_min(rg_min, ty, tx) + gy - 1, -pad_y, h + pad_y - wy)
    bx = jnp.clip(halo_min(cg_min, ty, tx) + gx - 1, -pad_x, w + pad_x - wx)

    # window extraction from the guarded atlas: one dynamic_slice per tile
    starts = jnp.stack([by.reshape(-1) + pad_y, bx.reshape(-1) + pad_x],
                       axis=-1)

    def slice_atlas(s):
        return jax.lax.dynamic_slice(atlas_g, (s[0], s[1], 0), (wy, wx, c))

    win = jax.vmap(slice_atlas)(starts)                      # (n, wy, wx, c)

    # halo-extended tiles of the residual candidates: cand = rg - (By-gy+1)
    # (independent of the in-tile position; solves window[cand+m] == atlas[yc])
    rg_pad = jnp.pad(rg, 1, mode="edge")
    cg_pad = jnp.pad(cg, 1, mode="edge")

    def slice_field(f, s):
        return jax.lax.dynamic_slice(f, (s[0], s[1]), (ty + 2, tx + 2))

    tile_starts = jnp.stack(
        [jnp.repeat(jnp.arange(nty, dtype=jnp.int32) * ty, ntx),
         jnp.tile(jnp.arange(ntx, dtype=jnp.int32) * tx, nty)], axis=-1)
    rg_ext = jax.vmap(lambda s: slice_field(rg_pad, s))(tile_starts)
    cg_ext = jax.vmap(lambda s: slice_field(cg_pad, s))(tile_starts)
    candy = rg_ext - (by.reshape(-1) - tile_starts[:, 0] + 1)[:, None, None]
    candx = cg_ext - (bx.reshape(-1) - tile_starts[:, 1] + 1)[:, None, None]

    sel_ok = ((candy >= 0) & (candy <= span)
              & (candx >= 0) & (candx <= span))              # (n, ty+2, tx+2)

    # aligned block: per-pixel joint residual select
    al = jnp.zeros((n, ty + 2, tx + 2, c), atlas.dtype)
    for ry in range(span + 1):
        sly = jax.lax.slice_in_dim(win, ry, ry + ty + 2, axis=1)
        for rx in range(span + 1):
            sl = jax.lax.slice_in_dim(sly, rx, rx + tx + 2, axis=2)
            al = jnp.where(((candy == ry) & (candx == rx))[..., None], sl, al)

    def to_image(t):
        # (n, ty, tx, ...) -> (hp, wp, ...) -> crop (h, w, ...)
        t = t.reshape((nty, ntx, ty, tx) + t.shape[3:])
        t = jnp.moveaxis(t, 2, 1)
        return t.reshape((hp, wp) + t.shape[4:])[:h, :w]

    # effective fetch coords of an extended-block texel at padded position
    # (i', j') are (rg_pad + i', cg_pad + j') — the diagonal identity the
    # value selection used. (Edge-padding yc/xc directly would disagree with
    # the fetch for halo texels outside the image.)
    rg_img = jnp.pad(yc - yy, 1, mode="edge")    # (h+2, w+2), unpadded grid
    cg_img = jnp.pad(xc - xx, 1, mode="edge")

    sel_img = to_image(sel_ok[:, 1:-1, 1:-1])

    taps, resolved = {}, {}
    for dy, dx in offsets:
        # tap value and its selection mask come from the SAME extended-block
        # position (m+dy, l+dx) of the pixel's own tile
        sl = al[:, 1 + dy:1 + dy + ty, 1 + dx:1 + dx + tx]
        taps[(dy, dx)] = to_image(sl)
        if dy == 0 and dx == 0:
            resolved[(0, 0)] = sel_img
            continue
        sel = to_image(sel_ok[:, 1 + dy:1 + dy + ty, 1 + dx:1 + dx + tx])
        ysh = rg_img[1 + dy:1 + dy + h, 1 + dx:1 + dx + w] + (yy + dy)
        xsh = cg_img[1 + dy:1 + dy + h, 1 + dx:1 + dx + w] + (xx + dx)
        # the fetched coords must equal the *unclipped* yc+dy (so taps
        # straddling the image edge are unresolved, not silently
        # clamped) and be in-image (guard-pad texels are garbage)
        ok = ((ysh == yc + dy) & (xsh == xc + dx)
              & (ysh >= 0) & (ysh < h) & (xsh >= 0) & (xsh < w))
        resolved[(dy, dx)] = ok & sel
    return taps, resolved
