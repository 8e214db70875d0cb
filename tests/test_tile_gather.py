"""tile_gather.tiled_taps: exactness contract vs a numpy gather oracle.

Contract: wherever resolved[(dy,dx)] is True the tap equals
atlas[clip(y0)+dy, clip(x0)+dx] exactly; unresolved taps are allowed
anywhere but must be rare for smooth motion fields.
"""
import numpy as np
import pytest

from tpuray.denoise.tile_gather import QUAD, tiled_taps

OFFS = tuple(set((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))
             | set(QUAD))


def oracle(atlas, y0, x0, dy, dx):
    h, w = atlas.shape[:2]
    yt = np.clip(np.clip(y0, 0, h - 1) + dy, 0, h - 1)
    xt = np.clip(np.clip(x0, 0, w - 1) + dx, 0, w - 1)
    return atlas[yt, xt]


def check(atlas, y0, x0, span=6, ty=40, tx=160, min_resolved=0.0,
          min_resolved_ring=None):
    taps, resolved = tiled_taps(atlas, y0, x0, OFFS, span=span, ty=ty, tx=tx)
    h, w = y0.shape
    for (dy, dx) in OFFS:
        want = oracle(np.asarray(atlas), np.asarray(y0), np.asarray(x0), dy, dx)
        got = np.asarray(taps[(dy, dx)])
        ok = np.asarray(resolved[(dy, dx)])
        assert got.shape == want.shape
        if ok.any():
            np.testing.assert_array_equal(got[ok], want[ok],
                                          err_msg=f"offset {(dy, dx)}")
        target = min_resolved if (dy, dx) in QUAD else (
            min_resolved_ring if min_resolved_ring is not None else min_resolved)
        if target:
            # coverage among *live* pixels: base and tap both in-image (the
            # caller's in-bounds validity kills oob taps regardless, and
            # oob-base pixels are border-only conservative fallbacks)
            live = ((y0 >= 0) & (y0 < h) & (x0 >= 0) & (x0 < w)
                    & (y0 + dy >= 0) & (y0 + dy < h)
                    & (x0 + dx >= 0) & (x0 + dx < w))
            frac = (ok | ~live).mean()
            assert frac >= target, (f"offset {(dy, dx)}: resolved "
                                    f"{frac:.3f} < {target}")


def _grids(h, w):
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    return yy.astype(np.float32), xx.astype(np.float32)


def test_smooth_motion_fully_resolved():
    h = w = 200
    rng = np.random.default_rng(0)
    atlas = rng.random((h, w, 5), np.float32)
    yy, xx = _grids(h, w)
    # smooth sub-pixel-gradient motion, several px magnitude
    y0 = np.floor(yy - 3.2 + 1.5 * np.sin(xx / 37.0)).astype(np.int32)
    x0 = np.floor(xx + 4.7 + 2.0 * np.cos(yy / 53.0)).astype(np.int32)
    # neighbor taps lose only the integer-crossing contour pixels of the
    # motion field (diagonal-shift approximation) — corner offsets compound
    # both dims' contours on this deliberately high-curvature field (~5%);
    # real camera motion crosses far less often. The (0,0) tap is always
    # exact in-span.
    check(atlas, y0, x0, ty=40, tx=100, min_resolved=0.94,
          min_resolved_ring=0.94)


def test_static_identity():
    h, w = 120, 240
    rng = np.random.default_rng(1)
    atlas = rng.random((h, w, 3), np.float32)
    yy, xx = _grids(h, w)
    taps, resolved = tiled_taps(atlas, yy.astype(np.int32), xx.astype(np.int32),
                                ((0, 0),), ty=40, tx=120)
    assert np.asarray(resolved[(0, 0)]).all()
    np.testing.assert_array_equal(np.asarray(taps[(0, 0)]), atlas)


def test_discontinuous_motion_conservative():
    h = w = 160
    rng = np.random.default_rng(2)
    atlas = rng.random((h, w, 4), np.float32)
    yy, xx = _grids(h, w)
    # hard disocclusion edge: left half still, right half shifted far
    jump = (xx > w // 2).astype(np.float32)
    y0 = (yy - 20.0 * jump).astype(np.int32)
    x0 = (xx + 11.0 * jump).astype(np.int32)
    # span exceeded inside the jump tiles: never lies (value check inside),
    # and pixels far from the discontinuity still resolve
    check(atlas, y0, x0, ty=40, tx=80)


def test_wild_motion_never_lies():
    h = w = 160
    rng = np.random.default_rng(3)
    atlas = rng.random((h, w, 2), np.float32)
    y0 = rng.integers(-50, h + 50, (h, w), dtype=np.int32)
    x0 = rng.integers(-50, w + 50, (h, w), dtype=np.int32)
    check(atlas, y0, x0, ty=40, tx=80)


def test_non_divisible_shape():
    h, w = 173, 241
    rng = np.random.default_rng(4)
    atlas = rng.random((h, w, 3), np.float32)
    yy, xx = _grids(h, w)
    y0 = np.floor(yy - 1.3 + 0.8 * np.sin(xx / 29.0)).astype(np.int32)
    x0 = np.floor(xx + 2.1).astype(np.int32)
    check(atlas, y0, x0, ty=40, tx=80, min_resolved=0.97,
          min_resolved_ring=0.97)


def test_uniform_large_shift_resolved():
    # large but uniform motion: per-tile base absorbs any magnitude
    h = w = 160
    rng = np.random.default_rng(5)
    atlas = rng.random((h, w, 3), np.float32)
    yy, xx = _grids(h, w)
    y0 = (yy - 57).astype(np.int32)
    x0 = (xx + 43).astype(np.int32)
    check(atlas, y0, x0, ty=40, tx=80, min_resolved=0.999)
