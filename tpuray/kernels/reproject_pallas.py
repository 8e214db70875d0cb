"""Fused Pallas TPU kernel: SVGF temporal reprojection + spatial variance.

TPU-native replacement for the reference's reprojection and variance
fragment passes (shaders/svgf_reproject.frag, shaders/svgf_variance.frag),
fused into ONE kernel so the history taps, validity tests, EMA and the
7x7 spatial-moments fallback never round-trip HBM between stages.

Why a kernel: the XLA tiled path (tpuray.denoise.reproject._reproject_tiled
over denoise.tile_gather) materializes the 25-candidate residual select and
all 9 neighbor taps as full-frame HBM arrays — ~11 ms at 800x800 and ~26 ms
at 1080p on v5e, ~10x the stencil's roofline. This kernel keeps the same
algorithm (identical tap/validity semantics; see tile_gather's exactness
contract) but runs it per 32x128 tile entirely in VMEM:

  1. the per-tile history *window* base (min diagonal residual over the
     halo-extended tile) is computed on the XLA side with one
     reduce_window(min) — cheap — and decomposed into an (8,128)-aligned
     DMA base plus an in-VMEM misalignment roll;
  2. each grid step DMAs one window of the planar history atlas and one
     halo-extended block of the current-frame planes;
  3. the (span+1)^2 residual select, the 9 ring taps with their exactness
     masks, the bilinear/rescue validity (svgf_reproject.frag:31-43,
     84-141), the EMA + history-length tail (:143-205), AND the 7x7
     cross-bilateral variance fallback (svgf_variance.frag:44-115, rolled
     fori_loop like the a-trous kernel) all run on the VMEM-resident block.

The reproject math is computed on a +-3-extended block so the variance
fallback's 7x7 taps read the *reprojected* neighbors without a second pass.

Semantics match reproject(cfg.reproject_gather="tiled") composed with
estimate_variance, up to the window-base choice: this kernel's base is
minimized over a +-4 halo (the extended block) instead of +-1, so pixels
whose integer motion varies by more than SPAN across the wider extent
resolve conservatively to invalid taps — the same graceful degradation the
tiled path applies at motion discontinuities.
"""
from __future__ import annotations

import functools
from typing import NamedTuple

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuray.kernels.atrous_pallas import _pow_weight
from tpuray.scene.config import RenderConfig

Array = jax.Array

# tile geometry (content tile TY x TX; EB = +-4 extended working block)
TY, TX = 32, 128
HALO = 4                 # = 1 (ring taps) + 3 (variance radius)
SPAN = 4                 # tolerated residual variation, as in tile_gather
EBH, EBW = TY + 2 * HALO, 256     # working block: rows exact, lanes padded
WY, WX = 56, 384         # atlas window (rows: 44 used + 8 roll slack, /8;
                         #  lanes: 140 used + 128 roll slack, /128)
PY, PX = 56, 384         # atlas guard pads (>= window extents)
CURH, CURW = 48, 384     # current-plane DMA block (+-8 rows, +-128 lanes)
_BIG = 2 ** 30

# current-frame plane indices (21 planes)
_IL0, _COL0, _N0 = 0, 3, 6
_LZ, _FWN, _FWZ = 9, 10, 11
_FRX, _FRY, _NRX, _NRY = 12, 13, 14, 15
_PM0, _PHL, _RGU, _CGU = 16, 18, 19, 20
_NCUR = 21

# history-atlas plane indices (11 planes)
_AIL0, _AVAR, _AN0, _ALZ, _AM0, _AHL = 0, 3, 4, 7, 8, 10
_NATL = 11

# output plane indices (11 planes)
_ORI0, _ORV, _OVI0, _OVV, _OM0, _OHL = 0, 3, 4, 7, 8, 10
_NOUT = 11

_QUAD = ((0, 0), (0, 1), (1, 0), (1, 1))       # (dy, dx)
_RING = tuple((dy, dx) for dy in (-1, 0, 1) for dx in (-1, 0, 1))

_VMEM_LIMIT = 100 * 1024 * 1024


class FusedOutput(NamedTuple):
    rep_illum: Array     # (H, W, 3) reprojected illumination (pre-fallback)
    rep_variance: Array  # (H, W)
    var_illum: Array     # (H, W, 3) after the spatial variance fallback
    var_variance: Array  # (H, W)
    moments: Array       # (H, W, 2)
    history_len: Array   # (H, W)


def _kernel(dma_r, dma_c, m_ys, m_xs, oys, oxs,
            cur_hbm, atlas_hbm, out_hbm,
            cur_scr, win_scr, out_scr, sems, *,
            H: int, W: int, ntx: int, depth_thr: float, normal_thr: float,
            history_cap: float, alpha_min: float, sigma_n: float,
            sigma_l: float):
    i = pl.program_id(0)
    j = pl.program_id(1)
    t = i * ntx + j

    cp_cur = pltpu.make_async_copy(
        cur_hbm.at[:, pl.ds(pl.multiple_of(i * TY, 8), CURH),
                   pl.ds(pl.multiple_of(j * TX, 128), CURW)],
        cur_scr, sems.at[0])
    cp_win = pltpu.make_async_copy(
        atlas_hbm.at[:, pl.ds(pl.multiple_of(dma_r[t], 8), WY),
                     pl.ds(pl.multiple_of(dma_c[t], 128), WX)],
        win_scr, sems.at[1])
    cp_cur.start()
    cp_win.start()
    cp_cur.wait()
    cp_win.wait()

    # undo the DMA-base misalignment: win_scr[p][r, c] becomes
    # atlas[by + r, bx + c] on the valid region
    s_y = WY - m_ys[t]
    s_x = WX - m_xs[t]
    for p in range(_NATL):
        u = pltpu.roll(win_scr[p], s_y, axis=0)
        win_scr[p] = pltpu.roll(u, s_x, axis=1)

    # extended working block (EBH, EBW); pixel (e, f) <-> global
    # (i*TY - HALO + e, j*TX - HALO + f); valid f < TX + 2*HALO
    def ceb(p):
        return cur_scr[p, 8 - HALO:8 - HALO + EBH,
                       TX - HALO:TX - HALO + EBW]

    rows = (i * TY - HALO
            + jax.lax.broadcasted_iota(jnp.int32, (EBH, EBW), 0))
    cols = (j * TX - HALO
            + jax.lax.broadcasted_iota(jnp.int32, (EBH, EBW), 1))

    y0 = ceb(_RGU).astype(jnp.int32) + rows     # unclipped base tap
    x0 = ceb(_CGU).astype(jnp.int32) + cols
    yc = jnp.clip(y0, 0, H - 1)
    xc = jnp.clip(x0, 0, W - 1)
    candy = (yc - rows) - oys[t]
    candx = (xc - cols) - oxs[t]
    sel = ((candy >= 0) & (candy <= SPAN) & (candx >= 0) & (candx <= SPAN))

    # (SPAN+1)^2 residual select -> aligned block al[p][e, f] =
    # atlas[yc(e,f), xc(e,f)] wherever sel. One stacked 3D where per
    # candidate keeps the op count (and Mosaic overhead) 11x lower than
    # per-plane selects.
    al3 = jnp.zeros((_NATL, EBH, EBW), jnp.float32)
    for ry in range(SPAN + 1):
        cy = candy == ry
        for rx in range(SPAN + 1):
            jm = (cy & (candx == rx))[None]
            al3 = jnp.where(jm, win_scr[:, ry:ry + EBH, rx:rx + EBW], al3)

    # current-frame center fields on the EB
    il_c = [ceb(_IL0 + c) for c in range(3)]
    lz_c = ceb(_LZ)
    n_c = [ceb(_N0 + c) for c in range(3)]
    fwn_c = ceb(_FWN)
    fwz_c = ceb(_FWZ)
    frx, fry = ceb(_FRX), ceb(_FRY)
    sky = lz_c == 1.0

    rgc_f = (yc - rows).astype(jnp.float32)
    cgc_f = (xc - cols).astype(jnp.float32)

    # stack the per-offset shifted fields so each ring tap is TWO 3D rolls
    ring3 = jnp.concatenate(
        [al3, sel.astype(jnp.float32)[None], rgc_f[None], cgc_f[None]], 0)
    _SEL, _RGC, _CGC = _NATL, _NATL + 1, _NATL + 2

    # one pass over the 9 ring taps: bilinear + rescue accumulation
    wts = {(0, 0): (1 - frx) * (1 - fry), (0, 1): frx * (1 - fry),
           (1, 0): (1 - frx) * fry, (1, 1): frx * fry}
    zero = jnp.zeros((EBH, EBW), jnp.float32)
    sum_w = zero
    acc_il = [zero] * 4          # illum rgb + variance
    acc_mom = [zero] * 2
    any_valid = jnp.zeros((EBH, EBW), bool)
    n_valid = zero
    r_il = [zero] * 4
    r_mom = [zero] * 2
    hl_quad = {}
    for dy, dx in _RING:
        sh3 = pltpu.roll(pltpu.roll(ring3, (-dy) % EBH, axis=1),
                         (-dx) % EBW, axis=2)
        alr = [sh3[p] for p in range(_NATL)]
        sel_sh = sh3[_SEL] > 0.5
        ysh = sh3[_RGC].astype(jnp.int32) + (rows + dy)
        xsh = sh3[_CGC].astype(jnp.int32) + (cols + dx)
        resolved = (sel_sh & (ysh == yc + dy) & (xsh == xc + dx)
                    & (ysh >= 0) & (ysh < H) & (xsh >= 0) & (xsh < W))
        # isReprjValid (svgf_reproject.frag:31-43)
        in_b = ((x0 + dx >= 0) & (x0 + dx < W)
                & (y0 + dy >= 0) & (y0 + dy < H))
        depth_ok = (jnp.abs(alr[_ALZ] - lz_c)
                    / (fwz_c + 1e-2)) <= depth_thr
        nd = [n_c[c] - alr[_AN0 + c] for c in range(3)]
        ndist = jnp.sqrt(nd[0] * nd[0] + nd[1] * nd[1] + nd[2] * nd[2])
        normal_ok = (ndist / (fwn_c + 1e-2)) <= normal_thr
        v = resolved & in_b & depth_ok & normal_ok
        vf = v.astype(jnp.float32)

        tap_iv = [alr[_AIL0], alr[_AIL0 + 1], alr[_AIL0 + 2], alr[_AVAR]]
        n_valid = n_valid + vf
        r_il = [r + vf * x for r, x in zip(r_il, tap_iv)]
        r_mom = [r + vf * alr[_AM0 + c] for c, r in enumerate(r_mom)]

        if (dy, dx) in _QUAD:
            wv = jnp.where(v, wts[(dy, dx)], 0.0)
            any_valid = any_valid | v
            sum_w = sum_w + wv
            acc_il = [a + wv * x for a, x in zip(acc_il, tap_iv)]
            acc_mom = [a + wv * alr[_AM0 + c] for c, a in enumerate(acc_mom)]
            hl_quad[(dy, dx)] = alr[_AHL]

    bilinear_ok = any_valid & (sum_w >= 0.01)
    safe_w = jnp.maximum(sum_w, 1e-6)
    prev_i = [jnp.where(bilinear_ok, a / safe_w, 0.0) for a in acc_il]
    prev_m = [jnp.where(bilinear_ok, a / safe_w, 0.0) for a in acc_mom]
    rescue_ok = (~bilinear_ok) & (n_valid > 0)
    safe_n = jnp.maximum(n_valid, 1.0)
    prev_i = [jnp.where(rescue_ok, r / safe_n, p)
              for r, p in zip(r_il, prev_i)]
    prev_m = [jnp.where(rescue_ok, r / safe_n, p)
              for r, p in zip(r_mom, prev_m)]

    # EMA + history tail (svgf_reproject.frag:143-205)
    success = bilinear_ok | rescue_ok
    near_x = ceb(_NRX) > 0.5
    near_y = ceb(_NRY) > 0.5
    hist_prev = jnp.where(
        near_y, jnp.where(near_x, hl_quad[(1, 1)], hl_quad[(1, 0)]),
        jnp.where(near_x, hl_quad[(0, 1)], hl_quad[(0, 0)]))
    hist = jnp.minimum(history_cap,
                       jnp.where(success, hist_prev + 1.0, 1.0))
    alpha = jnp.where(success, jnp.maximum(alpha_min, 1.0 / hist), 1.0)

    lum_new = 0.2125 * il_c[0] + 0.7154 * il_c[1] + 0.0721 * il_c[2]
    mom = [(1.0 - alpha) * prev_m[0] + alpha * lum_new,
           (1.0 - alpha) * prev_m[1] + alpha * lum_new * lum_new]
    rep_var = jnp.maximum(0.0, mom[1] - mom[0] * mom[0])
    rep_il = [(1.0 - alpha) * prev_i[c] + alpha * il_c[c] for c in range(3)]

    # sky passthrough (frag:166-171)
    col_c = [ceb(_COL0 + c) for c in range(3)]
    rep_il = [jnp.where(sky, col_c[c], rep_il[c]) for c in range(3)]
    rep_var = jnp.where(sky, 0.0, rep_var)
    mom = [jnp.where(sky, ceb(_PM0 + c), mom[c]) for c in range(2)]
    hist = jnp.where(sky, ceb(_PHL), hist)

    # --- 7x7 spatial variance fallback (svgf_variance.frag) on the
    # reprojected EB fields. Unrolled with stacked 3D static-shift rolls:
    # two rolls per tap for all 9 planes (compile stays fast because the
    # blocks are tile-sized, unlike the full-strip a-trous temporaries) ---
    lum_rep = 0.2125 * rep_il[0] + 0.7154 * rep_il[1] + 0.0721 * rep_il[2]
    phi_d = jnp.maximum(fwz_c, 1e-8) * 3.0
    var3 = jnp.stack([rep_il[0], rep_il[1], rep_il[2], mom[0], mom[1],
                      lz_c, n_c[0], n_c[1], n_c[2]])
    vsum_w = zero
    vsum_il = [zero] * 3
    vsum_mo = [zero] * 2
    for dyv in range(-3, 4):
        vy3 = pltpu.roll(var3, (-dyv) % EBH, axis=1)
        in_y = (rows + dyv >= 0) & (rows + dyv < H)
        for dxv in range(-3, 4):
            vp = pltpu.roll(vy3, (-dxv) % EBW, axis=2)
            il_p = [vp[c] for c in range(3)]
            mo_p = [vp[3], vp[4]]
            lz_p = vp[5]
            ndot = n_c[0] * vp[6] + n_c[1] * vp[7] + n_c[2] * vp[8]
            l_p = 0.2125 * il_p[0] + 0.7154 * il_p[1] + 0.0721 * il_p[2]
            inside = in_y & (cols + dxv >= 0) & (cols + dxv < W)

            # computeWeight (svgf_variance.frag:23-35)
            w_n = _pow_weight(ndot, sigma_n)
            phi = phi_d * float((dyv * dyv + dxv * dxv) ** 0.5)
            if dyv == 0 and dxv == 0:
                w_z = zero                      # phi == 0 -> w_z = 0
            else:
                w_z = jnp.abs(lz_c - lz_p) / phi
            w_l = jnp.abs(lum_rep - l_p) / max(float(sigma_l), 1e-10)
            w = jnp.exp(-jnp.maximum(w_l, 0.0) - jnp.maximum(w_z, 0.0)) * w_n
            w = jnp.where(inside, w, 0.0)
            vsum_w = vsum_w + w
            vsum_il = [a + w * jnp.where(inside, x, 0.0)
                       for a, x in zip(vsum_il, il_p)]
            vsum_mo = [a + w * jnp.where(inside, x, 0.0)
                       for a, x in zip(vsum_mo, mo_p)]

    inv_w = 1.0 / jnp.maximum(vsum_w, 1e-6)
    est_il = [vsum_il[c] * inv_w for c in range(3)]
    est_m0 = vsum_mo[0] * inv_w
    est_m1 = vsum_mo[1] * inv_w
    est_var = (est_m1 - est_m0 * est_m0) * (4.0 / jnp.maximum(hist, 1e-3))
    needs = (hist < 4.0) & ~sky
    var_il = [jnp.where(needs, est_il[c], rep_il[c]) for c in range(3)]
    var_var = jnp.where(needs, est_var, rep_var)

    # write the center tile
    def ctr(x):
        return x[HALO:HALO + TY, HALO:HALO + TX]

    for c in range(3):
        out_scr[_ORI0 + c] = ctr(rep_il[c])
        out_scr[_OVI0 + c] = ctr(var_il[c])
    out_scr[_ORV] = ctr(rep_var)
    out_scr[_OVV] = ctr(var_var)
    out_scr[_OM0] = ctr(mom[0])
    out_scr[_OM0 + 1] = ctr(mom[1])
    out_scr[_OHL] = ctr(hist)

    cp_out = pltpu.make_async_copy(
        out_scr, out_hbm.at[:, pl.ds(pl.multiple_of(i * TY, 8), TY),
                            pl.ds(pl.multiple_of(j * TX, 128), TX)],
        sems.at[2])
    cp_out.start()
    cp_out.wait()


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def reproject_variance_fused(color: Array, emission: Array, albedo: Array,
                             motion: Array, normal: Array, linear_z: Array,
                             fwidth_normal: Array, fwidth_z: Array,
                             prev_illum: Array, prev_variance: Array,
                             prev_normal: Array, prev_linear_z: Array,
                             prev_moments: Array, prev_history_len: Array,
                             cfg: RenderConfig,
                             interpret: bool = False) -> FusedOutput:
    """Moving-camera reproject + spatial-variance fallback, one Pallas pass.

    Drop-in for reproject(gather='tiled') followed by estimate_variance
    (tpuray.denoise.svgf wires it in on TPU)."""
    H, W = int(color.shape[0]), int(color.shape[1])
    hp, wp = _ceil_to(H, TY), _ceil_to(W, TX)
    nty, ntx = hp // TY, wp // TX

    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")

    illum = (color - emission) / jnp.maximum(albedo, 1e-3)
    illum = jnp.where(jnp.isnan(illum), 0.0, illum)

    uv_x = (xx.astype(jnp.float32) + 0.5) / W - motion[..., 0]
    uv_y = (yy.astype(jnp.float32) + 0.5) / H - motion[..., 1]
    fx = uv_x * W - 0.5
    fy = uv_y * H - 0.5
    x0 = jnp.floor(fx)
    y0 = jnp.floor(fy)
    if cfg.reference_quirks:
        frac_x = (uv_x % (1.0 / W))     # svgf_reproject.frag:84-85
        frac_y = (uv_y % (1.0 / H))
    else:
        frac_x = fx - x0
        frac_y = fy - y0
    x0i = x0.astype(jnp.int32)
    y0i = y0.astype(jnp.int32)
    near_x = (jnp.clip(jnp.round(fx).astype(jnp.int32), 0, W - 1)
              > jnp.clip(x0i, 0, W - 1)).astype(jnp.float32)
    near_y = (jnp.clip(jnp.round(fy).astype(jnp.int32), 0, H - 1)
              > jnp.clip(y0i, 0, H - 1)).astype(jnp.float32)

    rg_u = (y0i - yy).astype(jnp.float32)
    cg_u = (x0i - xx).astype(jnp.float32)

    # per-tile window bases: min clipped residual over the +-HALO-extended
    # tile (cf. tile_gather.tiled_taps), excluding pixels whose every tap is
    # off-image
    yc = jnp.clip(y0i, 0, H - 1)
    xc = jnp.clip(x0i, 0, W - 1)
    rgc = yc - yy
    cgc = xc - xx
    relevant = ((y0i >= -1) & (y0i <= H) & (x0i >= -1) & (x0i <= W))
    rg_min = jnp.where(relevant, rgc, _BIG)
    cg_min = jnp.where(relevant, cgc, _BIG)
    rg_min = jnp.pad(rg_min, ((0, hp - H), (0, wp - W)),
                     constant_values=_BIG)
    cg_min = jnp.pad(cg_min, ((0, hp - H), (0, wp - W)),
                     constant_values=_BIG)

    def halo_min(f):
        return jax.lax.reduce_window(
            f, _BIG, jax.lax.min, (TY + 2 * HALO, TX + 2 * HALO), (TY, TX),
            [(HALO, HALO), (HALO, HALO)])

    gy = (jnp.arange(nty, dtype=jnp.int32) * TY)[:, None]
    gx = (jnp.arange(ntx, dtype=jnp.int32) * TX)[None, :]
    by = jnp.clip(halo_min(rg_min) + gy - HALO, -PY, hp)
    bx = jnp.clip(halo_min(cg_min) + gx - HALO, -PX, wp)
    by8 = jnp.floor_divide(by, 8) * 8
    bx128 = jnp.floor_divide(bx, 128) * 128
    dma_r = (by8 + PY).reshape(-1)
    dma_c = (bx128 + PX).reshape(-1)
    m_y = (by - by8).reshape(-1)
    m_x = (bx - bx128).reshape(-1)
    oy = (by - (gy - HALO)).reshape(-1)
    ox = (bx - (gx - HALO)).reshape(-1)

    # current-plane stack, edge-padded to tiles + DMA halos
    cur = jnp.stack([
        illum[..., 0], illum[..., 1], illum[..., 2],
        color[..., 0], color[..., 1], color[..., 2],
        normal[..., 0], normal[..., 1], normal[..., 2],
        linear_z, fwidth_normal, fwidth_z,
        frac_x, frac_y, near_x, near_y,
        prev_moments[..., 0], prev_moments[..., 1], prev_history_len,
        rg_u, cg_u,
    ]).astype(jnp.float32)
    cur_p = jnp.pad(cur, ((0, 0), (0, hp - H), (0, wp - W)), mode="edge")
    cur_p = jnp.pad(cur_p, ((0, 0), (8, 8), (TX, TX)), mode="edge")

    atlas = jnp.stack([
        prev_illum[..., 0], prev_illum[..., 1], prev_illum[..., 2],
        prev_variance,
        prev_normal[..., 0], prev_normal[..., 1], prev_normal[..., 2],
        prev_linear_z,
        prev_moments[..., 0], prev_moments[..., 1], prev_history_len,
    ]).astype(jnp.float32)
    atlas_p = jnp.pad(atlas, ((0, 0), (0, hp - H), (0, wp - W)), mode="edge")
    atlas_p = jnp.pad(atlas_p, ((0, 0), (PY, PY), (PX, PX)))

    kern = functools.partial(
        _kernel, H=H, W=W, ntx=ntx,
        depth_thr=float(cfg.reproj_depth_threshold),
        normal_thr=float(cfg.reproj_normal_threshold),
        history_cap=float(cfg.history_cap), alpha_min=float(cfg.alpha_min),
        sigma_n=float(cfg.sigma_n), sigma_l=float(cfg.sigma_l))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=6,
        grid=(nty, ntx),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((_NCUR, CURH, CURW), jnp.float32),
            pltpu.VMEM((_NATL, WY, WX), jnp.float32),
            pltpu.VMEM((_NOUT, TY, TX), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    out = pl.pallas_call(
        kern, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((_NOUT, hp, wp), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(dma_r, dma_c, m_y, m_x, oy, ox, cur_p, atlas_p)

    o = out[:, :H, :W]
    stack3 = lambda b: jnp.stack([o[b], o[b + 1], o[b + 2]], axis=-1)
    return FusedOutput(
        rep_illum=stack3(_ORI0), rep_variance=o[_ORV],
        var_illum=stack3(_OVI0), var_variance=o[_OVV],
        moments=jnp.stack([o[_OM0], o[_OM0 + 1]], axis=-1),
        history_len=o[_OHL])
