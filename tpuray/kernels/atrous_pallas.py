"""Fused Pallas TPU kernel for the SVGF edge-aware a-trous filter.

TPU-native replacement for the reference's a-trous fragment pass
(shaders/svgf_Atrous.frag) — the denoiser hot loop: N dilated 5x5
cross-bilateral wavelet iterations per frame (main.cpp:499-526). The
reference runs each iteration as a fullscreen draw plus a blit copy to
break the read/write hazard; the jnp fallback (tpuray.denoise.atrous)
builds 24 shifted full-image copies per iteration, which XLA materializes
in HBM. This kernel instead:

- processes the image in full-width row strips, one grid step per strip;
- DMAs each strip's inputs ONCE with a 2*step row halo from HBM into VMEM
  (strip shapes kept (8, 128)-tile aligned, the Mosaic DMA requirement);
- walks the 24 non-center taps with a `fori_loop` whose (dy, dx) offsets,
  B3-spline weights and distances come from small SMEM tables. One rolled
  tap body instead of a 24x-unrolled program keeps the Mosaic stack
  footprint and the compile time small (the unrolled variant needed >100 MB
  of scoped VMEM for temporaries at 1080p and took >10 min to compile);
  accumulators live in VMEM scratch, not loop carries (Mosaic mishandles
  large vector carries);
- computes the 3x3 variance pre-blur, the edge-stopping weights
  (depth/normal/luminance) and both filtered outputs (illumination +
  variance with squared weights) entirely on-chip;
- keeps the whole iteration chain in a planar (plane, H, W) padded layout
  so consecutive iterations read the previous kernel's output directly,
  with no host round trips and no layout shuffles in between. The column
  halo is part of the padded width, so x-taps are in-VMEM slices.

Per-pixel HBM traffic per iteration drops to ~9 plane reads + 4 plane
writes plus the row-halo overlap (the roofline minimum for this stencil);
everything else rides VMEM.

Numerics match tpuray.denoise.atrous.atrous_iteration exactly (same tap
set, same masks, same sky passthrough, same reference_quirks handling of
the variance pre-blur — svgf_Atrous.frag:36 reads the center texel for all
9 taps; the correct blur clamps to the image edge like GL texture clamp).
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuray.scene.config import RenderConfig

Array = jax.Array

# B3-spline 1D kernel weights [center, 1, 2] (svgf_Atrous.frag:66)
_K1D = (1.0, 2.0 / 3.0, 1.0 / 6.0)
# 3x3 variance pre-blur weights by |offset| (svgf_Atrous.frag:24-27)
_VARK = {(0, 0): 1 / 4, (1, 0): 1 / 8, (0, 1): 1 / 8, (1, 1): 1 / 16}

# planar layout indices
_DYN_R, _DYN_G, _DYN_B, _DYN_V = 0, 1, 2, 3            # dynamic: illum + var
_ST_Z, _ST_NX, _ST_NY, _ST_NZ, _ST_FWZ = 0, 1, 2, 3, 4  # static G-buffer

# Strip-height budget: input slabs + ~24 live (TH, WC) temporaries, kept
# well under the raised scoped-VMEM limit (v5e has 128 MiB VMEM/core).
_VMEM_BUDGET = 48 * 1024 * 1024
_VMEM_LIMIT = 100 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _tap_tables(step: int):
    """Tap offset/weight tables, grouped by row offset: dy (5,), dx (5,),
    kernel weight (25,) and distance (25,) indexed [dy_group * 5 + dx_idx].
    The center tap's kernel weight is 0 (it is pre-seeded with weight 1)."""
    offs = (-2, -1, 0, 1, 2)
    kw, dist = [], []
    for yy in offs:
        for xx in offs:
            w = 0.0 if (xx == 0 and yy == 0) else _K1D[abs(xx)] * _K1D[abs(yy)]
            kw.append(w)
            dist.append(float((xx * xx + yy * yy) ** 0.5))
    dy = np.asarray([o * step for o in offs], np.int32)
    return (dy, dy.copy(),
            np.asarray(kw, np.float32), np.asarray(dist, np.float32))


def _pow_weight(x, sigma: float):
    """clip(x,0,1)**sigma; repeated squaring when sigma is a power of two
    (the reference default sigma_n=128 -> 7 multiplies, no exp/log)."""
    x = jnp.clip(x, 0.0, 1.0)
    s = float(sigma)
    if s > 0 and s == int(s) and (int(s) & (int(s) - 1)) == 0:
        for _ in range(int(s).bit_length() - 1):
            x = x * x
        return x
    return jnp.power(x, np.float32(s))


def _kernel(dy_tab, dx_tab, kw_tab, dist_tab,
            stat_hbm, dyn_hbm, out_hbm,
            stat_scr, dyn_scr, row_scr, out_scr, w_scr, sems, *,
            H: int, W: int, TH: int, WC: int, C: int, OFF_R: int, h8: int,
            step: int, sigma_n: float, sigma_l: float, quirks: bool):
    i = pl.program_id(0)
    th = TH + 2 * h8
    row0 = OFF_R - h8 + i * TH

    cp_stat = pltpu.make_async_copy(
        stat_hbm.at[:, pl.ds(row0, th), :], stat_scr, sems.at[0])
    cp_dyn = pltpu.make_async_copy(
        dyn_hbm.at[:, pl.ds(row0, th), :], dyn_scr, sems.at[1])
    cp_stat.start()
    cp_dyn.start()
    cp_stat.wait()
    cp_dyn.wait()

    def dyn(p, dy=0, dx=0):
        return dyn_scr[p, h8 + dy:h8 + dy + TH, C + dx:C + dx + WC]

    def stat(p, dy=0, dx=0):
        return stat_scr[p, h8 + dy:h8 + dy + TH, C + dx:C + dx + WC]

    # global pixel coords of this strip's output block
    gy = i * TH + jax.lax.broadcasted_iota(jnp.int32, (TH, WC), 0)
    gx = jax.lax.broadcasted_iota(jnp.int32, (TH, WC), 1)

    r_c, g_c, b_c, var_c = dyn(0), dyn(1), dyn(2), dyn(3)
    z_c = stat(_ST_Z)
    nx_c, ny_c, nz_c = stat(_ST_NX), stat(_ST_NY), stat(_ST_NZ)
    l_c = 0.2125 * r_c + 0.7154 * g_c + 0.0721 * b_c

    # --- 3x3 variance pre-blur (clamp-to-edge via separable select) ---
    if quirks:
        var_blur = var_c  # identity: center texel read 9x (svgf_Atrous.frag:36)
    else:
        var_blur = jnp.zeros((TH, WC), jnp.float32)
        for dy in (-1, 0, 1):
            oy = (gy + dy < 0) | (gy + dy >= H)
            for dx in (-1, 0, 1):
                ox = (gx + dx < 0) | (gx + dx >= W)
                v = jnp.where(
                    oy & ox, var_c,
                    jnp.where(oy, dyn(_DYN_V, 0, dx),
                              jnp.where(ox, dyn(_DYN_V, dy, 0),
                                        dyn(_DYN_V, dy, dx))))
                var_blur = var_blur + _VARK[(abs(dx), abs(dy))] * v

    phi_l = sigma_l * jnp.sqrt(jnp.maximum(1e-10, 1e-10 + var_blur))
    phi_depth = jnp.maximum(stat(_ST_FWZ), 1e-8) * float(step)

    # --- 24-tap dilated cross-bilateral accumulation (rolled loop) ---
    w_scr[...] = jnp.ones((TH, WC), jnp.float32)   # center weight 1
    out_scr[_DYN_R] = r_c
    out_scr[_DYN_G] = g_c
    out_scr[_DYN_B] = b_c
    out_scr[_DYN_V] = var_c                         # center, squared weight 1

    # Taps use dynamic rotates (Mosaic cannot prove alignment for
    # dynamic-offset vector loads), grouped by row offset: each dy group
    # row-rolls the 8 planes ONCE into row_scr, then the 5 dx taps only
    # need cheap lane rolls of the (TH, wpt) rows.
    wpt = dyn_scr.shape[2]

    def dy_group(gi, _):
        dy = dy_tab[gi]
        shift_y = jax.lax.rem(th - (h8 + dy), th)
        for p in range(4):
            row_scr[p] = pltpu.roll(dyn_scr[p], shift_y, axis=0)[0:TH]
        for p in range(4):
            row_scr[4 + p] = pltpu.roll(stat_scr[p], shift_y, axis=0)[0:TH]
        in_y = (gy + dy >= 0) & (gy + dy < H)

        def dx_tap(k, _):
            dx = dx_tab[k]
            shift_x = jax.lax.rem(wpt - (C + dx), wpt)

            def sh(p):
                return pltpu.roll(row_scr[p], shift_x, axis=1)[:, 0:WC]

            r_p, g_p, b_p, var_p = sh(_DYN_R), sh(_DYN_G), sh(_DYN_B), sh(_DYN_V)
            z_p = sh(4 + _ST_Z)
            ndot = nx_c * sh(4 + _ST_NX) + ny_c * sh(4 + _ST_NY) \
                + nz_c * sh(4 + _ST_NZ)
            l_p = 0.2125 * r_p + 0.7154 * g_p + 0.0721 * b_p

            inside = in_y & (gx + dx >= 0) & (gx + dx < W)

            # edge-stopping weight (svgf_Atrous.frag:43-55)
            w_normal = _pow_weight(ndot, sigma_n)
            phi_d = phi_depth * dist_tab[gi * 5 + k]
            w_z = jnp.where(phi_d == 0.0, 0.0,
                            jnp.abs(z_c - z_p)
                            / jnp.where(phi_d == 0.0, 1.0, phi_d))
            w_l = jnp.abs(l_c - l_p) / phi_l
            w = (jnp.exp(-jnp.maximum(w_l, 0.0) - jnp.maximum(w_z, 0.0))
                 * w_normal)
            w = jnp.where(inside, w * kw_tab[gi * 5 + k], 0.0)

            # mask values too: halo reads past the image may be garbage (the
            # rim of the padded buffer is never written) and 0*NaN = NaN
            w_scr[...] += w
            out_scr[_DYN_R] += w * jnp.where(inside, r_p, 0.0)
            out_scr[_DYN_G] += w * jnp.where(inside, g_p, 0.0)
            out_scr[_DYN_B] += w * jnp.where(inside, b_p, 0.0)
            out_scr[_DYN_V] += w * w * jnp.where(inside, var_p, 0.0)
            return 0

        jax.lax.fori_loop(0, 5, dx_tap, 0)
        return 0

    jax.lax.fori_loop(0, 5, dy_group, 0)

    inv_w = 1.0 / w_scr[...]
    sky = z_c == 1.0  # envmap passthrough (svgf_Atrous.frag:77-82)
    out_scr[_DYN_R] = jnp.where(sky, r_c, out_scr[_DYN_R] * inv_w)
    out_scr[_DYN_G] = jnp.where(sky, g_c, out_scr[_DYN_G] * inv_w)
    out_scr[_DYN_B] = jnp.where(sky, b_c, out_scr[_DYN_B] * inv_w)
    out_scr[_DYN_V] = jnp.where(sky, var_c,
                                out_scr[_DYN_V] * inv_w * inv_w)

    cp_out = pltpu.make_async_copy(
        out_scr,
        out_hbm.at[:, pl.ds(OFF_R + i * TH, TH), pl.ds(C, WC)],
        sems.at[2])
    cp_out.start()
    cp_out.wait()


def _atrous_step(stat: Array, dyn: Array, *, H: int, W: int, TH: int, WC: int,
                 C: int, OFF_R: int, step: int, sigma_n: float,
                 sigma_l: float, quirks: bool, interpret: bool) -> Array:
    """One a-trous iteration on padded planar state. Returns new dyn stack."""
    h8 = _ceil_to(2 * step, 8)  # row halo, sublane-aligned for the DMA
    th = TH + 2 * h8
    hp, wpt = stat.shape[1], stat.shape[2]
    grid = ((hp - 2 * OFF_R) // TH,)
    tabs = _tap_tables(step)

    kern = functools.partial(
        _kernel, H=H, W=W, TH=TH, WC=WC, C=C, OFF_R=OFF_R, h8=h8,
        step=step, sigma_n=float(sigma_n), sigma_l=float(sigma_l),
        quirks=bool(quirks))
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,  # tap tables -> SMEM
        grid=grid,
        in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                  pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((5, th, wpt), jnp.float32),
            pltpu.VMEM((4, th, wpt), jnp.float32),
            pltpu.VMEM((8, TH, wpt), jnp.float32),  # row-rolled planes
            pltpu.VMEM((4, TH, WC), jnp.float32),
            pltpu.VMEM((TH, WC), jnp.float32),
            pltpu.SemaphoreType.DMA((3,)),
        ],
    )
    return pl.pallas_call(
        kern,
        grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((4, hp, wpt), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(*tabs, stat, dyn)


def _pick_strip_height(wpt: int, wc: int, max_step: int) -> int:
    """Largest strip height whose scratch + live temporaries fit the budget."""
    h8_max = _ceil_to(2 * max_step, 8)
    for th in (256, 128, 64, 32, 16, 8):
        need = (9 * (th + 2 * h8_max) * wpt + 8 * th * wpt + 29 * th * wc) * 4
        if need <= _VMEM_BUDGET:
            return th
    raise ValueError(f"image too wide for the a-trous kernel (wpt={wpt})")


def atrous_chain(illum: Array, variance: Array, normal: Array,
                 linear_z: Array, fwidth_z: Array, cfg: RenderConfig,
                 interpret: bool = False
                 ) -> tuple[tuple[Array, Array], tuple[Array, Array]]:
    """Run all cfg.num_atrous_iterations wavelet iterations (step 1<<i) as a
    chain of fused Pallas kernels.

    Returns ((final_illum, final_var), (tap_illum, tap_var)) where the tap is
    the output of iteration cfg.history_atrous_tap — next frame's
    illumination history (main.cpp:521-525).
    """
    H, W = int(illum.shape[0]), int(illum.shape[1])
    n_iters = cfg.num_atrous_iterations
    steps = [1 << i for i in range(n_iters)]
    max_step = steps[-1] if steps else 1

    C = _ceil_to(2 * max_step, 128)       # column halo, lane-aligned
    OFF_R = _ceil_to(2 * max_step, 8)     # row offset, sublane-aligned
    wc = _ceil_to(W, 128)
    wpt = 2 * C + wc
    TH = _pick_strip_height(wpt, wc, max_step)
    if TH > H:
        TH = _ceil_to(H, 8)
    hc = _ceil_to(H, TH)

    def pad(planes):  # (P, H, W) -> (P, HP, WPT), content at (OFF_R, C)
        return jnp.pad(planes, ((0, 0),
                                (OFF_R, OFF_R + hc - H),
                                (C, C + wc - W)))

    stat = pad(jnp.stack([linear_z, normal[..., 0], normal[..., 1],
                          normal[..., 2], fwidth_z]).astype(jnp.float32))
    dyn = pad(jnp.stack([illum[..., 0], illum[..., 1], illum[..., 2],
                         variance]).astype(jnp.float32))

    tap = dyn
    for i, step in enumerate(steps):
        dyn = _atrous_step(stat, dyn, H=H, W=W, TH=TH, WC=wc, C=C,
                           OFF_R=OFF_R, step=step, sigma_n=cfg.sigma_n,
                           sigma_l=cfg.sigma_l, quirks=cfg.reference_quirks,
                           interpret=interpret)
        if i == cfg.history_atrous_tap:
            tap = dyn

    def unpack(d):
        c = d[:, OFF_R:OFF_R + H, C:C + W]
        return jnp.stack([c[0], c[1], c[2]], axis=-1), c[3]

    return unpack(dyn), unpack(tap)
