"""Microbench: tile-windowed history fetch primitives vs full-frame gather.

Tests the building blocks of the planned tiled reprojection:
  1. per-tile window extraction via vmap(lax.dynamic_slice)
  2. per-pixel joint residual select chain (aligned tap reconstruction)
against the row-latency-bound per-pixel gather they replace.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_tilegather.py
"""
import json
import time

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def _sync(out):
    # the axon backend's block_until_ready can return before execution
    # finishes; a host transfer is the reliable fence (cf. bench.py)
    import numpy as np
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timed(fn, *args, iters=20, trials=3):
    out = fn(*args)
    _sync(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn(*args)
        _sync(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


H = W = 800
C = 12
TY, TX = 40, 160
SPAN = 4                      # tolerated residual range per tile
WY, WX = TY + SPAN + 4, TX + SPAN + 4
NTY, NTX = H // TY, W // TX
N = NTY * NTX


def main():
    key = jax.random.PRNGKey(0)
    atlas = jax.random.uniform(key, (H, W, C), jnp.float32)
    yy, xx = jnp.meshgrid(jnp.arange(H), jnp.arange(W), indexing="ij")
    y0 = (yy.astype(jnp.float32) - 3.0 + 2.0 * jnp.sin(xx / 211.0)).astype(jnp.int32)
    x0 = (xx.astype(jnp.float32) + 4.0 * jnp.cos(yy / 173.0)).astype(jnp.int32)

    # 0. per-pixel gather baseline (one full-frame gather, 12 channels)
    f_gather = jax.jit(lambda a, y, x: a[jnp.clip(y, 0, H - 1),
                                         jnp.clip(x, 0, W - 1)])
    print(json.dumps({"stage": "gather_640k_rows_12ch",
                      "ms": round(timed(f_gather, atlas, y0, x0), 2)}), flush=True)

    # 48-channel (quad-packed equivalent) gather for scale
    atlas48 = jnp.tile(atlas, (1, 1, 4))
    f_g48 = jax.jit(lambda a, y, x: a[jnp.clip(y, 0, H - 1),
                                      jnp.clip(x, 0, W - 1)])
    print(json.dumps({"stage": "gather_640k_rows_48ch",
                      "ms": round(timed(f_g48, atlas48, y0, x0), 2)}), flush=True)

    # 1. window extraction
    def windows(a, by, bx):
        def slice_one(b):
            return jax.lax.dynamic_slice(a, (b[0], b[1], 0), (WY, WX, C))
        return jax.vmap(slice_one)(jnp.stack([by, bx], -1))

    by = jnp.clip(jnp.arange(N, dtype=jnp.int32) // NTX * TY - 2, 0, H - WY)
    bx = jnp.clip(jnp.arange(N, dtype=jnp.int32) % NTX * TX - 2, 0, W - WX)
    f_win = jax.jit(windows)
    print(json.dumps({"stage": f"windows_{N}x{WY}x{WX}x{C}",
                      "ms": round(timed(f_win, atlas, by, bx), 2)}), flush=True)

    win = f_win(atlas, by, bx)

    # 2. per-pixel joint residual select: aligned tap block with 1px halo
    TYH, TXH = TY + 2, TX + 2
    r = jax.random.randint(jax.random.PRNGKey(1), (N, TYH, TXH), 0, SPAN + 1)
    c = jax.random.randint(jax.random.PRNGKey(2), (N, TYH, TXH), 0, SPAN + 1)

    def aligned(win, r, c):
        out = jnp.zeros((N, TYH, TXH, C), jnp.float32)
        for ry in range(SPAN + 1):
            sly = jax.lax.slice_in_dim(win, ry, ry + TYH, axis=1)
            for rx in range(SPAN + 1):
                sl = jax.lax.slice_in_dim(sly, rx, rx + TXH, axis=2)
                out = jnp.where(((r == ry) & (c == rx))[..., None], sl, out)
        return out

    f_al = jax.jit(aligned)
    print(json.dumps({"stage": f"joint_selects_{(SPAN + 1) ** 2}",
                      "ms": round(timed(f_al, win, r, c), 2)}), flush=True)

    # 3. end-to-end: windows + aligned + 9 static taps summed (data deps only)
    def fetch_all(a, by, bx, r, c):
        w9 = windows(a, by, bx)
        al = aligned(w9, r, c)
        acc = jnp.zeros((N, TY, TX, C), jnp.float32)
        for dy in (0, 1, 2):
            for dx in (0, 1, 2):
                acc = acc + al[:, dy:dy + TY, dx:dx + TX]
        return acc

    f_e2e = jax.jit(fetch_all)
    print(json.dumps({"stage": "windows+aligned+9taps",
                      "ms": round(timed(f_e2e, atlas, by, bx, r, c), 2)}),
          flush=True)


if __name__ == "__main__":
    main()
