"""Probe: dynamic-offset HBM->VMEM window DMA + dynamic-shift rolls.

Verifies the lowering pattern the fused reproject kernel needs:
  - async_copy from an ANY-space (P, H, W) ref with traced, 8/128-aligned
    (row, lane) start offsets from scalar prefetch;
  - pltpu.roll with a traced shift on both axes of a VMEM plane.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_probe_dma.py
"""
import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu


def _kernel(row0s, col0s, mys, mxs, src_hbm, out_hbm, win, out_scr, sems):
    i = pl.program_id(0)
    cp = pltpu.make_async_copy(
        src_hbm.at[:, pl.ds(pl.multiple_of(row0s[i], 8), 16),
                   pl.ds(pl.multiple_of(col0s[i], 128), 256)],
        win, sems.at[0])
    cp.start()
    cp.wait()
    my = mys[i]
    mx = mxs[i]
    for p in range(2):
        u = pltpu.roll(win[p], 16 - my, axis=0)
        u = pltpu.roll(u, 256 - mx, axis=1)
        out_scr[p] = u[0:8, 0:128]
    cp2 = pltpu.make_async_copy(out_scr, out_hbm.at[i], sems.at[1])
    cp2.start()
    cp2.wait()


def main():
    P, H, W = 2, 64, 512
    src = jnp.arange(P * H * W, dtype=jnp.float32).reshape(P, H, W)
    # arbitrary window bases, decomposed into aligned base + residual
    bases = np.array([[3, 17], [25, 300], [40, 129], [0, 0]], np.int32)
    r8 = (bases[:, 0] // 8) * 8
    c128 = (bases[:, 1] // 128) * 128
    my = bases[:, 0] - r8
    mx = bases[:, 1] - c128

    n = len(bases)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=4,
        grid=(n,),
        in_specs=[pl.BlockSpec(memory_space=pl.ANY)],
        out_specs=pl.BlockSpec(memory_space=pl.ANY),
        scratch_shapes=[
            pltpu.VMEM((P, 16, 256), jnp.float32),
            pltpu.VMEM((P, 8, 128), jnp.float32),
            pltpu.SemaphoreType.DMA((2,)),
        ],
    )
    f = pl.pallas_call(
        _kernel, grid_spec=grid_spec,
        out_shape=jax.ShapeDtypeStruct((n, P, 8, 128), jnp.float32))
    out = np.asarray(f(jnp.asarray(r8), jnp.asarray(c128),
                       jnp.asarray(my), jnp.asarray(mx), src))
    ref = np.stack([np.asarray(src)[:, b[0]:b[0] + 8, b[1]:b[1] + 128]
                    for b in bases])
    ok = np.array_equal(out, ref)
    print("probe ok:", ok)
    if not ok:
        print("first mismatch", np.argwhere(out != ref)[:4])


if __name__ == "__main__":
    main()
