"""MXU one-hot gather: the TPU-native replacement for XLA row gathers.

XLA's native gather on TPU is row-latency bound at ~30-160 ns/row (measured
on v5e: a (11k, 32)-f32 table gathered at 640k indices costs ~100 ms, and
even a 16-row table costs ~20 ms — see scripts/bench_gather.py). The
integrator needs several full-frame table lookups per bounce
(path_tracing.frag's texelFetch idiom), which made gathers ~70% of frame
time.

STATUS: EXPERIMENTAL, not wired into the renderer. Measured on v5e (axon),
this formulation does NOT yet beat XLA's gather (~150-180 ms vs ~100-150 ms
at 640k x (11k, 44)): per-grid-step costs dominate regardless of chunk
skipping, and a transposed (C, R) one-hot variant was slower still. The
production fixes that DID land instead: select-chains for small tables
(gather_tables.fetch_small_table) and narrower/merged gather rows. Kept as
a correct, tested starting point for revisiting table gathers.

This kernel reformulates gather as matmul: one-hot(idx) @ table, which the
MXU would execute at full rate. Key points:

- the table is held in VMEM as an exact bf16 hi/lo pair
  (x == hi + lo with hi = bf16(x), lo = bf16(x - hi), ~2^-17 relative
  error — exact enough for normals/uvs/material params; two bf16 matmuls
  beat one f32 matmul by 4x);
- the table is walked in 512-row chunks, and each ray block only visits
  chunks covering [min(idx), max(idx)] of the block — ray packets are
  screen tiles, so coherent hits touch 1-2 chunks instead of T/512;
- indices are processed in blocks of R rays; the one-hot block is built
  with a broadcasted iota compare (VPU) and immediately consumed (MXU).

Cost model per N indices: ~N*(chunks_visited*512)*W*4 bf16 flops + the
compares; for the flagship scene this is ~5-15 ms per full-frame gather
versus ~100 ms for XLA's gather.
"""
from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

Array = jax.Array

_CHUNK = 512          # table rows per one-hot matmul
_BLOCK = 8192         # indices per grid step
_VMEM_LIMIT = 100 * 1024 * 1024


def _ceil_to(x: int, m: int) -> int:
    return (x + m - 1) // m * m


def _kernel(idx_ref, hi_ref, lo_ref, out_ref, acc, *, T: int, W: int):
    idx = idx_ref[...]  # (R, 1) int32
    acc[...] = jnp.zeros_like(acc)

    c0 = jnp.min(idx) // _CHUNK
    c1 = jnp.max(idx) // _CHUNK

    iota = jax.lax.broadcasted_iota(jnp.int32, (_BLOCK, _CHUNK), 1)

    def chunk(c, _):
        base = c * _CHUNK
        oh = (idx == base + iota).astype(jnp.bfloat16)  # (R, C)
        rows = pl.ds(pl.multiple_of(base, _CHUNK), _CHUNK)
        part = jnp.dot(oh, hi_ref[rows, :],
                       preferred_element_type=jnp.float32)
        part = part + jnp.dot(oh, lo_ref[rows, :],
                              preferred_element_type=jnp.float32)
        acc[...] += part
        return 0

    jax.lax.fori_loop(c0, c1 + 1, chunk, 0)
    out_ref[...] = acc[...]


@functools.partial(jax.jit, static_argnames=("interpret",))
def onehot_gather(table: Array, idx: Array, interpret: bool = False) -> Array:
    """table[(idx,)] via MXU one-hot matmuls. table (T, W) f32, idx (N,)
    int32 in [0, T); out-of-range (e.g. clamped miss) rows return the row,
    negative indices return zeros. The full table must fit VMEM as bf16
    pairs (T*W*4 bytes <= ~6 MB)."""
    T, W = int(table.shape[0]), int(table.shape[1])
    N = int(idx.shape[0])

    tp = _ceil_to(T, _CHUNK)
    wp = max(64, _ceil_to(W, 64))
    tbl = jnp.pad(table, ((0, tp - T), (0, wp - W)))
    hi = tbl.astype(jnp.bfloat16)
    lo = (tbl - hi.astype(jnp.float32)).astype(jnp.bfloat16)

    npad = _ceil_to(N, _BLOCK)
    idx2 = jnp.pad(idx.astype(jnp.int32), (0, npad - N)).reshape(npad, 1)

    grid = (npad // _BLOCK,)
    out = pl.pallas_call(
        functools.partial(_kernel, T=tp, W=wp),
        grid=grid,
        in_specs=[
            pl.BlockSpec((_BLOCK, 1), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((tp, wp), lambda i: (0, 0), memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((_BLOCK, wp), lambda i: (i, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((npad, wp), jnp.float32),
        scratch_shapes=[pltpu.VMEM((_BLOCK, wp), jnp.float32)],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=_VMEM_LIMIT),
        interpret=interpret,
    )(idx2, hi, lo)
    return out[:N, :W]


def gather_fits_vmem(table: Array) -> bool:
    """Whether the hi/lo bf16 pair of this table fits the VMEM budget."""
    t = _ceil_to(int(table.shape[0]), _CHUNK)
    w = max(64, _ceil_to(int(table.shape[1]), 64))
    return t * w * 4 <= 6 * 1024 * 1024
