"""Batched-K DFS expansion: hide the per-visit vector->scalar stall.

exp_traversal_counts + exp_overhead showed the per-visit cost (~290ns) is
dominated by serialized any()-readbacks and pl.when branches, not VPU work.
This variant pops up to K stack nodes per while-iteration: all 2K child
slab tests and their any() reductions are issued before any scalar
consumption, so the readback latencies overlap.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_batchk.py
"""
import functools
import json
import time

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuray.kernels.trace_pallas import (
    INF, MAX_LEAF, MAX_STACK, PACKET_LANES, PARALLEL_EPS, T_MIN, pack_scene)


def _kernel_bk(meta_ref, aabb_ref, tverts_ref,
               ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
               t_out, idx_out, t_scr, idx_scr, stack_ref,
               *, any_hit: bool, common_origin: bool, rows: int, K: int):
    if common_origin:
        ox, oy, oz = ox_ref[0, 0], oy_ref[0, 0], oz_ref[0, 0]
    else:
        ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    tmax_in = tmax_ref[...]
    dead = tmax_in <= 0.0
    tmax = jnp.where(dead, -INF, tmax_in)

    def safe_inv(v):
        tiny = jnp.where(v < 0, np.float32(-1e-20), np.float32(1e-20))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

    inv_dx, inv_dy, inv_dz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    sx, sy, sz = jnp.sum(dx), jnp.sum(dy), jnp.sum(dz)

    def slab(node, t_limit):
        f0 = (aabb_ref[3, node] - ox) * inv_dx
        n0 = (aabb_ref[0, node] - ox) * inv_dx
        f1 = (aabb_ref[4, node] - oy) * inv_dy
        n1 = (aabb_ref[1, node] - oy) * inv_dy
        f2 = (aabb_ref[5, node] - oz) * inv_dz
        n2 = (aabb_ref[2, node] - oz) * inv_dz
        t1 = jnp.minimum(jnp.maximum(f0, n0),
                         jnp.minimum(jnp.maximum(f1, n1), jnp.maximum(f2, n2)))
        t0 = jnp.maximum(jnp.minimum(f0, n0),
                         jnp.maximum(jnp.minimum(f1, n1), jnp.minimum(f2, n2)))
        return (t1 >= jnp.maximum(t0, 0.0)) & (t0 < t_limit) & (t1 > 0.0)

    def visit(hit, entered, count, first):
        @pl.when(entered & (count > 0))
        def _():
            t = t_scr[...]
            idx = idx_scr[...]
            t_lim = jnp.where(hit, jnp.minimum(t, tmax), -INF)
            for j in range(MAX_LEAF):
                ti = first + jnp.minimum(jnp.int32(j), count - 1)
                nx = tverts_ref[0, ti]
                ny = tverts_ref[1, ti]
                nz = tverts_ref[2, ti]
                np0 = tverts_ref[3, ti]
                ndotd = nx * dx + ny * dy + nz * dz
                ndoto = nx * ox + ny * oy + nz * oz
                invalid = jnp.abs(ndotd) < PARALLEL_EPS
                denom = jnp.where(invalid, np.float32(1.0), ndotd)
                t_hit = (np0 - ndoto) / denom
                px = ox + dx * t_hit
                py = oy + dy * t_hit
                pz = oz + dz * t_hit
                u = (tverts_ref[4, ti] * px + tverts_ref[5, ti] * py
                     + tverts_ref[6, ti] * pz + tverts_ref[7, ti])
                v = (tverts_ref[8, ti] * px + tverts_ref[9, ti] * py
                     + tverts_ref[10, ti] * pz + tverts_ref[11, ti])
                in_tri = (u > 0) & (v > 0) & (u + v < 1)
                ok = (jnp.logical_not(invalid) & (t_hit >= T_MIN) & in_tri
                      & (j < count) & (t_hit < t_lim))
                t = jnp.where(ok, t_hit, t)
                idx = jnp.where(ok, ti, idx)
                t_lim = jnp.minimum(t_lim, t)
            t_scr[...] = t
            idx_scr[...] = idx

    def body(sp):
        k = jnp.minimum(sp, K)
        # ---- vector phase: all 2K child slab tests, no scalar consumption
        t = t_scr[...]
        limit = jnp.minimum(t, tmax)
        if any_hit:
            limit = jnp.where(idx_scr[...] < 0, limit, -INF)
        infos = []
        for i in range(K):
            node = stack_ref[jnp.maximum(sp - 1 - i, 0)]
            left = node + 1
            right = meta_ref[2, node]
            hit_l = slab(left, limit)
            hit_r = slab(right, limit)
            ent_l = jnp.any(hit_l)
            ent_r = jnp.any(hit_r)
            infos.append((node, left, right, hit_l, hit_r, ent_l, ent_r))
        sp_new = sp - k
        # ---- scalar/leaf phase: consume flags (latencies already covered)
        for i in range(K):
            node, left, right, hit_l, hit_r, ent_l, ent_r = infos[i]
            valid_i = i < sp
            ent_l = ent_l & valid_i
            ent_r = ent_r & valid_i
            count_l = meta_ref[1, left]
            count_r = meta_ref[1, right]
            visit(hit_l, ent_l, count_l, meta_ref[0, left])
            visit(hit_r, ent_r, count_r, meta_ref[0, right])
            axis = meta_ref[3, node]
            left_low = meta_ref[4, node]
            dpos = jnp.where(axis == 0, sx, jnp.where(axis == 1, sy, sz)) > 0
            near_is_left = dpos == (left_low == 1)
            push_l = ent_l & (count_l == 0)
            push_r = ent_r & (count_r == 0)
            far_node = jnp.where(near_is_left, right, left)
            near_node = jnp.where(near_is_left, left, right)
            push_far = jnp.where(near_is_left, push_r, push_l)
            push_near = jnp.where(near_is_left, push_l, push_r)

            @pl.when(push_far)
            def _():
                stack_ref[sp_new] = far_node

            sp_new = sp_new + push_far.astype(jnp.int32)

            @pl.when(push_near)
            def _():
                stack_ref[sp_new] = near_node

            sp_new = sp_new + push_near.astype(jnp.int32)
        if any_hit:
            sp_new = jnp.where(jnp.all((idx_scr[...] >= 0) | dead), 0, sp_new)
        return sp_new

    t_scr[...] = jnp.full((rows, PACKET_LANES), INF, jnp.float32)
    idx_scr[...] = jnp.full((rows, PACKET_LANES), -1, jnp.int32)
    root_hit = slab(0, tmax)
    root_entered = jnp.any(root_hit)
    root_count = meta_ref[1, 0]
    visit(root_hit, root_entered, root_count, meta_ref[0, 0])
    stack_ref[0] = jnp.int32(0)
    sp0 = jnp.where(root_entered & (root_count == 0), 1, 0).astype(jnp.int32)
    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    t_out[...] = t_scr[...]
    idx_out[...] = idx_scr[...]


@functools.partial(jax.jit,
                   static_argnames=("any_hit", "common_origin", "rows", "K"))
def trace_bk(meta, aabb, tverts, orig, d, t_max, any_hit=False,
             common_origin=False, rows=32, K=4):
    n = orig.shape[0]
    packet = rows * PACKET_LANES
    n_pad = (n + packet - 1) // packet * packet
    pad = n_pad - n

    def prep(x, fill):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    orig = prep(orig, 0.0)
    dd = prep(d, 1.0)
    tm = prep(t_max, -1.0)
    n_packets = n_pad // packet
    shape2 = (n_packets * rows, PACKET_LANES)
    comps = [orig[:, 0], orig[:, 1], orig[:, 2], dd[:, 0], dd[:, 1],
             dd[:, 2], tm]
    comps = [c.reshape(shape2) for c in comps]
    ray_spec = pl.BlockSpec((rows, PACKET_LANES), lambda i: (i, 0),
                            memory_space=pltpu.VMEM)

    def pad128(x):
        w = x.shape[1]
        wp = (w + 127) // 128 * 128
        return jnp.pad(x, ((0, 0), (0, wp - w)))

    meta_p, aabb_p, tverts_p = pad128(meta), pad128(aabb), pad128(tverts)
    tab_specs = [
        pl.BlockSpec(meta_p.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(aabb_p.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec(tverts_p.shape, lambda i: (0, 0), memory_space=pltpu.SMEM),
    ]
    kernel = functools.partial(_kernel_bk, any_hit=any_hit,
                               common_origin=common_origin, rows=rows, K=K)
    t, idx = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=tab_specs + [ray_spec] * 7,
        out_specs=[
            pl.BlockSpec((rows, PACKET_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, PACKET_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, PACKET_LANES), jnp.float32),
            pltpu.VMEM((rows, PACKET_LANES), jnp.int32),
            pltpu.SMEM((MAX_STACK,), jnp.int32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.int32),
        ],
    )(meta_p, aabb_p, tverts_p, *comps)
    return t.reshape(n_pad)[:n], idx.reshape(n_pad)[:n]


def timed(fn, iters=20, trials=3):
    out = fn()
    np.asarray(out[0][:1])
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        np.asarray(out[0][:1])
        best = min(best, (time.perf_counter() - t0) / iters)
    return best * 1e3


def main():
    from tpuray.scene.builder import reference_default_scene
    from tpuray.scene.camera import OrbitCamera
    from tpuray.render.tiling import tile_pixel_coords
    from tpuray.kernels import trace_pallas as tp

    h = w = 800
    scene = reference_default_scene()
    meta, aabb, tverts = jax.device_put(
        pack_scene(scene.bvh, scene.triangles))
    cam = OrbitCamera(width=w, height=h).snapshot()
    xx, yy = tile_pixel_coords(h, w)
    n = int(xx.shape[0])
    xs = (2.0 * (xx.astype(jnp.float32) + 0.5) / w - 1.0) * cam.tan_half_fov
    ys = -(2.0 * (yy.astype(jnp.float32) + 0.5) / h - 1.0) * cam.tan_half_fov
    d_cam = jnp.stack([xs, ys, -jnp.ones_like(xs)], axis=-1)
    d = jnp.einsum("ij,nj->ni", cam.cam_to_world, d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.eye, (n, 3))
    tm = jnp.full((n,), INF)

    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n, 3))
    d_inc = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    t0, i0 = tp.trace_packets(meta, aabb, tverts, o, d, tm,
                              common_origin=True)
    p = o + d * jnp.minimum(t0, 10.0)[..., None]
    t_ref, i_ref = tp.trace_packets(meta, aabb, tverts, p, d_inc, tm)
    t_ref = np.asarray(t_ref)

    import sys
    combos = [(32, 4), (32, 8)]
    if len(sys.argv) > 2:
        combos = [(int(sys.argv[1]), int(sys.argv[2]))]
    for rows, K in combos:
        fi = lambda: trace_bk(meta, aabb, tverts, p, d_inc, tm,
                              rows=rows, K=K)
        tI = timed(fi)
        ti, ii = fi()
        ok = bool(np.allclose(np.asarray(ti), t_ref, rtol=1e-6, atol=1e-6))
        print(json.dumps({"rows": rows, "K": K,
                          "incoherent_ms": round(tI, 2),
                          "inc_mrays": round(n / tI / 1e3, 1),
                          "match": ok}), flush=True)


if __name__ == "__main__":
    main()
