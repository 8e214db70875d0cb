"""Instrument the packet traversal: per-packet expand / leaf-entry counts.

Ground truth for the incoherent-traversal redesign (round-4): how much of
the tree does a packet actually walk for coherent camera primaries vs
fully-random secondary rays, and how much of the time is inner-node
expansion vs leaf triangle testing.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_traversal_counts.py
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
    INF, MAX_LEAF, MAX_STACK, PACKET, PACKET_LANES, PACKET_ROWS,
    PARALLEL_EPS, T_MIN, pack_scene)


def _kernel_counted(meta_ref, aabb_ref, tverts_ref,
                    ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
                    t_out, idx_out, cnt_out, t_scr, idx_scr, stack_ref,
                    cnt_ref, *, any_hit: bool):
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

    def slab(node):
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
        t = t_scr[...]
        limit = jnp.minimum(t, tmax)
        if any_hit:
            active = idx_scr[...] < 0
        else:
            active = jnp.ones_like(t, dtype=bool)
        return ((t1 >= jnp.maximum(t0, 0.0)) & (t0 < limit) & (t1 > 0.0)
                & active)

    def visit(node, hit, entered, count, first):
        @pl.when(entered & (count > 0))
        def _():
            cnt_ref[1] = cnt_ref[1] + 1
            t = t_scr[...]
            idx = idx_scr[...]
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
                      & hit & (j < count) & (t_hit < t) & (t_hit < tmax))
                t = jnp.where(ok, t_hit, t)
                idx = jnp.where(ok, ti, idx)
            t_scr[...] = t
            idx_scr[...] = idx

    def expand(node, sp):
        cnt_ref[0] = cnt_ref[0] + 1
        left = node + 1
        right = meta_ref[2, node]
        axis = meta_ref[3, node]
        left_low = meta_ref[4, node]
        hit_l = slab(left)
        hit_r = slab(right)
        ent_l = jnp.any(hit_l)
        ent_r = jnp.any(hit_r)
        count_l = meta_ref[1, left]
        count_r = meta_ref[1, right]
        visit(left, hit_l, ent_l, count_l, meta_ref[0, left])
        visit(right, hit_r, ent_r, count_r, meta_ref[0, right])
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
            stack_ref[sp] = far_node

        sp = sp + push_far.astype(jnp.int32)

        @pl.when(push_near)
        def _():
            stack_ref[sp] = near_node

        return sp + push_near.astype(jnp.int32)

    def body(sp):
        sp = sp - 1
        node = stack_ref[sp]
        sp = expand(node, sp)
        if any_hit:
            sp = jnp.where(jnp.all((idx_scr[...] >= 0) | dead), 0, sp)
        return sp

    t_scr[...] = jnp.full((PACKET_ROWS, PACKET_LANES), INF, jnp.float32)
    idx_scr[...] = jnp.full((PACKET_ROWS, PACKET_LANES), -1, jnp.int32)
    cnt_ref[0] = 0
    cnt_ref[1] = 0
    root_hit = slab(0)
    root_entered = jnp.any(root_hit)
    root_count = meta_ref[1, 0]
    visit(0, root_hit, root_entered, root_count, meta_ref[0, 0])
    stack_ref[0] = jnp.int32(0)
    sp0 = jnp.where(root_entered & (root_count == 0), 1, 0).astype(jnp.int32)
    jax.lax.while_loop(lambda sp: sp > 0, body, sp0)
    t_out[...] = t_scr[...]
    idx_out[...] = idx_scr[...]
    li = jax.lax.broadcasted_iota(jnp.int32, (8, 128), 1)
    cnt_out[...] = jnp.where(li == 0, cnt_ref[0],
                             jnp.where(li == 1, cnt_ref[1], 0))


@functools.partial(jax.jit, static_argnames=("any_hit",))
def trace_counted(meta, aabb, tverts, orig, d, t_max, any_hit=False):
    n = orig.shape[0]
    n_pad = (n + PACKET - 1) // PACKET * PACKET
    pad = n_pad - n

    def prep(x, fill):
        return jnp.pad(x, ((0, pad),) + ((0, 0),) * (x.ndim - 1),
                       constant_values=fill)

    orig = prep(orig, 0.0)
    dd = prep(d, 1.0)
    tm = prep(t_max, -1.0)
    n_packets = n_pad // PACKET
    shape2 = (n_packets * PACKET_ROWS, PACKET_LANES)
    comps = [orig[:, 0], orig[:, 1], orig[:, 2], dd[:, 0], dd[:, 1],
             dd[:, 2], tm]
    comps = [c.reshape(shape2) for c in comps]
    ray_spec = pl.BlockSpec((PACKET_ROWS, PACKET_LANES), lambda i: (i, 0),
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
    kernel = functools.partial(_kernel_counted, any_hit=any_hit)
    t, idx, cnt = pl.pallas_call(
        kernel,
        grid=(n_packets,),
        in_specs=tab_specs + [ray_spec] * 7,
        out_specs=[
            pl.BlockSpec((PACKET_ROWS, PACKET_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((PACKET_ROWS, PACKET_LANES), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((8, 128), lambda i: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((PACKET_ROWS, PACKET_LANES), jnp.float32),
            pltpu.VMEM((PACKET_ROWS, PACKET_LANES), jnp.int32),
            pltpu.SMEM((MAX_STACK,), jnp.int32),
            pltpu.SMEM((2,), jnp.int32),
        ],
        out_shape=[
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.int32),
            jax.ShapeDtypeStruct((n_packets * 8, 128), jnp.int32),
        ],
    )(meta_p, aabb_p, tverts_p, *comps)
    return (t.reshape(n_pad)[:n], idx.reshape(n_pad)[:n],
            cnt.reshape(n_packets, 8, 128)[:, 0, :2])


def main():
    from tpuray.scene.builder import reference_default_scene
    from tpuray.scene.camera import OrbitCamera
    from tpuray.render.tiling import tile_pixel_coords

    h = w = 800
    scene = reference_default_scene()
    meta, aabb, tverts = jax.device_put(
        pack_scene(scene.bvh, scene.triangles))
    n_nodes = int(scene.bvh.count)
    n_leaves = int(np.asarray(scene.bvh.tri_count > 0).sum())
    print(json.dumps({"n_nodes": n_nodes, "n_inner": n_nodes - n_leaves,
                      "n_leaves": n_leaves,
                      "n_tris": int(scene.triangles.count)}))

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

    t0, i0, cnt = trace_counted(meta, aabb, tverts, o, d, tm)
    cnt = np.asarray(cnt)
    hitfrac = float((np.asarray(i0) >= 0).mean())
    print(json.dumps({"case": "coherent_primary",
                      "hit_frac": round(hitfrac, 3),
                      "expands_mean": float(cnt[:, 0].mean()),
                      "expands_max": int(cnt[:, 0].max()),
                      "leaves_mean": float(cnt[:, 1].mean()),
                      "leaves_max": int(cnt[:, 1].max())}))

    p = o + d * jnp.minimum(t0, 10.0)[..., None]
    key = jax.random.PRNGKey(0)
    v = jax.random.normal(key, (n, 3))
    d_inc = v / jnp.linalg.norm(v, axis=-1, keepdims=True)

    for name, ah in (("incoherent_closest", False), ("incoherent_anyhit", True)):
        t1, i1, cnt = trace_counted(meta, aabb, tverts, p, d_inc, tm,
                                    any_hit=ah)
        cnt = np.asarray(cnt)
        print(json.dumps({"case": name,
                          "hit_frac": float((np.asarray(i1) >= 0).mean()),
                          "expands_mean": float(cnt[:, 0].mean()),
                          "leaves_mean": float(cnt[:, 1].mean()),
                          "leaves_max": int(cnt[:, 1].max())}))

    # origins ON the object only (all lanes are real surface points):
    on_obj = np.asarray(i0) >= 0
    idxs = np.nonzero(on_obj)[0]
    sel = np.resize(idxs, (n,))
    p_obj = jnp.asarray(np.asarray(p)[sel])
    t2, i2, cnt = trace_counted(meta, aabb, tverts, p_obj, d_inc, tm)
    cnt = np.asarray(cnt)
    print(json.dumps({"case": "incoherent_closest_on_object",
                      "hit_frac": float((np.asarray(i2) >= 0).mean()),
                      "expands_mean": float(cnt[:, 0].mean()),
                      "leaves_mean": float(cnt[:, 1].mean())}))


if __name__ == "__main__":
    main()
