"""Experiment: traversal-kernel variants targeting the incoherent-ray regime.

Hypothesis (docs/perf.md says incoherent packets walk ~80% of the tree):
the walk is bounded not only by VPU slab math but by VMEM round-trips of
the per-lane (t, idx) scratch — slab() reads t_scr twice per expand and
visit() does a read-modify-write per entered leaf. Variants:

  base      — trace_pallas.trace_packets as shipped
  scalimit  — slab() culls against a packet-wide SCALAR t bound carried in
              the while loop (no t_scr read); per-lane exactness preserved
              in visit()
  regcarry  — t/idx carried as vector registers through lax.while_loop
              (round-1 note said Mosaic mishandled large vector carries —
              re-test on current toolchain)
  oinv      — precompute o*inv_d per ray; slab becomes mul+sub -> fma shape

Run on TPU:  PYTHONPATH=. python scripts/exp_kernel_variants.py
"""
from __future__ import annotations

import functools
import json
import time
from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from tpuray.kernels import trace_pallas as tp
from tpuray.utils.platform import enable_compile_cache

PACKET_LANES = tp.PACKET_LANES
MAX_STACK = tp.MAX_STACK
MAX_LEAF = tp.MAX_LEAF
INF = tp.INF
T_MIN = tp.T_MIN
PARALLEL_EPS = tp.PARALLEL_EPS


def _kernel_v(meta_ref, aabb_ref, tverts_ref,
              ox_ref, oy_ref, oz_ref, dx_ref, dy_ref, dz_ref, tmax_ref,
              t_out, idx_out, t_scr, idx_scr, stack_ref,
              *, n_nodes: int, variant: str, rows: int):
    ox, oy, oz = ox_ref[...], oy_ref[...], oz_ref[...]
    dx, dy, dz = dx_ref[...], dy_ref[...], dz_ref[...]
    tmax_in = tmax_ref[...]
    dead = tmax_in <= 0.0
    tmax = jnp.where(dead, -INF, tmax_in)

    def safe_inv(v):
        tiny = jnp.where(v < 0, np.float32(-1e-20), np.float32(1e-20))
        return 1.0 / jnp.where(jnp.abs(v) < 1e-20, tiny, v)

    inv_dx, inv_dy, inv_dz = safe_inv(dx), safe_inv(dy), safe_inv(dz)
    if variant == "oinv":
        oix, oiy, oiz = ox * inv_dx, oy * inv_dy, oz * inv_dz

    sx = jnp.sum(dx)
    sy = jnp.sum(dy)
    sz = jnp.sum(dz)

    def slab(node, t_vec, slimit):
        amin_x = aabb_ref[0, node]
        amin_y = aabb_ref[1, node]
        amin_z = aabb_ref[2, node]
        amax_x = aabb_ref[3, node]
        amax_y = aabb_ref[4, node]
        amax_z = aabb_ref[5, node]
        if variant == "oinv":
            f0 = amax_x * inv_dx - oix
            n0 = amin_x * inv_dx - oix
            f1 = amax_y * inv_dy - oiy
            n1 = amin_y * inv_dy - oiy
            f2 = amax_z * inv_dz - oiz
            n2 = amin_z * inv_dz - oiz
        else:
            f0 = (amax_x - ox) * inv_dx
            n0 = (amin_x - ox) * inv_dx
            f1 = (amax_y - oy) * inv_dy
            n1 = (amin_y - oy) * inv_dy
            f2 = (amax_z - oz) * inv_dz
            n2 = (amin_z - oz) * inv_dz
        t1 = jnp.minimum(jnp.maximum(f0, n0),
                         jnp.minimum(jnp.maximum(f1, n1), jnp.maximum(f2, n2)))
        t0 = jnp.maximum(jnp.minimum(f0, n0),
                         jnp.maximum(jnp.minimum(f1, n1), jnp.minimum(f2, n2)))
        if variant == "scalimit":
            limit = jnp.minimum(slimit, tmax)
        else:
            limit = jnp.minimum(t_vec, tmax)
        return (t1 >= jnp.maximum(t0, 0.0)) & (t0 < limit) & (t1 > 0.0)

    def leaf_scan(t, idx, hit, count, first):
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
        return t, idx

    if variant == "regcarry":
        def expand(node, sp, t, idx):
            left = node + 1
            right = meta_ref[2, node]
            axis = meta_ref[3, node]
            left_low = meta_ref[4, node]
            hit_l = slab(left, t, None)
            hit_r = slab(right, t, None)
            ent_l = jnp.any(hit_l)
            ent_r = jnp.any(hit_r)
            count_l = meta_ref[1, left]
            count_r = meta_ref[1, right]

            def scan_l(args):
                t, idx = args
                return leaf_scan(t, idx, hit_l, count_l, meta_ref[0, left])

            t, idx = jax.lax.cond(ent_l & (count_l > 0), scan_l,
                                  lambda a: a, (t, idx))

            def scan_r(args):
                t, idx = args
                return leaf_scan(t, idx, hit_r, count_r, meta_ref[0, right])

            t, idx = jax.lax.cond(ent_r & (count_r > 0), scan_r,
                                  lambda a: a, (t, idx))

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

            return sp + push_near.astype(jnp.int32), t, idx

        def body(carry):
            sp, t, idx = carry
            sp = sp - 1
            node = stack_ref[sp]
            sp, t, idx = expand(node, sp, t, idx)
            return sp, t, idx

        t0v = jnp.full((rows, PACKET_LANES), INF, jnp.float32)
        i0v = jnp.full((rows, PACKET_LANES), -1, jnp.int32)
        root_hit = slab(0, t0v, None)
        root_entered = jnp.any(root_hit)
        root_count = meta_ref[1, 0]

        def scan_root(args):
            t, idx = args
            return leaf_scan(t, idx, root_hit, root_count, meta_ref[0, 0])

        t0v, i0v = jax.lax.cond(root_entered & (root_count > 0), scan_root,
                                lambda a: a, (t0v, i0v))
        stack_ref[0] = jnp.int32(0)
        sp0 = jnp.where(root_entered & (root_count == 0), 1, 0).astype(jnp.int32)
        _, tf, idf = jax.lax.while_loop(lambda c: c[0] > 0, body,
                                        (sp0, t0v, i0v))
        t_out[...] = tf
        idx_out[...] = idf
        return

    # --- base / scalimit / oinv: VMEM scratch walk (as shipped), with the
    # scalimit variant threading a scalar bound through the while carry ---
    def visit(node, hit, entered, count, first):
        @pl.when(entered & (count > 0))
        def _():
            t = t_scr[...]
            idx = idx_scr[...]
            t, idx = leaf_scan(t, idx, hit, count, first)
            t_scr[...] = t
            idx_scr[...] = idx

    def expand(node, sp, slimit):
        left = node + 1
        right = meta_ref[2, node]
        axis = meta_ref[3, node]
        left_low = meta_ref[4, node]
        if variant == "scalimit":
            hit_l = slab(left, None, slimit)
            hit_r = slab(right, None, slimit)
        else:
            t = t_scr[...]
            hit_l = slab(left, t, None)
            hit_r = slab(right, t, None)
        ent_l = jnp.any(hit_l)
        ent_r = jnp.any(hit_r)
        count_l = meta_ref[1, left]
        count_r = meta_ref[1, right]

        visit(left, hit_l, ent_l, count_l, meta_ref[0, left])
        visit(right, hit_r, ent_r, count_r, meta_ref[0, right])
        if variant == "scalimit":
            any_leaf = (ent_l & (count_l > 0)) | (ent_r & (count_r > 0))
            slimit = jnp.where(any_leaf, jnp.max(t_scr[...]), slimit)

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

        return sp + push_near.astype(jnp.int32), slimit

    def body(carry):
        sp, slimit = carry
        sp = sp - 1
        node = stack_ref[sp]
        sp, slimit = expand(node, sp, slimit)
        return sp, slimit

    t_scr[...] = jnp.full((rows, PACKET_LANES), INF, jnp.float32)
    idx_scr[...] = jnp.full((rows, PACKET_LANES), -1, jnp.int32)
    root_hit = slab(0, t_scr[...], INF)
    root_entered = jnp.any(root_hit)
    root_count = meta_ref[1, 0]
    visit(0, root_hit, root_entered, root_count, meta_ref[0, 0])
    stack_ref[0] = jnp.int32(0)
    sp0 = jnp.where(root_entered & (root_count == 0), 1, 0).astype(jnp.int32)
    jax.lax.while_loop(lambda c: c[0] > 0, body, (sp0, jnp.float32(INF)))
    t_out[...] = t_scr[...]
    idx_out[...] = idx_scr[...]


@partial(jax.jit, static_argnames=("variant", "rows"))
def trace_variant(meta, aabb, tverts, orig, d, t_max, variant="base", rows=32):
    n = orig.shape[0]
    n_nodes = meta.shape[1]
    packet = rows * PACKET_LANES
    assert n % packet == 0
    n_packets = n // packet
    shape2 = (n_packets * rows, PACKET_LANES)
    comps = [orig[:, 0], orig[:, 1], orig[:, 2], d[:, 0], d[:, 1], d[:, 2],
             t_max]
    comps = [c.reshape(shape2) for c in comps]
    ray_spec = pl.BlockSpec((rows, PACKET_LANES),
                            lambda i, *_: (i, 0), memory_space=pltpu.VMEM)
    grid_spec = pltpu.PrefetchScalarGridSpec(
        num_scalar_prefetch=3,
        grid=(n_packets,),
        in_specs=[ray_spec] * 7,
        out_specs=[
            pl.BlockSpec((rows, PACKET_LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((rows, PACKET_LANES), lambda i, *_: (i, 0),
                         memory_space=pltpu.VMEM),
        ],
        scratch_shapes=[
            pltpu.VMEM((rows, PACKET_LANES), jnp.float32),
            pltpu.VMEM((rows, PACKET_LANES), jnp.int32),
            pltpu.SMEM((MAX_STACK,), jnp.int32),
        ],
    )
    kernel = functools.partial(_kernel_v, n_nodes=n_nodes, variant=variant, rows=rows)
    t, idx = pl.pallas_call(
        kernel,
        grid_spec=grid_spec,
        out_shape=[
            jax.ShapeDtypeStruct(shape2, jnp.float32),
            jax.ShapeDtypeStruct(shape2, jnp.int32),
        ],
    )(meta, aabb, tverts, *comps)
    return t.reshape(n), idx.reshape(n)


def main():
    enable_compile_cache()
    from tpuray.scene.builder import reference_default_scene
    scene = reference_default_scene()
    meta, aabb, tverts = jax.jit(tp.pack_scene)(scene.bvh, scene.triangles)

    # bench.py's incoherent workload: origins on primary-hit points of an
    # 800x800 camera frame, hashed uniform-sphere directions
    from tpuray.scene.camera import OrbitCamera
    from tpuray.render.tiling import tile_pixel_coords_np
    cam = OrbitCamera(width=800, height=800).snapshot()
    xx, yy = tile_pixel_coords_np(800, 800)
    n = int(xx.shape[0])
    xs = ((2.0 * (xx.astype(np.float32) + 0.5) / 800 - 1.0)
          * float(cam.tan_half_fov))
    ys = (-(2.0 * (yy.astype(np.float32) + 0.5) / 800 - 1.0)
          * float(cam.tan_half_fov))
    d_cam = np.stack([xs, ys, -np.ones_like(xs)], axis=-1)
    d_np = d_cam @ np.asarray(cam.cam_to_world, np.float32).T
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o_np = np.broadcast_to(np.asarray(cam.eye, np.float32), (n, 3))
    o = jax.device_put(jnp.asarray(o_np))
    dprim = jax.device_put(jnp.asarray(d_np))
    tm = jax.device_put(jnp.full((n,), INF))
    t_prim, _ = tp.trace_packets(meta, aabb, tverts, o, dprim, tm,
                                 common_origin=True)

    @jax.jit
    def incoherent_inputs(o, d, t):
        p = o + d * jnp.minimum(t, 10.0)[..., None]
        i = jnp.arange(n, dtype=jnp.uint32)
        def h(x):
            x = (x ^ jnp.uint32(61)) ^ (x >> 16)
            x = x * jnp.uint32(9)
            x = x ^ (x >> 4)
            x = x * jnp.uint32(0x27d4eb2d)
            return (x ^ (x >> 15)).astype(jnp.uint32)
        u1 = h(i).astype(jnp.float32) / np.float32(2**32)
        u2 = h(i * jnp.uint32(7919)).astype(jnp.float32) / np.float32(2**32)
        ct = 1.0 - 2.0 * u1
        st = jnp.sqrt(jnp.maximum(0.0, 1.0 - ct * ct))
        phi = 2.0 * np.pi * u2
        dirs = jnp.stack([st * jnp.cos(phi), ct, st * jnp.sin(phi)], -1)
        return p, dirs

    p_inc, d_inc = incoherent_inputs(o, dprim, t_prim)
    npad = (n + 32768 - 1) // 32768 * 32768
    pad = npad - n
    p_inc = jax.device_put(jnp.pad(p_inc, ((0, pad), (0, 0))))
    d_inc = jax.device_put(jnp.pad(d_inc, ((0, pad), (0, 0)),
                                   constant_values=1.0))
    tmp = jax.device_put(jnp.pad(tm, ((0, pad),), constant_values=-1.0))

    results = {}
    base_t = base_i = None
    cases = [("base", r) for r in (8, 16, 32)]
    for variant, rows in cases:
        key = f"{variant}_r{rows}"
        try:
            out = {}

            def run():
                out["r"] = trace_variant(meta, aabb, tverts, p_inc, d_inc,
                                         tmp, variant=variant, rows=rows)

            run()
            np.asarray(out["r"][0][:1])
            best = float("inf")
            for _ in range(3):
                t0 = time.perf_counter()
                for _ in range(5):
                    run()
                np.asarray(out["r"][0][:1])
                best = min(best, (time.perf_counter() - t0) / 5)
            tv = np.asarray(out["r"][0])[:n]
            iv = np.asarray(out["r"][1])[:n]
            if base_t is None:
                base_t, base_i = tv, iv
                match = True
            else:
                match = bool(np.array_equal(iv, base_i)
                             and np.allclose(tv, base_t, rtol=1e-6))
            results[key] = {"ms": round(best * 1e3, 3),
                            "mrays_s": round(n / best / 1e6, 1),
                            "match_base": match}
            print(json.dumps({key: results[key]}), flush=True)
        except Exception as e:
            print(json.dumps({key: {"error": repr(e)[:300]}}), flush=True)

    print(json.dumps({"summary": results}))


if __name__ == "__main__":
    main()
