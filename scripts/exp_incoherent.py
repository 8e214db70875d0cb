"""Measure: incoherent-ray traversal cost + ray-binning primitives.

The frame's PT pass costs ~125 ms while coherent-proxy traversal + shading
account for ~38 ms; the gap is packet divergence on the incoherent rays
(env-shadow / bounce directions). This measures the real costs and the
ingredients of a sort-based reordering fix.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_incoherent.py
"""
import json
import time

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp
import numpy as np


def _sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    np.asarray(leaf.reshape(-1)[:1])


def timed(fn, *args, iters=10, trials=3):
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


def main():
    from tpuray.kernels import trace_pallas as tp
    from tpuray.scene.builder import reference_default_scene
    from tpuray.scene.camera import OrbitCamera
    from tpuray.render.tiling import tile_pixel_coords

    h = w = 800
    scene = reference_default_scene()
    meta, aabb, tverts = jax.device_put(tp.pack_scene(scene.bvh, scene.triangles))
    cam = OrbitCamera(width=w, height=h).snapshot()
    xx, yy = tile_pixel_coords(h, w)
    n = int(xx.shape[0])
    xs = (2.0 * (xx.astype(jnp.float32) + 0.5) / w - 1.0) * cam.tan_half_fov
    ys = -(2.0 * (yy.astype(jnp.float32) + 0.5) / h - 1.0) * cam.tan_half_fov
    d_cam = jnp.stack([xs, ys, -jnp.ones_like(xs)], axis=-1)
    d = jnp.einsum("ij,nj->ni", cam.cam_to_world, d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.eye, (n, 3))
    tm = jnp.full((n,), tp.INF)

    f = jax.jit(lambda o, d: tp.trace_packets(meta, aabb, tverts, o, d, tm,
                                              common_origin=True))
    t0, idx0 = f(o, d)
    _sync(t0)
    print(json.dumps({"stage": "primary", "ms": round(timed(f, o, d), 2)}),
          flush=True)

    # hit points as bounce origins
    p = o + d * jnp.minimum(t0, 10.0)[..., None]
    key = jax.random.PRNGKey(0)

    # fully incoherent directions (uniform sphere per ray)
    v = jax.random.normal(key, (n, 3))
    d_inc = v / jnp.linalg.norm(v, axis=-1, keepdims=True)
    f2 = jax.jit(lambda p, d: tp.trace_packets(meta, aabb, tverts, p, d, tm))
    print(json.dumps({"stage": "incoherent_closest",
                      "ms": round(timed(f2, p, d_inc), 2)}), flush=True)

    f3 = jax.jit(lambda p, d: tp.trace_packets(meta, aabb, tverts, p, d, tm,
                                               any_hit=True))
    print(json.dumps({"stage": "incoherent_anyhit",
                      "ms": round(timed(f3, p, d_inc), 2)}), flush=True)

    # point-light shadow rays: 4 distinct directions
    lights = jnp.asarray([[0.5, 0.5, 0.5], [-0.5, 0.75, 0.5],
                          [-0.5, 0.75, 0.75], [0.75, 0.75, 0.75]])
    pick = jax.random.randint(jax.random.PRNGKey(1), (n,), 0, 4)
    to_l = lights[pick] - p
    d_pt = to_l / jnp.linalg.norm(to_l, axis=-1, keepdims=True)
    print(json.dumps({"stage": "pointlight_anyhit",
                      "ms": round(timed(f3, p, d_pt), 2)}), flush=True)

    # --- binning primitives ---
    # key: direction octant(3) + coarse theta/phi bins
    def bin_key(d):
        oct_ = ((d[:, 0] > 0).astype(jnp.uint32)
                + 2 * (d[:, 1] > 0).astype(jnp.uint32)
                + 4 * (d[:, 2] > 0).astype(jnp.uint32))
        a = jnp.abs(d)
        u = jnp.clip((a[:, 0] / (a.sum(1) + 1e-9) * 8), 0, 7).astype(jnp.uint32)
        v2 = jnp.clip((a[:, 1] / (a.sum(1) + 1e-9) * 8), 0, 7).astype(jnp.uint32)
        return (oct_ << 6) | (u << 3) | v2

    def sort_trace_unsort(p, d):
        k = bin_key(d)
        order = jnp.argsort(k)
        po, do = p[order], d[order]
        t, i = tp.trace_packets(meta, aabb, tverts, po, do, tm, any_hit=True)
        inv = jnp.argsort(order)
        return t[inv], i[inv]

    f4 = jax.jit(sort_trace_unsort)
    print(json.dumps({"stage": "binned_incoherent_anyhit",
                      "ms": round(timed(f4, p, d_inc), 2)}), flush=True)

    # sort machinery alone
    def sort_only(d):
        k = bin_key(d)
        order = jnp.argsort(k)
        inv = jnp.argsort(order)
        return d[order], inv

    f5 = jax.jit(sort_only)
    print(json.dumps({"stage": "sort_permute_only",
                      "ms": round(timed(f5, d_inc), 2)}), flush=True)


if __name__ == "__main__":
    main()
