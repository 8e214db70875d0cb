"""Ablation: split frame time into traversal / shading / SVGF-reproject.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_ablate.py [size]
"""
import json
import sys
import time

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp


def timed(fn, iters=8, trials=2):
    out = fn()
    jax.block_until_ready(out)
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            out = fn()
        jax.block_until_ready(out)
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 800

    from tpuray.scene.builder import reference_default_scene
    from tpuray.scene.camera import OrbitCamera
    from tpuray.scene.config import RenderConfig
    from tpuray.render.tiling import tile_pixel_coords
    from tpuray.integrator import path_tracer as ptm
    from tpuray.kernels import trace_pallas as tp

    scene = reference_default_scene()
    cfg = RenderConfig(width=size, height=size)
    cam = OrbitCamera(width=size, height=size).snapshot()
    h = w = size

    xx, yy = tile_pixel_coords(h, w)
    n = int(xx.shape[0])
    xs = (2.0 * (xx.astype(jnp.float32) + 0.5) / w - 1.0) * cam.tan_half_fov
    ys = -(2.0 * (yy.astype(jnp.float32) + 0.5) / h - 1.0) * cam.tan_half_fov
    d_cam = jnp.stack([xs, ys, -jnp.ones_like(xs)], axis=-1)
    d = jnp.einsum("ij,nj->ni", cam.cam_to_world, d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.eye, (n, 3))

    # 1. full trace_paths
    f_full = jax.jit(lambda o, d: ptm.trace_paths(
        scene, o, d, xx, yy, 3, cfg, common_origin=True))
    ms = timed(lambda: f_full(o, d)) * 1e3
    print(json.dumps({"stage": "trace_paths_full", "ms": round(ms, 2)}), flush=True)

    # 2. traversal-only: the trace calls one NEE frame makes, realistic rays.
    # Per bounce the NEE integrator issues 1 closest-hit trace + 2 any-hit
    # shadow traces (envmap + point light), so the pattern is derived from
    # cfg.max_tracing_depth instead of hardcoding 6 calls.
    assert cfg.integrator == "nee", "trace-call pattern below models NEE"
    meta, aabb, tverts = jax.device_put(tp.pack_scene(scene.bvh, scene.triangles))
    tm = jnp.full((n,), tp.INF)
    n_traces = 3 * cfg.max_tracing_depth

    # realistic secondary rays: per-pixel pseudo-random unit directions
    # (rolled camera dirs stay a tight per-packet cone and underestimate
    # the real incoherent cost by ~5x)
    def rand_dirs(salt):
        import tpuray.sampling.rng as rng
        u1, s = rng.rand(rng.pixel_seed(xx, yy, salt))
        u2, _ = rng.rand(s)
        z = u1 * 2.0 - 1.0
        r = jnp.sqrt(jnp.maximum(1.0 - z * z, 0.0))
        phi = 2.0 * jnp.pi * u2
        return jnp.stack([r * jnp.cos(phi), r * jnp.sin(phi), z], axis=-1)

    def frame_traces(o, d, live_frac):
        t, idx = tp.trace_packets(meta, aabb, tverts, o, d, tm, common_origin=True)
        outs = [t]
        # fake bounce origin + incoherent dirs (same data deps as a frame)
        p = o + d * jnp.minimum(t, 10.0)[..., None]
        # dead lanes cluster by tile (like sky regions): kill whole packets
        mask = (jnp.arange(n) // tp.PACKET) % 10 < round(10 * live_frac)
        tmk = jnp.where(mask, tp.INF, 0.0)
        for k in range(n_traces - 1):
            dk = rand_dirs(k + 1)
            tk, ik = tp.trace_packets(meta, aabb, tverts, p, dk, tmk,
                                      any_hit=(k % 3 != 0))
            outs.append(tk)
        return outs

    f_tr = jax.jit(frame_traces, static_argnames=("live_frac",))
    for frac in (1.0, 0.6):
        ms = timed(lambda: f_tr(o, d, frac)) * 1e3
        print(json.dumps({"stage": f"{n_traces}_traversals_live{frac}",
                          "ms": round(ms, 2)}), flush=True)

    # 3. shading-only: stub out trace with a cheap fake.
    # NOTE: this monkeypatch relies on path_tracer and mis calling the
    # module-global `ptm.trace` (they do; there is no
    # `from path_tracer import trace` call site). If a direct import ever
    # appears, this stage silently measures full trace instead.
    real_trace = ptm.trace
    t_ref, idx_ref = tp.trace_packets(meta, aabb, tverts, o, d, tm,
                                      common_origin=True)
    t_ref = jax.device_put(t_ref)
    idx_ref = jax.device_put(idx_ref)

    def stub(bvh, tri, orig, dd, t_max=ptm.INF, any_hit=False,
             common_origin=False):
        s = jnp.minimum(jnp.abs(orig[:, 0]) + jnp.abs(dd[:, 0]), 1.0)
        return t_ref * s, idx_ref
    ptm.trace = stub
    try:
        f_sh = jax.jit(lambda o, d: ptm.trace_paths(
            scene, o, d, xx, yy, 3, cfg, common_origin=True))
        ms = timed(lambda: f_sh(o, d)) * 1e3
        print(json.dumps({"stage": "shading_only", "ms": round(ms, 2)}), flush=True)
    finally:
        ptm.trace = real_trace

    # 4. SVGF reproject alone (moving camera)
    from tpuray.denoise.reproject import reproject
    key = jax.random.PRNGKey(0)
    ks = jax.random.split(key, 16)
    img3 = lambda k: jax.random.uniform(k, (h, w, 3))
    img1 = lambda k: jax.random.uniform(k, (h, w))
    color, emission, albedo = img3(ks[0]), img3(ks[1]) * 0.1, img3(ks[2]) + 0.2
    motion = (jax.random.uniform(ks[3], (h, w, 2)) - 0.5) * 0.02
    normal = img3(ks[4]) * 2 - 1
    normal = normal / jnp.linalg.norm(normal, axis=-1, keepdims=True)
    lz = img1(ks[5]) * 0.9
    fwn, fwz = img1(ks[6]) * 0.1, img1(ks[7]) * 0.01
    p_il, p_var = img3(ks[8]), img1(ks[9])
    p_n = img3(ks[10]) * 2 - 1
    p_n = p_n / jnp.linalg.norm(p_n, axis=-1, keepdims=True)
    p_lz = img1(ks[11]) * 0.9
    p_mom = jax.random.uniform(ks[12], (h, w, 2))
    p_hist = jnp.ones((h, w)) * 8

    f_rp = jax.jit(lambda c: reproject(
        c, emission, albedo, motion, normal, lz, fwn, fwz,
        p_il, p_var, p_n, p_lz, p_mom, p_hist, cfg))
    ms = timed(lambda: f_rp(color)) * 1e3
    print(json.dumps({"stage": "reproject_moving", "ms": round(ms, 2)}), flush=True)


if __name__ == "__main__":
    main()
