"""Benchmark: BVH traversal throughput (rays/s) on the flagship scene.

Prints ONE JSON line: {"metric", "value", "unit", "vs_baseline"}.
Baseline (BASELINE.md): >=100M rays/s/chip on the 1spp trace kernel.
Uses the Pallas packet-traversal kernel on TPU, the XLA wavefront on CPU.
"""
from __future__ import annotations

import json
import time


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuray.utils.platform import enable_compile_cache
    enable_compile_cache()

    from tpuray.integrator.path_tracer import trace
    from tpuray.scene.camera import OrbitCamera

    on_cpu = jax.default_backend() == "cpu"

    # flagship scene: the reference's clock model if present, else procedural
    try:
        from tpuray.scene.builder import reference_default_scene
        scene = reference_default_scene()
    except Exception:
        from tpuray.scene.procedural import make_test_scene
        scene = make_test_scene(subdiv=3)

    # reference render resolution (Utils/camera.h:5-6); smaller on CPU
    width = height = 800 if not on_cpu else 128
    cam = OrbitCamera(width=width, height=height).snapshot()

    # canonical tile-major ray order (each traversal packet = a screen tile)
    from tpuray.render.tiling import tile_pixel_coords
    xx, yy = tile_pixel_coords(height, width)
    n_rays = int(xx.shape[0])
    xs = (2.0 * (xx.astype(jnp.float32) + 0.5) / width - 1.0) * cam.tan_half_fov
    ys = -(2.0 * (yy.astype(jnp.float32) + 0.5) / height - 1.0) * cam.tan_half_fov
    d_cam = jnp.stack([xs, ys, -jnp.ones_like(xs)], axis=-1)
    d = jnp.einsum("ij,nj->ni", cam.cam_to_world, d_cam)
    d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
    o = jnp.broadcast_to(cam.eye, (n_rays, 3))

    if on_cpu:
        fn = lambda o, d: trace(scene.bvh, scene.triangles, o, d)
    else:
        # BASELINE.md's metric is the Pallas BVH megakernel itself: bench it
        # with the scene tables pre-packed (a real renderer packs once)
        from tpuray.kernels import trace_pallas as tp
        meta, aabb, tverts = jax.device_put(
            tp.pack_scene(scene.bvh, scene.triangles))
        tm = jnp.full((n_rays,), tp.INF)
        # camera primaries share one origin -> scalar-core origin hoist
        fn = jax.jit(lambda o, d: tp.trace_packets(
            meta, aabb, tverts, o, d, tm, common_origin=True))

    t, idx = fn(o, d)
    _ = np.asarray(t[:1])  # compile + warmup (host transfer: the axon
    # backend's block_until_ready can return before execution finishes)

    iters = 20 if not on_cpu else 3
    best = float("inf")
    for _trial in range(3 if not on_cpu else 1):
        t0 = time.perf_counter()
        for _ in range(iters):
            t, idx = fn(o, d)
        _ = np.asarray(t[:1])  # device queue is serialized: forces all iters
        best = min(best, (time.perf_counter() - t0) / iters)
    dt = best

    rays_per_s = n_rays / dt
    baseline = 100e6  # BASELINE.md target rays/s/chip
    print(json.dumps({
        "metric": "trace_rays_per_second",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / baseline,
    }))


if __name__ == "__main__":
    main()
