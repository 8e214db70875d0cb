"""End-to-end frame benchmark on the real TPU chip.

Measures the full pipeline (path trace + SVGF + TAA) at the reference's
800x800 (Utils/camera.h:5-6) plus stage-level numbers, for the moving- and
static-camera paths. Writes JSON lines to stdout.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/bench_frame.py [size]
"""
import json
import sys
import time

import numpy as np

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()


def timed(fn, sync, iters=10, trials=3):
    fn()
    sync()
    best = float("inf")
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()
        best = min(best, (time.perf_counter() - t0) / iters)
    return best


def main():
    size = int(sys.argv[1]) if len(sys.argv) > 1 else 800
    compact = float(sys.argv[2]) if len(sys.argv) > 2 else None

    from tpuray import Renderer, RenderConfig
    from tpuray.scene.builder import reference_default_scene
    from tpuray.scene.camera import OrbitCamera

    scene = reference_default_scene()
    cfg = RenderConfig(width=size, height=size)
    if compact is not None:
        # explicit budget: pin it (auto-tuning would override per frame)
        cfg = cfg.replace(compact_frac=compact, compact_auto=False)
    cam = OrbitCamera(width=size, height=size)
    r = Renderer(scene, cfg)

    # -- moving camera: rotate a hair each frame (worst case: full reproject)
    state = {"angle": 0.0}

    def frame_moving():
        cam.rotate(0.05, 0.0)
        state["out"] = r.step(cam.snapshot())

    def sync():
        np.asarray(state["out"].final[:1, :1])

    t_moving = timed(frame_moving, sync)

    # -- static camera (accumulation path)
    def frame_static():
        state["out"] = r.step(cam.snapshot())

    t_static = timed(frame_static, sync)

    rays = size * size * cfg.max_tracing_depth * 3  # trace+env shadow+pt shadow
    for name, t in (("moving", t_moving), ("static", t_static)):
        print(json.dumps({
            "metric": f"frame_ms_{name}_{size}px",
            "value": round(t * 1e3, 3),
            "unit": "ms/frame",
            "fps": round(1.0 / t, 1),
            "mrays_per_s": round(rays / t / 1e6, 1),
        }))


if __name__ == "__main__":
    main()
