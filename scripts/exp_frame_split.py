"""Quick frame split: full frame vs no-SVGF vs no-TAA at one size.

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/exp_frame_split.py [size]
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

    from tpuray import Renderer, RenderConfig
    from tpuray.scene.builder import reference_default_scene
    from tpuray.scene.camera import OrbitCamera

    scene = reference_default_scene()

    for label, over in (
        ("full", {}),
        ("no_svgf", {"enable_svgf": False}),
        ("no_taa", {"enable_taa": False}),
        ("depth1", {"max_tracing_depth": 1}),
    ):
        cfg = RenderConfig(width=size, height=size, **over)
        cam = OrbitCamera(width=size, height=size)
        r = Renderer(scene, cfg)
        state = {}

        def frame():
            cam.rotate(0.05, 0.0)
            state["out"] = r.step(cam.snapshot())

        def sync():
            np.asarray(state["out"].final[:1, :1])

        t = timed(frame, sync)
        print(json.dumps({"stage": label, "ms": round(t * 1e3, 2)}),
              flush=True)


if __name__ == "__main__":
    main()
