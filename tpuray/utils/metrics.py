"""Per-frame metrics/observability.

The reference shows only an imgui ms/frame readout (main.cpp:428); here we
keep structured per-frame metrics (ms, FPS, rays/s) and expose jax.profiler
hooks for kernel-level traces.
"""
from __future__ import annotations

import contextlib
import json
import statistics
import time


class FrameMetrics:
    def __init__(self, width: int, height: int, depth: int):
        self.width = width
        self.height = height
        # traversals per pixel: depth x (nearest + env shadow + point shadow)
        self.rays_per_frame = width * height * depth * 3
        self.times: list[float] = []

    def record(self, seconds: float) -> None:
        self.times.append(seconds)

    def summary(self) -> str:
        if not self.times:
            return "{}"
        steady = self.times[1:] or self.times  # drop compile frame
        ms = statistics.median(steady) * 1e3
        return json.dumps({
            "frames": len(self.times),
            "first_frame_ms": round(self.times[0] * 1e3, 2),
            "median_ms": round(ms, 2),
            "fps": round(1e3 / ms, 2),
            "mrays_per_s": round(self.rays_per_frame / ms / 1e3, 1),
        })


@contextlib.contextmanager
def profile_trace(log_dir: str):
    """jax.profiler trace around a block (view in TensorBoard/XProf)."""
    import jax
    jax.profiler.start_trace(log_dir)
    try:
        yield
    finally:
        jax.profiler.stop_trace()


class StageTimer:
    """Wall-clock stage timing with blocking, for coarse per-stage numbers."""

    def __init__(self):
        self.stages: dict[str, float] = {}

    @contextlib.contextmanager
    def time(self, name: str, result=None):
        import jax
        t0 = time.perf_counter()
        yield
        if result is not None:
            jax.block_until_ready(result)
        self.stages[name] = self.stages.get(name, 0.0) + time.perf_counter() - t0

    def summary(self) -> str:
        return json.dumps({k: round(v * 1e3, 2) for k, v in self.stages.items()})
