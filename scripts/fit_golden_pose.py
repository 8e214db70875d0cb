"""Recover the camera pose behind the reference's golden screenshots.

The result/*.png captures were taken after the user orbited/dollied the
camera (the clock is larger and off-center vs the startup pose), so
pixel-framing comparisons need the pose. Geometry IS shipped (clock.obj), so
we can fit it: render the primary-hit silhouette for candidate
(yaw, pitch, radius) poses with the trace kernel, and maximize gradient NCC
against the screenshot's viewport luminance edges (coarse-to-fine grid, with
a small translation search standing in for pan).

Usage: PYTHONPATH=/root/repo:/root/.axon_site python scripts/fit_golden_pose.py
Prints the best pose as JSON (pass to scripts/compare_golden.py --yaw/...).
"""
from __future__ import annotations

import itertools
import json
import sys

import numpy as np

from tpuray.utils.platform import enable_compile_cache

enable_compile_cache()

import jax
import jax.numpy as jnp

GOLD = "/root/reference/result/accumulate_output.png"
RES = 200          # fit resolution (golden viewport 800 -> /4)
VIEWPORT_DY = 45   # title-bar offset found by compare_golden.py
ROI_FRAC = 0.55    # below this the screenshot is imgui-overlaid


def downsample(img: np.ndarray, k: int) -> np.ndarray:
    h, w = img.shape[0] // k * k, img.shape[1] // k * k
    return img[:h, :w].reshape(h // k, k, w // k, k).mean((1, 3))


def main() -> int:
    from tpuray.io.image import read_png
    from tpuray.kernels import trace_pallas as tp
    from tpuray.scene.builder import reference_default_scene
    from tpuray.scene.camera import OrbitCamera
    from tpuray.utils.imgcmp import grad_mag, luminance, ncc

    scene = reference_default_scene()
    meta, aabb, tverts = jax.device_put(
        tp.pack_scene(scene.bvh, scene.triangles))

    gold = read_png(GOLD)
    lg = luminance(gold)[VIEWPORT_DY:VIEWPORT_DY + 800, :800]
    gold_small = downsample(lg, 800 // RES)
    gold_grad = grad_mag(gold_small)
    roi = int(RES * ROI_FRAC)

    cam_proto = OrbitCamera(width=RES, height=RES)

    @jax.jit
    def silhouette(eye, cam_to_world, tan_half_fov):
        ys, xs = jnp.meshgrid(
            (jnp.arange(RES) + 0.5) / RES * 2.0 - 1.0,
            (jnp.arange(RES) + 0.5) / RES * 2.0 - 1.0, indexing="ij")
        d_cam = jnp.stack([xs * tan_half_fov, -ys * tan_half_fov,
                           -jnp.ones_like(xs)], axis=-1).reshape(-1, 3)
        d = d_cam @ cam_to_world.T
        d = d / jnp.linalg.norm(d, axis=-1, keepdims=True)
        n = d.shape[0]
        o = jnp.broadcast_to(eye, (n, 3))
        t, idx = tp.trace_packets(meta, aabb, tverts, o, d,
                                  jnp.full((n,), tp.INF), common_origin=True)
        return (idx >= 0).reshape(RES, RES).astype(jnp.float32)

    def score(yaw, pitch, radius) -> float:
        cam_proto.yaw_deg, cam_proto.pitch_deg, cam_proto.radius = yaw, pitch, radius
        c = cam_proto.snapshot()
        mask = np.asarray(silhouette(c.eye, c.cam_to_world, c.tan_half_fov))
        gm = grad_mag(mask)[:roi]
        # translation search (stands in for the reference's WASD pan)
        best = -1.0
        for dy in range(-12, 13, 3):
            for dx in range(-12, 13, 3):
                y0, x0 = max(dy, 0), max(dx, 0)
                y1, x1 = roi + min(dy, 0), RES + min(dx, 0)
                a = gm[y0 - dy:y1 - dy, x0 - dx:x1 - dx]
                b = gold_grad[y0:y1, x0:x1]
                best = max(best, ncc(a, b))
        return best

    # coarse grid
    grid = list(itertools.product(
        np.arange(-40, 41, 10.0),       # yaw
        np.arange(0, 41, 10.0),         # pitch
        np.arange(1.0, 2.21, 0.3)))     # radius
    results = [(score(y, p, r), y, p, r) for y, p, r in grid]
    results.sort(reverse=True)
    print(f"coarse best: {results[0]}", file=sys.stderr)

    # refine around the top candidates
    best = results[0]
    for _ in range(2):
        s0, y0, p0, r0 = best
        cand = itertools.product(
            np.arange(y0 - 6, y0 + 6.1, 2.0),
            np.arange(max(p0 - 6, -89), p0 + 6.1, 2.0),
            np.arange(max(r0 - 0.2, 0.3), r0 + 0.21, 0.1))
        for y, p, r in cand:
            s = score(y, p, r)
            if s > best[0]:
                best = (s, y, p, r)
        print(f"refined best: {best}", file=sys.stderr)

    s, y, p, r = best
    print(json.dumps({"ncc": round(float(s), 4), "yaw": float(y),
                      "pitch": float(p), "radius": round(float(r), 3)}))
    return 0


if __name__ == "__main__":
    raise SystemExit(main())
