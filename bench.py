"""Benchmark: headline + auxiliary metrics on the flagship scene.

stdout: ONE JSON line {"metric", "value", "unit", "vs_baseline"} — the
headline BVH-traversal throughput (BASELINE.md: >=100M rays/s/chip).
stderr: additional JSON lines for the other BASELINE.md metrics (full-frame
ms, SVGF chain ms @1080p, incoherent rays/s, gradient check), each guarded
by a wall-clock budget so a cold compile cache can never starve the
headline (round-2 lesson: eager dispatch on the axon backend cost 472 s
before the kernel ever ran — everything here is host numpy or jitted).

Env: BENCH_BUDGET_S (default 780; the round-3 driver completed an 831s
run, so this is safe) caps total runtime; BENCH_FULL=1 (or --full) ignores
the budget and runs every metric. The shared TPU pool's throughput drifts
by tens of percent between runs, so per-metric costs are kept small and
the evidence-critical metrics run first.
"""
from __future__ import annotations

import json
import os
import sys
import time

T0 = time.perf_counter()
BUDGET_S = float(os.environ.get("BENCH_BUDGET_S", "780"))
FULL = "--full" in sys.argv or os.environ.get("BENCH_FULL") == "1"


def elapsed() -> float:
    return time.perf_counter() - T0


def have_time(estimate_s: float) -> bool:
    return FULL or elapsed() + estimate_s < BUDGET_S


def emit(obj: dict, to_stdout: bool = False) -> None:
    stream = sys.stdout if to_stdout else sys.stderr
    print(json.dumps(obj), file=stream, flush=True)


def timed_stats(fn, sync, iters: int, trials: int = 3) -> dict:
    """Per-iteration seconds across trials: {min, median, max}.

    The shared TPU pool's throughput drifts by tens of percent between
    identical warm runs (observed 238-279 Mrays/s band); emitting the
    spread makes that drift machine-checkable instead of a prose claim —
    a real regression moves min, a slow pool period moves median/max."""
    fn()
    sync()
    ts = []
    for _ in range(trials):
        t0 = time.perf_counter()
        for _ in range(iters):
            fn()
        sync()  # host transfer: axon block_until_ready can return early
        ts.append((time.perf_counter() - t0) / iters)
    ts.sort()
    return {"min": ts[0], "median": ts[len(ts) // 2], "max": ts[-1]}


def timed(fn, sync, iters: int, trials: int = 3) -> float:
    return timed_stats(fn, sync, iters, trials)["min"]


def spread_ms(st: dict) -> dict:
    return {k: round(v * 1e3, 2) for k, v in st.items()}


def main() -> None:
    import jax
    import jax.numpy as jnp
    import numpy as np

    from tpuray.utils.platform import enable_compile_cache
    enable_compile_cache()

    on_cpu = jax.default_backend() == "cpu"

    # flagship scene: the reference's clock model if present, else procedural
    # (host numpy + native C++ BVH build; device transfers only)
    try:
        from tpuray.scene.builder import reference_default_scene
        scene = reference_default_scene()
    except Exception:
        from tpuray.scene.procedural import make_test_scene
        scene = make_test_scene(subdiv=3)

    from tpuray.scene.camera import OrbitCamera
    width = height = 800 if not on_cpu else 128
    cam = OrbitCamera(width=width, height=height).snapshot()

    # -- primary rays in canonical tile-major order, generated in HOST numpy
    # (each eager jnp op is a separate remote dispatch on the axon backend)
    from tpuray.render.tiling import tile_pixel_coords_np
    xx, yy = tile_pixel_coords_np(height, width)
    n_rays = int(xx.shape[0])
    xs = ((2.0 * (xx.astype(np.float32) + 0.5) / width - 1.0)
          * float(cam.tan_half_fov))
    ys = (-(2.0 * (yy.astype(np.float32) + 0.5) / height - 1.0)
          * float(cam.tan_half_fov))
    d_cam = np.stack([xs, ys, -np.ones_like(xs)], axis=-1)
    d_np = d_cam @ np.asarray(cam.cam_to_world, np.float32).T
    d_np /= np.linalg.norm(d_np, axis=-1, keepdims=True)
    o_np = np.broadcast_to(np.asarray(cam.eye, np.float32), (n_rays, 3))

    if on_cpu:
        from tpuray.integrator.path_tracer import trace
        o = jnp.asarray(o_np)
        d = jnp.asarray(d_np)
        fn = lambda: trace(scene.bvh, scene.triangles, o, d)
        state = {}

        def run():
            state["out"] = fn()

        def sync():
            np.asarray(state["out"][0][:1])

        dt = timed(run, sync, iters=3, trials=1)
    else:
        # BASELINE.md's metric is the Pallas BVH megakernel itself: bench it
        # with the scene tables pre-packed (a real renderer packs once).
        # Packing is ONE jitted call (~60 reshuffle ops — eager, they cost
        # minutes of per-op dispatch on this backend; jitted, milliseconds).
        from tpuray.kernels import trace_pallas as tp
        assert not scene.bvh.chunk_nodes, (
            "flagship scene unexpectedly chunked — pack_scene would feed a "
            "forest to the single-tree kernel (see trace_pallas assert)")
        pack = jax.jit(tp.pack_scene)
        meta, aabb, tverts = pack(scene.bvh, scene.triangles)
        o = jax.device_put(jnp.asarray(o_np))
        d = jax.device_put(jnp.asarray(d_np))
        tm = jax.device_put(jnp.full((n_rays,), tp.INF))

        state = {}

        def run():
            # camera primaries share one origin -> scalar-core origin hoist
            state["out"] = tp.trace_packets(meta, aabb, tverts, o, d, tm,
                                            common_origin=True)

        def sync():
            np.asarray(state["out"][0][:1])

        # headline gets extra trials so the best-of reflects the pool's
        # fast period even when a slow period hits mid-bench
        st = timed_stats(run, sync, iters=20, trials=6)
        dt = st["min"]

    rays_per_s = n_rays / dt
    baseline = 100e6  # BASELINE.md target rays/s/chip
    line = {
        "metric": "trace_rays_per_second",
        "value": rays_per_s,
        "unit": "rays/s",
        "vs_baseline": rays_per_s / baseline,
    }
    if not on_cpu:
        line["spread_mrays"] = {"min": round(n_rays / st["max"] / 1e6, 1),
                                "median": round(n_rays / st["median"] / 1e6, 1),
                                "max": round(n_rays / st["min"] / 1e6, 1)}
    emit(line, to_stdout=True)

    if on_cpu:
        return  # aux metrics are TPU measurements

    # ---------------- auxiliary metrics (stderr JSON lines) ----------------
    # Ordered by (importance, cost): the incoherent metric runs
    # UNCONDITIONALLY right after the headline — it reuses the already-
    # compiled packet kernel and costs seconds, so a cold compile cache can
    # never starve it (round-3 lesson: BENCH_r03 shipped one metric because
    # every have_time() gate failed after an 831 s cold start).
    import jax

    # incoherent-ray throughput: directions from a hashed pseudo-random
    # stream, origins scattered on the primary hit points (the secondary-ray
    # regime that dominates frame time — docs/perf.md)
    try:
        from tpuray.kernels import trace_pallas as tp

        @jax.jit
        def incoherent_inputs(o, d, t):
            p = o + d * jnp.minimum(t, 10.0)[..., None]
            i = jnp.arange(n_rays, dtype=jnp.uint32)
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

        t_prim = state["out"][0]
        p_inc, d_inc = incoherent_inputs(o, d, t_prim)

        from tpuray.integrator.path_tracer import BATCH_K_INCOHERENT

        def run_inc():
            # the integrator's secondary-ray policy: batched-K expansion
            # (path_tracer.trace; docs/perf.md)
            state["inc"] = tp.trace_packets(meta, aabb, tverts,
                                            p_inc, d_inc, tm,
                                            batch_k=BATCH_K_INCOHERENT)

        def sync_inc():
            np.asarray(state["inc"][0][:1])

        st_inc = timed_stats(run_inc, sync_inc, iters=8, trials=3)
        dt_inc = st_inc["min"]
        emit({"metric": "trace_incoherent_rays_per_second",
              "value": n_rays / dt_inc, "unit": "rays/s",
              "spread_mrays": {
                  "min": round(n_rays / st_inc["max"] / 1e6, 1),
                  "median": round(n_rays / st_inc["median"] / 1e6, 1),
                  "max": round(n_rays / st_inc["min"] / 1e6, 1)},
              "vs_baseline": (n_rays / dt_inc) / baseline})
    except Exception as e:  # aux metrics must never kill the headline
        emit({"metric": "trace_incoherent_rays_per_second",
              "error": repr(e)[:200]})

    # full-frame latency (PT + SVGF + TAA) at the reference's 800x800,
    # moving camera (worst case)
    if have_time(150):
        try:
            from tpuray import Renderer, RenderConfig
            from tpuray.scene.camera import OrbitCamera as OC
            cfg = RenderConfig(width=width, height=height)
            r = Renderer(scene, cfg)
            ocam = OC(width=width, height=height)
            fstate = {}

            def frame_moving():
                ocam.rotate(0.05, 0.0)
                fstate["out"] = r.step(ocam.snapshot())

            def sync_f():
                np.asarray(fstate["out"].final[:1, :1])

            st_f = timed_stats(frame_moving, sync_f, iters=8, trials=3)
            dt_f = st_f["min"]
            emit({"metric": f"frame_ms_moving_{width}px",
                  "value": round(dt_f * 1e3, 2), "unit": "ms/frame",
                  "spread_ms": spread_ms(st_f),
                  "fps": round(1.0 / dt_f, 1),
                  "vs_baseline": (1.0 / dt_f) / 15.0})  # 15 fps target
        except Exception as e:
            emit({"metric": f"frame_ms_moving_{width}px", "error": repr(e)[:200]})

    # SVGF denoise chain @1080p, moving camera (BASELINE.md metric)
    if have_time(90):
        try:
            from tpuray.denoise.svgf import svgf_pipeline
            from tpuray.integrator.gbuffer import GBuffer
            from tpuray.render.frame_state import FrameState
            from tpuray.scene.config import RenderConfig
            h, w = 1080, 1920
            cfg = RenderConfig(width=w, height=h)

            @jax.jit
            def svgf_inputs(key):
                ks = jax.random.split(key, 12)
                img3 = lambda k: jax.random.uniform(k, (h, w, 3))
                img1 = lambda k: jax.random.uniform(k, (h, w))
                nrm = img3(ks[0]) * 2 - 1
                nrm = nrm / jnp.linalg.norm(nrm, axis=-1, keepdims=True)
                gbuf = GBuffer(
                    normal=nrm, linear_z=img1(ks[3]) * 0.9,
                    velocity=(img3(ks[4])[..., :2] - 0.5) * 0.01,
                    fwidth_normal=img1(ks[5]) * 0.1,
                    fwidth_z=img1(ks[6]) * 0.01,
                    world_pos=img3(ks[1]) * 4 - 2)
                st = FrameState.initial(h, w).replace(
                    illum_hist=img3(ks[7]), variance_hist=img1(ks[8]) * 0.1,
                    prev_normal=nrm, prev_linear_z=gbuf.linear_z,
                    moments=jax.random.uniform(ks[9], (h, w, 2)),
                    history_len=jnp.full((h, w), 8.0),
                    frame_idx=jnp.int32(8))
                return (gbuf, st, img3(ks[10]), img3(ks[11]) * 0.05,
                        img3(ks[0]) + 0.2)

            gbuf, st, color, emi, alb = svgf_inputs(jax.random.PRNGKey(0))
            f = jax.jit(lambda c: svgf_pipeline(c, emi, alb, gbuf, st, cfg,
                                                static_camera=False).taa)
            sstate = {}

            def run_s():
                sstate["out"] = f(color)

            def sync_s():
                np.asarray(sstate["out"][:1, :1])

            st_s = timed_stats(run_s, sync_s, iters=5, trials=3)
            dt_s = st_s["min"]
            emit({"metric": "svgf_chain_ms_moving_1080p",
                  "value": round(dt_s * 1e3, 2), "unit": "ms",
                  "spread_ms": spread_ms(st_s)})
        except Exception as e:
            emit({"metric": "svgf_chain_ms_moving_1080p", "error": repr(e)[:200]})

    # gradient fidelity: AD vs central FD across parameter classes
    # (BASELINE "gradient allclose"; round-3 verdict asked for more than the
    # base-color-only check). FD equals AD only for parameters that leave
    # the SAMPLED directions (and hence hit/visibility topology) fixed:
    #   1. base-color scale (depth 2) — radiometric-linear, sampling-free.
    #   2. specular scale (depth 2) — enters BRDF evaluation (Cspec0) but
    #      none of the lobe samplers, so topology is exactly fixed too.
    #   3. light radiance scale (depth 2) — radiometric-linear.
    #   4. light position (depth 2) — the interior derivative (falloff +
    #      direction change) is what AD computes; central FD additionally
    #      measures the HARD-SHADOW boundary flux (point lights), which a
    #      non-edge-sampling differentiable renderer excludes by
    #      construction. The check therefore asserts same sign and same
    #      order of magnitude, not tight agreement. (Roughness couples to
    #      the samplers — even at depth 1 the ndotl>0 hemisphere boundary
    #      makes FD invalid — so roughness gets the AD-only sanity check
    #      below instead; measured on v5e: FD-vs-AD rel err 0.63 from
    #      exactly that boundary term.)
    if have_time(90):
        try:
            from tpuray.render.renderer import render_frame
            from tpuray.render.frame_state import FrameState
            from tpuray.scene.config import RenderConfig
            gh = gw = 128
            # enable_svgf=False: the BASELINE gradient metric is d(image)/
            # d(materials) of the *path-traced* frame; with SVGF on, jvp
            # tracing would also enter the forward-only denoise Pallas
            # kernels (no JVP rule)
            gcam = OrbitCamera(width=gw, height=gh).snapshot()
            st0 = FrameState.initial(gh, gw)

            def run_check(name, loss_of, x0, eps, tol, order_only=False):
                gfn = jax.jit(jax.grad(loss_of))
                lfn = jax.jit(loss_of)
                g = float(gfn(jnp.float32(x0)))
                fd = (float(lfn(jnp.float32(x0 + eps)))
                      - float(lfn(jnp.float32(x0 - eps)))) / (2 * eps)
                rel = abs(g - fd) / max(abs(fd), 1e-8)
                if order_only:
                    ratio = g / fd if abs(fd) > 1e-10 else float("inf")
                    ok = bool(np.isfinite(g) and 0.3 < ratio < 3.0)
                else:
                    ok = bool(rel < tol)
                line = {"metric": f"gradcheck_{name}_rel_err", "value": rel,
                        "unit": "relative", "grad": g, "fd": fd, "pass": ok}
                if order_only:
                    # loose-by-construction semantics, machine-readable:
                    # FD measures hard-shadow boundary flux a non-edge-
                    # sampling renderer excludes; only sign + order of
                    # magnitude are asserted
                    line["mode"] = "order_only"
                emit(line)
                return rel

            cfg2 = RenderConfig(width=gw, height=gh, max_tracing_depth=2,
                                enable_svgf=False)

            def loss_base(s):
                mats = scene.materials.replace(
                    base_color=jnp.abs(scene.materials.base_color) * s)
                _, out = render_frame(scene.replace(materials=mats), gcam,
                                      st0, cfg2, gh, gw)
                return jnp.mean(out.pt_color)

            def loss_spec(s):
                # drive specular directly (flagship materials ship it as 0,
                # so scaling the existing value would be a vacuous check)
                mats = scene.materials.replace(
                    specular=jnp.full_like(scene.materials.specular, 0.5) * s)
                _, out = render_frame(scene.replace(materials=mats), gcam,
                                      st0, cfg2, gh, gw)
                return jnp.mean(out.pt_color)

            def loss_sheen(s):
                # sheen scale is radiometric-linear like specular: enters
                # BRDF evaluation (fsheen term) but none of the lobe
                # samplers, so hit/visibility topology is exactly fixed and
                # FD is valid (round-4 verdict: one more FD class)
                mats = scene.materials.replace(
                    sheen=jnp.full_like(scene.materials.sheen, 0.5) * s)
                _, out = render_frame(scene.replace(materials=mats), gcam,
                                      st0, cfg2, gh, gw)
                return jnp.mean(out.pt_color)

            def loss_lrad(s):
                lights = scene.lights.replace(
                    radiance=scene.lights.radiance * s)
                _, out = render_frame(scene.replace(lights=lights), gcam,
                                      st0, cfg2, gh, gw)
                return jnp.mean(out.pt_color)

            def loss_light(dx):
                lp = scene.lights.position
                lights = scene.lights.replace(
                    position=lp + jnp.stack(
                        [jnp.full(lp.shape[:1], dx),
                         jnp.zeros(lp.shape[:1]),
                         jnp.zeros(lp.shape[:1])], axis=-1))
                _, out = render_frame(scene.replace(lights=lights), gcam,
                                      st0, cfg2, gh, gw)
                return jnp.mean(out.pt_color)

            run_check("base_color", loss_base, 0.8, 1e-2, 0.05)
            run_check("specular", loss_spec, 0.9, 1e-2, 0.05)
            run_check("sheen", loss_sheen, 0.9, 1e-2, 0.05)
            if scene.lights.count > 0:
                run_check("light_radiance", loss_lrad, 0.9, 1e-2, 0.05)
                run_check("light_pos_interior", loss_light, 0.0, 5e-3, 0.0,
                          order_only=True)

            # AD-only sanity at depth 2: roughness gradients must stay
            # finite and nonzero through the full bounce loop (ADVICE r3 —
            # keeps the geometry-dependent gradient path covered even
            # though FD cannot measure it there)
            def loss_rough_d2(s):
                mats = scene.materials.replace(
                    roughness=jnp.clip(jnp.abs(scene.materials.roughness) * s,
                                       0.05, 1.0))
                _, out = render_frame(scene.replace(materials=mats), gcam,
                                      st0, cfg2, gh, gw)
                return jnp.mean(out.pt_color)

            g2 = float(jax.jit(jax.grad(loss_rough_d2))(jnp.float32(0.9)))
            emit({"metric": "gradcheck_roughness_d2_ad_sanity", "value": g2,
                  "unit": "dloss/dscale",
                  "pass": bool(np.isfinite(g2) and abs(g2) > 1e-10)})
        except Exception as e:
            emit({"metric": "gradcheck_rel_err", "error": repr(e)[:200]})

    # beyond-SMEM scenes on the chunk-streaming kernel (131k tris / 16
    # chunks and 524k tris / 64 chunks at 8k-tri chunks): the single-tree
    # packet kernel cannot run these sizes at all and the XLA wavefront
    # needs minutes (scripts/exp_chunked.py)
    for label, subdiv, est_s in (("131k", 4, 120), ("524k", 5, 240)):
        if not have_time(est_s):
            continue
        try:
            from tpuray.scene.procedural import make_large_scene
            from tpuray.kernels import trace_chunked as tc
            big = make_large_scene(n_spheres=25, subdiv=subdiv, env_width=64)
            bmeta, baabb, btv = jax.jit(tc.pack_forest)(
                big.bvh, big.triangles)

            def run_big():
                state["big"] = tc.trace_packed_forest(
                    bmeta, baabb, btv, o, d, tm,
                    big.bvh.chunk_nodes, big.bvh.chunk_tris,
                    common_origin=True)

            def sync_big():
                np.asarray(state["big"][0][:1])

            # iters=8: the chunk loop is 16-64 sequential dispatches, so
            # short runs under-amortize tunnel dispatch (14.97 vs 10.2 ms
            # measured at iters 3 vs 8)
            st_big = timed_stats(run_big, sync_big, iters=8, trials=3)
            dt_big = st_big["min"]
            emit({"metric": f"trace_chunked_{label}_rays_per_second",
                  "value": n_rays / dt_big, "unit": "rays/s",
                  "tris": int(big.triangles.count),
                  "chunks": int(big.bvh.n_chunks),
                  "spread_mrays": {
                      "min": round(n_rays / st_big["max"] / 1e6, 1),
                      "median": round(n_rays / st_big["median"] / 1e6, 1),
                      "max": round(n_rays / st_big["min"] / 1e6, 1)},
                  "vs_baseline": (n_rays / dt_big) / baseline})
            del big, bmeta, baabb, btv
        except Exception as e:
            emit({"metric": f"trace_chunked_{label}_rays_per_second",
                  "error": repr(e)[:200]})

    emit({"metric": "bench_total_s", "value": round(elapsed(), 1), "unit": "s"})


if __name__ == "__main__":
    main()
