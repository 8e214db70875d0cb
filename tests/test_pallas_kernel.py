"""Pallas packet-traversal kernel vs the XLA wavefront oracle
(interpret mode on CPU)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp
from jax.experimental import pallas as pl

from tpuray.integrator.intersect import trace as trace_xla
from tpuray.scene.procedural import make_test_scene


@pytest.fixture(scope="module")
def interp_trace():
    """trace_pallas with pallas_call forced into interpreter mode."""
    import importlib

    import tpuray.kernels.trace_pallas as tp
    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    pl.pallas_call = interp_call
    importlib.reload(tp)
    yield tp
    pl.pallas_call = orig_call
    importlib.reload(tp)


@pytest.fixture(scope="module")
def scene():
    return make_test_scene(subdiv=2, env_width=32)


def make_rays(rng, n):
    o = np.tile(np.asarray([[0.0, 0.3, 2.0]], np.float32), (n, 1))
    o += (rng.random((n, 3)).astype(np.float32) - 0.5) * 0.4
    tgt = (rng.random((n, 3)).astype(np.float32) - 0.5) * 1.5
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    return jnp.asarray(o), jnp.asarray(d)


def test_matches_xla_nearest(interp_trace, scene, rng):
    o, d = make_rays(rng, 2048)
    t_ref, i_ref = trace_xla(scene.bvh, scene.triangles, o, d)
    t_pk, i_pk = interp_trace.trace_pallas(scene.bvh, scene.triangles, o, d)
    np.testing.assert_array_equal(np.asarray(i_pk), np.asarray(i_ref))
    m = np.asarray(i_ref) >= 0
    np.testing.assert_allclose(np.asarray(t_pk)[m], np.asarray(t_ref)[m], rtol=1e-4)
    assert m.mean() > 0.3


def test_matches_xla_any_hit(interp_trace, scene, rng):
    o, d = make_rays(rng, 1024)
    dist = jnp.full((1024,), 1.5)
    _, ia = interp_trace.trace_pallas(scene.bvh, scene.triangles, o, d,
                                      t_max=dist, any_hit=True)
    _, ib = trace_xla(scene.bvh, scene.triangles, o, d, t_max=dist, any_hit=True)
    np.testing.assert_array_equal(np.asarray(ia) >= 0, np.asarray(ib) >= 0)


def test_nonmultiple_ray_count(interp_trace, scene, rng):
    """Padding path: N not a multiple of the packet size."""
    o, d = make_rays(rng, 777)
    t_ref, i_ref = trace_xla(scene.bvh, scene.triangles, o, d)
    t_pk, i_pk = interp_trace.trace_pallas(scene.bvh, scene.triangles, o, d)
    np.testing.assert_array_equal(np.asarray(i_pk), np.asarray(i_ref))


def test_large_scene_smem_fallback(scene):
    """Scenes beyond the SMEM budget must dispatch to the XLA wavefront."""
    from tpuray.integrator import path_tracer as pt
    from tpuray.kernels.trace_pallas import scene_fits_smem

    assert scene_fits_smem(scene.bvh.count, scene.triangles.count)
    assert not scene_fits_smem(100_000, 200_000)

    o = jnp.asarray(np.tile([[0.0, 0.3, 2.0]], (64, 1)), jnp.float32)
    d = jnp.asarray(np.tile([[0.0, 0.0, -1.0]], (64, 1)), jnp.float32)
    pt.set_trace_backend("pallas")
    try:
        # force the size check to fail by monkeypatching the budget fn
        t_ref, i_ref = trace_xla(scene.bvh, scene.triangles, o, d)
        import tpuray.kernels.trace_pallas as tp
        orig_fits = tp.scene_fits_smem
        tp.scene_fits_smem = lambda n_nodes, n_tris: False
        try:
            t, i = pt.trace(scene.bvh, scene.triangles, o, d)
        finally:
            tp.scene_fits_smem = orig_fits
        np.testing.assert_array_equal(np.asarray(i), np.asarray(i_ref))
    finally:
        pt.set_trace_backend("auto")


def test_dead_lanes_inert(interp_trace, scene, rng):
    """t_max <= 0 marks a lane dead: (INF, -1) out, both backends agree,
    even for origins inside the scene AABB (negative slab t0)."""
    n = 1024
    o, d = make_rays(rng, n)
    o = o.at[: n // 2].set(jnp.zeros(3))  # inside the unit-box scene
    tm = jnp.where(jnp.arange(n) % 3 == 0, 0.0, 1e30).astype(jnp.float32)

    t_x, i_x = trace_xla(scene.bvh, scene.triangles, o, d, t_max=tm)
    t_p, i_p = interp_trace.trace_pallas(scene.bvh, scene.triangles, o, d,
                                         t_max=tm)
    dead = np.arange(n) % 3 == 0
    assert (np.asarray(i_x)[dead] == -1).all()
    assert (np.asarray(i_p)[dead] == -1).all()
    assert (np.asarray(t_x)[dead] >= 1e29).all()
    assert (np.asarray(t_p)[dead] >= 1e29).all()
    # live lanes unchanged vs an unmasked trace
    t_f, i_f = trace_xla(scene.bvh, scene.triangles, o, d)
    live = ~dead
    np.testing.assert_array_equal(np.asarray(i_x)[live], np.asarray(i_f)[live])
    np.testing.assert_array_equal(np.asarray(i_p)[live], np.asarray(i_f)[live])

    # any-hit: dead lanes must not suppress the early exit / stay unhit
    t_a, i_a = interp_trace.trace_pallas(scene.bvh, scene.triangles, o, d,
                                         t_max=tm, any_hit=True)
    assert (np.asarray(i_a)[dead] == -1).all()


def test_grad_through_pallas_trace_is_zero_tangent(interp_trace, scene, rng):
    """jax.grad through a function containing the packet kernel must not
    raise (pallas_call has no JVP rule; trace_packets declares zero
    tangents) and must route gradients around the traversal, matching the
    BASELINE gradient check that differentiates a whole rendered frame."""
    n = 256
    o, d = make_rays(rng, n)

    def f(o_var):
        t, idx = interp_trace.trace_pallas(scene.bvh, scene.triangles,
                                           o_var, d)
        w = jnp.where(idx >= 0, 1.0, 0.0)  # topology: constant wrt o_var
        return jnp.sum(w * o_var[:, 0]), idx

    (val, idx), g = jax.value_and_grad(f, has_aux=True)(o)
    mask = (np.asarray(idx) >= 0).astype(np.float32)
    np.testing.assert_allclose(np.asarray(g)[:, 0], mask)
    np.testing.assert_allclose(np.asarray(g)[:, 1:], 0.0)


def test_batched_k_matches_xla(interp_trace, scene, rng):
    """Batched-K expansion (the incoherent-ray variant, batch_k=8) must be
    decision-equivalent to the strict DFS: same hits as the XLA oracle."""
    o, d = make_rays(rng, 2048)
    t_ref, i_ref = trace_xla(scene.bvh, scene.triangles, o, d)
    t_pk, i_pk = interp_trace.trace_pallas(scene.bvh, scene.triangles, o, d,
                                           batch_k=8)
    np.testing.assert_array_equal(np.asarray(i_pk), np.asarray(i_ref))
    m = np.asarray(i_ref) >= 0
    np.testing.assert_allclose(np.asarray(t_pk)[m], np.asarray(t_ref)[m],
                               rtol=1e-4)


def test_batched_k_any_hit_and_dead_lanes(interp_trace, scene, rng):
    o, d = make_rays(rng, 1024)
    t_ref, i_ref = trace_xla(scene.bvh, scene.triangles, o, d)
    tm = jnp.where(jnp.arange(1024) % 4 == 0, 0.0, 1e30).astype(jnp.float32)
    _, ia = interp_trace.trace_pallas(scene.bvh, scene.triangles, o, d,
                                      t_max=tm, any_hit=True, batch_k=8)
    dead = np.arange(1024) % 4 == 0
    hit = np.asarray(i_ref) >= 0
    assert (np.asarray(ia)[dead] == -1).all()
    assert (np.asarray(ia)[~dead & hit] >= 0).all()
    assert (np.asarray(ia)[~dead & ~hit] == -1).all()


def test_multi_class_fused_matches_separate(interp_trace, scene, rng):
    """Fused 3-class walk (bounce closest-hit + 2 any-hit shadows from
    shared origins) must equal three separate traces class-for-class."""
    n = 2048
    o, d_b = make_rays(rng, n)
    # two more direction sets from the SAME origins (shadow-ray shapes)
    d_e = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d_e = d_e / jnp.linalg.norm(d_e, axis=-1, keepdims=True)
    d_p = jnp.asarray(-np.asarray(d_e) + 0.3)
    d_p = d_p / jnp.linalg.norm(d_p, axis=-1, keepdims=True)
    inf = jnp.full((n,), interp_trace.INF)
    # mixed live/dead lanes per class
    tm_e = jnp.where(jnp.arange(n) % 4 == 0, 0.0, interp_trace.INF)
    tm_p = jnp.full((n,), 1.2)

    meta, aabb, tverts = interp_trace.pack_scene(scene.bvh, scene.triangles)
    fused = interp_trace.trace_multi(
        meta, aabb, tverts, o, [d_b, d_e, d_p], [inf, tm_e, tm_p],
        any_hits=(False, True, True), batch_k=4)

    sep = [
        interp_trace.trace_packets(meta, aabb, tverts, o, d_b, inf),
        interp_trace.trace_packets(meta, aabb, tverts, o, d_e, tm_e,
                                   any_hit=True),
        interp_trace.trace_packets(meta, aabb, tverts, o, d_p, tm_p,
                                   any_hit=True),
    ]
    # closest-hit class: exact t and idx
    np.testing.assert_array_equal(np.asarray(fused[0][1]),
                                  np.asarray(sep[0][1]))
    m = np.asarray(sep[0][1]) >= 0
    np.testing.assert_allclose(np.asarray(fused[0][0])[m],
                               np.asarray(sep[0][0])[m], rtol=1e-5)
    # any-hit classes: hit/miss decisions must agree (the specific triangle
    # may differ: any-hit accepts the first found, which is walk-order
    # dependent)
    for c in (1, 2):
        np.testing.assert_array_equal(np.asarray(fused[c][1]) >= 0,
                                      np.asarray(sep[c][1]) >= 0)
    # dead lanes never hit
    assert (np.asarray(fused[1][1])[np.arange(n) % 4 == 0] == -1).all()


def test_multi_class_two_shadows_early_exit(interp_trace, scene, rng):
    """All-any-hit fusion (the last-bounce env+point pair) with early exit."""
    n = 1024
    o, d1 = make_rays(rng, n)
    d2 = jnp.asarray(rng.standard_normal((n, 3)).astype(np.float32))
    d2 = d2 / jnp.linalg.norm(d2, axis=-1, keepdims=True)
    inf = jnp.full((n,), interp_trace.INF)
    meta, aabb, tverts = interp_trace.pack_scene(scene.bvh, scene.triangles)
    fused = interp_trace.trace_multi(meta, aabb, tverts, o, [d1, d2],
                                     [inf, inf], any_hits=(True, True),
                                     batch_k=4)
    s1 = interp_trace.trace_packets(meta, aabb, tverts, o, d1, inf,
                                    any_hit=True)
    s2 = interp_trace.trace_packets(meta, aabb, tverts, o, d2, inf,
                                    any_hit=True)
    np.testing.assert_array_equal(np.asarray(fused[0][1]) >= 0,
                                  np.asarray(s1[1]) >= 0)
    np.testing.assert_array_equal(np.asarray(fused[1][1]) >= 0,
                                  np.asarray(s2[1]) >= 0)


def test_fused_secondary_matches_separate_integrator(interp_trace, scene,
                                                     rng):
    """trace_paths with the fused per-bounce secondary walk (interpret
    mode) vs the separate-walk XLA path: same radiance per pixel."""
    import tpuray.integrator.path_tracer as pt
    from tpuray.scene.config import RenderConfig

    n = 1024
    o, d = make_rays(rng, n)
    px = jnp.arange(n, dtype=jnp.uint32)
    py = jnp.arange(n, dtype=jnp.uint32) * jnp.uint32(3)
    cfg = RenderConfig(max_tracing_depth=2, compact_frac=0.0)

    ref = pt.trace_paths(scene, o, d, px, py, jnp.uint32(5),
                         cfg.replace(fused_secondary=False))
    pt.set_trace_backend("pallas")
    try:
        fused = pt.trace_paths(scene, o, d, px, py, jnp.uint32(5), cfg)
    finally:
        pt.set_trace_backend("auto")
    np.testing.assert_allclose(np.asarray(fused.color),
                               np.asarray(ref.color), rtol=2e-4, atol=2e-5)
    np.testing.assert_array_equal(np.asarray(fused.first_hit_valid),
                                  np.asarray(ref.first_hit_valid))
    np.testing.assert_allclose(np.asarray(fused.albedo),
                               np.asarray(ref.albedo), rtol=1e-5, atol=1e-7)
