"""Forest-partitioned BVH (scene/partition.py): structure + traversal parity."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuray.accel.bvh import build_bvh
from tpuray.integrator.intersect import trace as trace_xla
from tpuray.scene.partition import build_forest_bvh, partition_triangles
from tpuray.scene.procedural import icosphere, ground_quad
from tpuray.scene.types import BVHSoA, TriangleSoA


def _geometry():
    tris = np.concatenate([
        icosphere(3),                                # 1280 tris
        icosphere(2, radius=0.3, center=(1.2, 0.4, -0.6)),
        ground_quad(),
    ]).astype(np.float32)
    return tris


def _soa(tris):
    z2 = np.zeros((len(tris), 2), np.float32)
    zi = np.zeros((len(tris),), np.int32)
    n = np.tile(np.asarray([0, 1, 0], np.float32), (len(tris), 1))
    return TriangleSoA(
        p0=jnp.asarray(tris[:, 0]), p1=jnp.asarray(tris[:, 1]),
        p2=jnp.asarray(tris[:, 2]),
        n0=jnp.asarray(n), n1=jnp.asarray(n), n2=jnp.asarray(n),
        uv0=jnp.asarray(z2), uv1=jnp.asarray(z2), uv2=jnp.asarray(z2),
        mat_id=jnp.asarray(zi), obj_id=jnp.asarray(zi))


def _bvh_soa(b):
    return BVHSoA(
        aabb_min=jnp.asarray(b["aabb_min"]), aabb_max=jnp.asarray(b["aabb_max"]),
        first_tri=jnp.asarray(b["first_tri"]), tri_count=jnp.asarray(b["tri_count"]),
        skip=jnp.asarray(b["skip"]))


def test_partition_sizes_and_coverage():
    tris = _geometry()
    parts = partition_triangles(tris, 200)
    assert all(len(p) <= 200 for p in parts)
    allidx = np.sort(np.concatenate(parts))
    np.testing.assert_array_equal(allidx, np.arange(len(tris)))


def test_forest_structure():
    tris = _geometry()
    f = build_forest_bvh(tris, leaf_size=8, max_chunk_tris=300)
    nb = f["chunk_node_base"]
    tb = f["chunk_tri_base"]
    n_chunks = len(nb) - 1
    assert n_chunks > 1
    assert nb[-1] == len(f["skip"])
    assert tb[-1] == len(tris)
    assert sorted(f["perm"].tolist()) == list(range(len(tris)))
    for c in range(n_chunks):
        # chunk root's skip jumps to the next chunk root (forest invariant)
        assert f["skip"][nb[c]] == nb[c + 1]
        # chunk-local links stay inside the chunk
        sl = f["skip"][nb[c]: nb[c + 1]]
        assert (sl > np.arange(nb[c], nb[c + 1])).all()
        assert (sl <= nb[c + 1]).all()
        ft = f["first_tri"][nb[c]: nb[c + 1]]
        ct = f["tri_count"][nb[c]: nb[c + 1]]
        leaf = ct > 0
        assert (ft[leaf] >= tb[c]).all()
        assert (ft[leaf] + ct[leaf] <= tb[c + 1]).all()


@pytest.mark.parametrize("max_chunk", [300, 10_000_000])
def test_forest_trace_matches_single_tree(max_chunk):
    tris = _geometry()
    single = build_bvh(tris, 8)
    forest = build_forest_bvh(tris, leaf_size=8, max_chunk_tris=max_chunk)

    rng = np.random.default_rng(3)
    n = 2048
    o = (rng.random((n, 3), np.float32) - 0.5) * 4.0
    tgt = (rng.random((n, 3), np.float32) - 0.5) * 1.2
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    tri_s = _soa(tris[single["perm"]])
    tri_f = _soa(tris[forest["perm"]])
    t_s, i_s = trace_xla(_bvh_soa(single), tri_s, jnp.asarray(o), jnp.asarray(d))
    t_f, i_f = trace_xla(_bvh_soa(forest), tri_f, jnp.asarray(o), jnp.asarray(d))

    # same hits in original-triangle space, same distances
    i_s = np.asarray(i_s)
    i_f = np.asarray(i_f)
    hit_s = np.where(i_s >= 0, single["perm"][np.maximum(i_s, 0)], -1)
    hit_f = np.where(i_f >= 0, forest["perm"][np.maximum(i_f, 0)], -1)
    np.testing.assert_array_equal(hit_s, hit_f)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_f), rtol=1e-6)

    # any-hit: agreement on hit/miss (first hit may differ by order)
    _, ia_f = trace_xla(_bvh_soa(forest), tri_f, jnp.asarray(o), jnp.asarray(d),
                        any_hit=True)
    np.testing.assert_array_equal(np.asarray(ia_f) >= 0, hit_s >= 0)


def test_uniform_forest_trace_matches_single_tree():
    from tpuray.scene.partition import apply_perm_padded, build_forest_bvh_uniform
    tris = _geometry()
    single = build_bvh(tris, 8)
    f = build_forest_bvh_uniform(tris, leaf_size=8, max_chunk_tris=300)
    cn, ct = f["chunk_nodes"], f["chunk_tris"]
    n_chunks = len(f["chunk_node_base"]) - 1
    assert n_chunks > 1
    assert len(f["skip"]) == n_chunks * cn
    assert len(f["perm"]) == n_chunks * ct

    tris_p = apply_perm_padded(tris, f["perm"])
    assert (tris_p[f["perm"] < 0] == 0).all()

    rng = np.random.default_rng(5)
    n = 2048
    o = (rng.random((n, 3), np.float32) - 0.5) * 4.0
    tgt = (rng.random((n, 3), np.float32) - 0.5) * 1.2
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)

    tri_s = _soa(tris[single["perm"]])
    tri_f = _soa(tris_p)
    bvh_f = BVHSoA(
        aabb_min=jnp.asarray(f["aabb_min"]), aabb_max=jnp.asarray(f["aabb_max"]),
        first_tri=jnp.asarray(f["first_tri"]), tri_count=jnp.asarray(f["tri_count"]),
        skip=jnp.asarray(f["skip"]), chunk_nodes=cn, chunk_tris=ct)
    assert bvh_f.n_chunks == n_chunks
    t_s, i_s = trace_xla(_bvh_soa(single), tri_s, jnp.asarray(o), jnp.asarray(d))
    t_f, i_f = trace_xla(bvh_f, tri_f, jnp.asarray(o), jnp.asarray(d))

    i_s = np.asarray(i_s)
    i_f = np.asarray(i_f)
    hit_s = np.where(i_s >= 0, single["perm"][np.maximum(i_s, 0)], -1)
    hit_f = np.where(i_f >= 0, f["perm"][np.maximum(i_f, 0)], -1)
    np.testing.assert_array_equal(hit_s, hit_f)
    np.testing.assert_allclose(np.asarray(t_s), np.asarray(t_f), rtol=1e-6)


def test_make_large_scene_renders():
    """End-to-end: the chunked procedural scene renders a small frame with
    the XLA wavefront (CPU) and the sphere field is visible."""
    from tpuray.scene.procedural import make_large_scene
    from tpuray.render.frame_state import FrameState
    from tpuray.render.renderer import render_frame
    from tpuray.scene.camera import OrbitCamera
    from tpuray.scene.config import RenderConfig

    scene = make_large_scene(n_spheres=6, subdiv=2, max_chunk_tris=512,
                             env_width=32)
    assert scene.bvh.n_chunks > 1
    h = w = 64
    cfg = RenderConfig(width=w, height=h, max_tracing_depth=2,
                       num_atrous_iterations=2)
    cam = OrbitCamera(width=w, height=h, radius=4.0).snapshot()
    _, out = render_frame(scene, cam, FrameState.initial(h, w), cfg, h, w)
    img = np.asarray(out.pt_color)
    assert np.isfinite(img).all()
    assert img.std() > 1e-3  # not a constant field
    hit_frac = (np.abs(np.asarray(out.gbuffer.world_pos)).sum(-1) > 0).mean()
    assert hit_frac > 0.05  # sphere field visible


def test_trace_chunked_kernel_matches_wavefront():
    """Chunk-streaming Pallas kernel (interpret mode) vs the XLA wavefront
    on a uniform forest."""
    from jax.experimental import pallas as pl
    import importlib
    import tpuray.kernels.trace_chunked as tc

    orig_call = pl.pallas_call

    def interp_call(*a, **k):
        k["interpret"] = True
        return orig_call(*a, **k)

    pl.pallas_call = interp_call
    importlib.reload(tc)
    try:
        from tpuray.scene.procedural import make_large_scene
        scene = make_large_scene(n_spheres=6, subdiv=2, max_chunk_tris=512,
                                 env_width=32)
        assert scene.bvh.n_chunks > 1

        rng = np.random.default_rng(9)
        n = 1500  # exercises padding (not a packet multiple)
        o = (rng.random((n, 3), np.float32) - 0.5) * 5.0
        tgt = (rng.random((n, 3), np.float32) - 0.5) * 2.0
        d = tgt - o
        d /= np.linalg.norm(d, axis=-1, keepdims=True)
        o_j, d_j = jnp.asarray(o), jnp.asarray(d)

        t_x, i_x = trace_xla(scene.bvh, scene.triangles, o_j, d_j)
        t_c, i_c = tc.trace_chunked(scene.bvh, scene.triangles, o_j, d_j)
        np.testing.assert_array_equal(np.asarray(i_x), np.asarray(i_c))
        np.testing.assert_allclose(np.asarray(t_x), np.asarray(t_c), rtol=1e-6)

        # dead lanes + any-hit
        tm = jnp.where(jnp.arange(n) % 3 == 0, 0.0, 1e30).astype(jnp.float32)
        t_a, i_a = tc.trace_chunked(scene.bvh, scene.triangles, o_j, d_j,
                                    t_max=tm, any_hit=True)
        dead = np.arange(n) % 3 == 0
        assert (np.asarray(i_a)[dead] == -1).all()
        live_hit = np.asarray(i_x) >= 0
        assert (np.asarray(i_a)[~dead & live_hit] >= 0).all()
        assert (np.asarray(i_a)[~dead & ~live_hit] == -1).all()
    finally:
        pl.pallas_call = orig_call
        importlib.reload(tc)


def test_build_scene_autochunks_big_scenes(tmp_path):
    """build_scene switches to the chunked forest beyond the SMEM budget."""
    from tpuray.scene.builder import ObjectSpec, build_scene

    # a subdivided OBJ big enough to exceed the single-tree SMEM gate
    from tpuray.scene.procedural import icosphere
    tris = icosphere(4)  # 5120 tris -> replicate via three objects = 15360
    path = tmp_path / "blob.obj"
    with open(path, "w") as f:
        for t in tris:
            for v in t:
                f.write(f"v {v[0]} {v[1]} {v[2]}\n")
        for i in range(len(tris)):
            f.write(f"f {3*i+1} {3*i+2} {3*i+3}\n")
    objs = [ObjectSpec(path=str(path), material=dict(base_color=(0.5, 0.5, 0.5)),
                       translate=(dx, 0.0, 0.0))
            for dx in (-2.0, 0.0, 2.0)]
    scene = build_scene(objs, envmap=None, max_chunk_tris=2048)
    assert scene.bvh.chunk_nodes > 0
    assert scene.bvh.n_chunks > 1
    # padded triangle rows are degenerate (all-zero)
    import numpy as np
    from tpuray.integrator.intersect import trace as trace_xla
    import jax.numpy as jnp
    o = np.asarray([[0.0, 0.0, 6.0]], np.float32).repeat(64, 0)
    rng = np.random.default_rng(0)
    tgt = (rng.random((64, 3), np.float32) - 0.5) * 3.0
    d = tgt - o
    d /= np.linalg.norm(d, axis=-1, keepdims=True)
    t, i = trace_xla(scene.bvh, scene.triangles, jnp.asarray(o), jnp.asarray(d))
    assert (np.asarray(i) >= 0).any()


def test_single_tree_kernel_rejects_forest():
    """The single-tree packer must refuse chunked forests outright (handing
    one in scrambles traversal past the first chunk boundary)."""
    from tpuray.kernels.trace_pallas import trace_pallas
    from tpuray.scene.procedural import make_large_scene
    scene = make_large_scene(n_spheres=4, subdiv=1, max_chunk_tris=256,
                             env_width=16)
    assert scene.bvh.chunk_nodes > 0
    o = jnp.zeros((4, 3), jnp.float32)
    d = jnp.tile(jnp.asarray([[0.0, 0.0, -1.0]], jnp.float32), (4, 1))
    with pytest.raises(AssertionError, match="chunked forest"):
        trace_pallas(scene.bvh, scene.triangles, o, d)
