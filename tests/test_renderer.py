"""Frame renderer: accumulation semantics, temporal state, debug views,
checkpoint roundtrip."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from tpuray.render.frame_state import FrameState
from tpuray.render.renderer import Renderer, render_frame, select_debug_view, tonemap
from tpuray.scene.camera import OrbitCamera
from tpuray.scene.config import DebugView, RenderConfig
from tpuray.scene.procedural import make_test_scene

H = W = 32


@pytest.fixture(scope="module")
def scene():
    return make_test_scene(subdiv=1, env_width=32)


@pytest.fixture(scope="module")
def cam():
    return OrbitCamera(width=W, height=H).snapshot()


def test_accumulation_is_running_mean(scene, cam):
    cfg = RenderConfig(width=W, height=H, max_tracing_depth=1,
                       num_atrous_iterations=2, enable_svgf=False)
    r = Renderer(scene, cfg)
    frames = []
    # no-accumulate renders of frames 0..2 (each frame has its own RNG)
    cfg_na = cfg.replace(accumulate=False)
    state = FrameState.initial(H, W)
    for i in range(3):
        state, out = render_frame(scene, cam, state, cfg_na, H, W)
        frames.append(np.asarray(out.pt_color))
    # accumulated render over the same 3 frames
    for i in range(3):
        out_acc = r.step(cam)
    np.testing.assert_allclose(
        np.asarray(out_acc.accum_color), np.mean(frames, axis=0),
        rtol=1e-4, atol=1e-5)


def test_frame_deterministic(scene, cam):
    cfg = RenderConfig(width=W, height=H, max_tracing_depth=2,
                       num_atrous_iterations=2)
    s0 = FrameState.initial(H, W)
    _, a = render_frame(scene, cam, s0, cfg, H, W)
    _, b = render_frame(scene, cam, s0, cfg, H, W)
    np.testing.assert_array_equal(np.asarray(a.final), np.asarray(b.final))


def test_temporal_state_advances(scene, cam):
    cfg = RenderConfig(width=W, height=H, max_tracing_depth=1,
                       num_atrous_iterations=2)
    r = Renderer(scene, cfg)
    for i in range(4):
        out = r.step(cam)
    assert int(r.state.frame_idx) == 4
    hl = np.asarray(out.svgf.history_len)
    hits = np.asarray(out.gbuffer.linear_z) != 1.0
    assert hl[hits].max() == 4.0
    # reset drops accumulation counter
    r.reset()
    assert int(r.state.frame_idx) == 0


def test_debug_views_all_finite(scene, cam):
    cfg = RenderConfig(width=W, height=H, max_tracing_depth=1,
                       num_atrous_iterations=2)
    r = Renderer(scene, cfg)
    r.step(cam)
    for view in DebugView:
        img = select_debug_view(r.last_outputs, view)
        assert np.isfinite(np.asarray(img)).all(), view


def test_tonemap_range():
    x = jnp.asarray(np.random.default_rng(0).random((8, 8, 3)).astype(np.float32) * 20)
    y = np.asarray(tonemap(x))
    assert np.isfinite(y).all() and (y >= 0).all()
    # luminance compression: tonemapped luma below linear luma for bright input
    lum = 0.3 * y[..., 0] + 0.6 * y[..., 1] + 0.1 * y[..., 2]
    assert lum.max() < 3.0


def test_checkpoint_roundtrip(scene, cam, tmp_path):
    from tpuray.utils.checkpoint import load_frame_state, save_frame_state
    cfg = RenderConfig(width=W, height=H, max_tracing_depth=1,
                       num_atrous_iterations=2)
    r = Renderer(scene, cfg)
    r.step(cam)
    r.step(cam)
    path = tmp_path / "state.npz"
    save_frame_state(str(path), r.state)
    restored = load_frame_state(str(path))
    for a, b in zip(jax.tree_util.tree_leaves(r.state),
                    jax.tree_util.tree_leaves(restored)):
        np.testing.assert_array_equal(np.asarray(a), np.asarray(b))
    # rendering continues identically from the restored state
    _, out_a = render_frame(scene, cam, r.state, cfg, H, W)
    _, out_b = render_frame(scene, cam, restored, cfg, H, W)
    np.testing.assert_array_equal(np.asarray(out_a.final), np.asarray(out_b.final))
