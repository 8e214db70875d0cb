"""SVGF stages + TAA: contracts each stage must satisfy."""
import numpy as np
import jax.numpy as jnp

from tpuray.denoise.atrous import atrous_iteration
from tpuray.denoise.modulate import modulate
from tpuray.denoise.reproject import reproject
from tpuray.denoise.taa import taa, rgb_to_ycocgr, ycocgr_to_rgb
from tpuray.denoise.variance import estimate_variance
from tpuray.scene.config import RenderConfig

H = W = 32
CFG = RenderConfig(width=W, height=H)


def flat_gbuffer(rng, depth=2.0):
    normal = np.zeros((H, W, 3), np.float32); normal[..., 2] = 1.0
    linear_z = np.full((H, W), depth, np.float32)
    fw_n = np.full((H, W), 0.01, np.float32)
    fw_z = np.full((H, W), 0.01, np.float32)
    return jnp.asarray(normal), jnp.asarray(linear_z), jnp.asarray(fw_n), jnp.asarray(fw_z)


def test_reproject_static_accumulates(rng):
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    albedo = jnp.full((H, W, 3), 0.5)
    emission = jnp.zeros((H, W, 3))
    motion = jnp.zeros((H, W, 2))
    color = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))

    prev_illum = jnp.zeros((H, W, 3))
    prev_var = jnp.zeros((H, W))
    prev_moments = jnp.zeros((H, W, 2))
    prev_hist = jnp.zeros((H, W))
    # frame 1: no valid history (prev depth = sky) -> alpha 1
    out1 = reproject(color, emission, albedo, motion, normal, z, fw_n, fw_z,
                     prev_illum, prev_var, normal, jnp.ones((H, W)),
                     prev_moments, prev_hist, CFG)
    demod = np.asarray(color) / 0.5
    np.testing.assert_allclose(np.asarray(out1.illum), demod, rtol=1e-5)
    np.testing.assert_allclose(np.asarray(out1.history_len), 1.0)

    # frame 2: same signal, valid history -> EMA with alpha=max(0.2,1/2)=0.5
    out2 = reproject(color, emission, albedo, motion, normal, z, fw_n, fw_z,
                     out1.illum, out1.variance, normal, z,
                     out1.moments, out1.history_len, CFG)
    np.testing.assert_allclose(np.asarray(out2.history_len), 2.0)
    np.testing.assert_allclose(np.asarray(out2.illum), demod, rtol=1e-4)
    # constant signal -> variance ~ 0
    assert float(np.abs(np.asarray(out2.variance)).max()) < 1e-4


def test_reproject_rejects_depth_change(rng):
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    albedo = jnp.full((H, W, 3), 1.0)
    color = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_z = jnp.full((H, W), 50.0)  # wildly different depth
    out = reproject(color, jnp.zeros((H, W, 3)), albedo, jnp.zeros((H, W, 2)),
                    normal, z, fw_n, fw_z,
                    jnp.full((H, W, 3), 99.0), jnp.zeros((H, W)),
                    normal, prev_z, jnp.full((H, W, 2), 9.0), jnp.full((H, W), 20.0), CFG)
    # history invalid everywhere -> restart at h=1, illum = current
    np.testing.assert_allclose(np.asarray(out.history_len), 1.0)
    np.testing.assert_allclose(np.asarray(out.illum), np.asarray(color), rtol=1e-5)


def test_variance_passthrough_with_history(rng):
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    illum = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    var = jnp.asarray(rng.random((H, W)).astype(np.float32))
    moments = jnp.zeros((H, W, 2))
    hist = jnp.full((H, W), 10.0)  # >= 4: passthrough
    out = estimate_variance(illum, var, moments, hist, normal, z, fw_z, CFG)
    np.testing.assert_array_equal(np.asarray(out.illum), np.asarray(illum))
    np.testing.assert_array_equal(np.asarray(out.variance), np.asarray(var))


def test_variance_spatial_fallback_smooths(rng):
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    illum = jnp.asarray((rng.random((H, W, 3)) * 2).astype(np.float32))
    lum = np.asarray(0.2125 * illum[..., 0] + 0.7154 * illum[..., 1] + 0.0721 * illum[..., 2])
    moments = jnp.asarray(np.stack([lum, lum ** 2], -1))
    hist = jnp.ones((H, W))
    out = estimate_variance(illum, jnp.zeros((H, W)), moments, hist, normal, z, fw_z, CFG)
    # spatial estimate reduces pixel-to-pixel scatter
    assert np.asarray(out.illum).std() < np.asarray(illum).std()
    assert (np.asarray(out.variance) >= 0).sum() > 0


def test_atrous_preserves_constant(rng):
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    illum = jnp.full((H, W, 3), 0.7)
    var = jnp.full((H, W), 0.1)
    out_i, out_v = atrous_iteration(illum, var, normal, z, fw_z, step=1, cfg=CFG)
    np.testing.assert_allclose(np.asarray(out_i), 0.7, rtol=1e-5)
    # squared-weight variance filtering must shrink variance
    assert (np.asarray(out_v) <= 0.1 + 1e-6).all()
    assert np.asarray(out_v).mean() < 0.1


def test_atrous_smooths_noise(rng):
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    illum = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    var = jnp.full((H, W), 0.5)
    out_i, _ = atrous_iteration(illum, var, normal, z, fw_z, step=1, cfg=CFG)
    assert np.asarray(out_i).std() < np.asarray(illum).std() * 0.8


def test_atrous_respects_sky(rng):
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    z = z.at[: H // 2].set(1.0)  # top half sky
    illum = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    var = jnp.full((H, W), 0.5)
    out_i, out_v = atrous_iteration(illum, var, normal, z, fw_z, step=2, cfg=CFG)
    np.testing.assert_array_equal(np.asarray(out_i)[: H // 2],
                                  np.asarray(illum)[: H // 2])


def test_modulate_inverts_demodulate(rng):
    albedo = jnp.asarray((rng.random((H, W, 3)) * 0.9 + 0.05).astype(np.float32))
    emission = jnp.asarray((rng.random((H, W, 3)) * 0.1).astype(np.float32))
    color = jnp.asarray(rng.random((H, W, 3)).astype(np.float32)) + emission
    z = jnp.full((H, W), 2.0)
    demod = (color - emission) / jnp.maximum(albedo, 1e-3)
    out = modulate(demod, albedo, emission, z)
    np.testing.assert_allclose(np.asarray(out), np.asarray(color), rtol=1e-4, atol=1e-5)


def test_ycocgr_roundtrip(rng):
    c = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    back = ycocgr_to_rgb(rgb_to_ycocgr(c))
    np.testing.assert_allclose(np.asarray(back), np.asarray(c), rtol=1e-5, atol=1e-6)


def test_taa_first_frame_passthrough(rng):
    z = jnp.full((H, W), 2.0)
    cur = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    out = taa(cur, prev, jnp.zeros((H, W, 2)), z, frame=0)
    np.testing.assert_array_equal(np.asarray(out), np.asarray(cur))


def test_taa_static_blends_toward_history(rng):
    z = jnp.full((H, W), 2.0)
    cur = jnp.full((H, W, 3), 0.5)
    prev = jnp.full((H, W, 3), 0.5)
    out = taa(cur, prev, jnp.zeros((H, W, 2)), z, frame=3)
    np.testing.assert_allclose(np.asarray(out), 0.5, rtol=1e-5)


def test_static_camera_path_matches_general(rng):
    """static_camera=True must equal the general path when motion == 0."""
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    albedo = jnp.full((H, W, 3), 0.5)
    emission = jnp.zeros((H, W, 3))
    motion = jnp.zeros((H, W, 2))
    color = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_illum = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_var = jnp.asarray(rng.random((H, W)).astype(np.float32) * 0.1)
    prev_moments = jnp.asarray(rng.random((H, W, 2)).astype(np.float32))
    prev_hist = jnp.full((H, W), 5.0)
    args = (color, emission, albedo, motion, normal, z, fw_n, fw_z,
            prev_illum, prev_var, normal, z, prev_moments, prev_hist, CFG)
    gen = reproject(*args, static_camera=False)
    st = reproject(*args, static_camera=True)
    for a, b in zip(gen, st):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-5, atol=1e-6)


def test_taa_static_matches_general(rng):
    z = jnp.full((H, W), 2.0)
    cur = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    vel = jnp.zeros((H, W, 2))
    a = taa(cur, prev, vel, z, 3, static_camera=False)
    b = taa(cur, prev, vel, z, 3, static_camera=True)
    np.testing.assert_allclose(np.asarray(a), np.asarray(b), rtol=1e-5, atol=1e-6)


def test_fast_reproject_matches_exact_for_smooth_motion(rng):
    """fast_reproject (rescue taps from shifted base gathers) equals the
    exact 4-quad rescue wherever the motion field is locally constant."""
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    albedo = jnp.full((H, W, 3), 0.5)
    emission = jnp.zeros((H, W, 3))
    # constant integer+fraction motion: 2.25 px right, 1.5 px down in uv
    motion = jnp.stack([jnp.full((H, W), 2.25 / W), jnp.full((H, W), 1.5 / H)],
                       axis=-1)
    color = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_illum = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_var = jnp.asarray(rng.random((H, W)).astype(np.float32))
    prev_moments = jnp.asarray(rng.random((H, W, 2)).astype(np.float32))
    prev_hist = jnp.full((H, W), 5.0)
    # make the bilinear taps FAIL (prev depth differs) on a block so the
    # rescue path is exercised, with prev normals valid there via 3x3
    prev_z = z.at[8:16, 8:16].add(5.0)

    args = dict(color=color, emission=emission, albedo=albedo, motion=motion,
                normal=normal, linear_z=z, fwidth_normal=fw_n, fwidth_z=fw_z,
                prev_illum=prev_illum, prev_variance=prev_var,
                prev_normal=normal, prev_linear_z=prev_z,
                prev_moments=prev_moments, prev_history_len=prev_hist)
    exact = reproject(**args, cfg=CFG)
    fast = reproject(**args, cfg=CFG.replace(fast_reproject=True))
    interior = np.s_[4:-4, 4:-4]
    np.testing.assert_allclose(np.asarray(fast.illum)[interior],
                               np.asarray(exact.illum)[interior],
                               rtol=1e-5, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fast.history_len)[interior],
                               np.asarray(exact.history_len)[interior],
                               rtol=1e-5, atol=1e-5)


def test_tiled_reproject_matches_exact(rng):
    """reproject_gather='tiled' (tile-windowed fetch, the TPU default) must
    equal the exact gather path for smooth motion — including where the
    bilinear taps fail and the 3x3 rescue engages."""
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    albedo = jnp.full((H, W, 3), 0.5)
    emission = jnp.zeros((H, W, 3))
    # constant integer+fraction motion exercises bilinear weights
    motion = jnp.stack([jnp.full((H, W), 2.25 / W), jnp.full((H, W), 1.5 / H)],
                       axis=-1)
    color = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_illum = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_var = jnp.asarray(rng.random((H, W)).astype(np.float32))
    prev_moments = jnp.asarray(rng.random((H, W, 2)).astype(np.float32))
    prev_hist = jnp.full((H, W), 5.0)
    prev_z = z.at[8:16, 8:16].add(5.0)  # force rescue inside a block

    args = dict(color=color, emission=emission, albedo=albedo, motion=motion,
                normal=normal, linear_z=z, fwidth_normal=fw_n, fwidth_z=fw_z,
                prev_illum=prev_illum, prev_variance=prev_var,
                prev_normal=normal, prev_linear_z=prev_z,
                prev_moments=prev_moments, prev_history_len=prev_hist)
    exact = reproject(**args, cfg=CFG.replace(reproject_gather="exact"))
    tiled = reproject(**args, cfg=CFG.replace(reproject_gather="tiled"))
    # compare where the reprojected base lands in-image: at the inflow
    # border (first ~3 columns here) the tiled path conservatively rejects
    # taps whose base is off-image while the exact path's clamped quad
    # fetch keeps them — documented border-only divergence
    interior = np.s_[2:-2, 4:-2]
    for a, b in zip(tiled, exact):
        np.testing.assert_allclose(np.asarray(a)[interior],
                                   np.asarray(b)[interior],
                                   rtol=1e-5, atol=1e-5)


def test_tiled_reproject_no_nans_wild_motion(rng):
    """Wild per-pixel motion: the tiled path must stay finite and behave as
    'reprojection failed' (history restarts) rather than fetching garbage."""
    normal, z, fw_n, fw_z = flat_gbuffer(rng)
    albedo = jnp.full((H, W, 3), 0.5)
    emission = jnp.zeros((H, W, 3))
    motion = jnp.asarray((rng.random((H, W, 2)) - 0.5).astype(np.float32))
    color = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_illum = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev_var = jnp.asarray(rng.random((H, W)).astype(np.float32))
    prev_moments = jnp.asarray(rng.random((H, W, 2)).astype(np.float32))
    prev_hist = jnp.full((H, W), 5.0)
    out = reproject(color, emission, albedo, motion, normal, z, fw_n, fw_z,
                    prev_illum, prev_var, normal, z, prev_moments, prev_hist,
                    CFG.replace(reproject_gather="tiled"))
    for a in out:
        assert np.isfinite(np.asarray(a)).all()


def test_taa_tiled_fetch_matches_gather(rng):
    """taa(tiled_fetch=True) must equal the gather path for smooth motion
    (away from image borders, where the tiled path conservatively rejects
    rather than clamps)."""
    z = jnp.full((H, W), 2.0)
    cur = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    prev = jnp.asarray(rng.random((H, W, 3)).astype(np.float32))
    vel = jnp.stack([jnp.full((H, W), 1.3 / W), jnp.full((H, W), 0.6 / H)],
                    axis=-1)
    a = taa(cur, prev, vel, z, 3, tiled_fetch=False)
    b = taa(cur, prev, vel, z, 3, tiled_fetch=True)
    interior = np.s_[3:-3, 3:-3]
    np.testing.assert_allclose(np.asarray(b)[interior],
                               np.asarray(a)[interior], rtol=1e-5, atol=1e-5)
