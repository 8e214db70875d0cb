"""Parity tests for the fused Pallas reproject+variance kernel
(tpuray/kernels/reproject_pallas.py) against the XLA tiled reproject path
composed with estimate_variance — interpret mode, CPU."""
import numpy as np
import jax.numpy as jnp
import pytest

from tpuray.denoise.reproject import reproject
from tpuray.denoise.variance import estimate_variance
from tpuray.kernels.reproject_pallas import reproject_variance_fused
from tpuray.scene.config import RenderConfig

H, W = 64, 256  # 2x2 tiles of (32, 128)
CFG = RenderConfig(width=W, height=H, reproject_gather="tiled")


@pytest.fixture
def rng():
    return np.random.default_rng(7)


def _inputs(rng, motion):
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (H, W, 3))
    z = jnp.asarray((rng.random((H, W)) * 0.5 + 0.2).astype(np.float32))
    fw_n = jnp.full((H, W), 0.05)
    fw_z = jnp.full((H, W), 0.01)
    return dict(
        color=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        emission=jnp.zeros((H, W, 3)),
        albedo=jnp.full((H, W, 3), 0.5),
        motion=motion, normal=normal, linear_z=z,
        fwidth_normal=fw_n, fwidth_z=fw_z,
        prev_illum=jnp.asarray(rng.random((H, W, 3)).astype(np.float32)),
        prev_variance=jnp.asarray(rng.random((H, W)).astype(np.float32)),
        prev_normal=normal, prev_linear_z=z,
        prev_moments=jnp.asarray(rng.random((H, W, 2)).astype(np.float32)),
        prev_history_len=jnp.full((H, W), 5.0))


def _reference(args, cfg):
    rep = reproject(**args, cfg=cfg)
    var = estimate_variance(
        illum=rep.illum, variance=rep.variance, moments=rep.moments,
        history_len=rep.history_len, normal=args["normal"],
        linear_z=args["linear_z"], fwidth_z=args["fwidth_z"], cfg=cfg)
    return rep, var


def _check(args, cfg, interior=np.s_[4:-4, 4:-4]):
    rep, var = _reference(args, cfg)
    fused = reproject_variance_fused(**args, cfg=cfg, interpret=True)
    pairs = [
        ("rep_illum", fused.rep_illum, rep.illum),
        ("rep_var", fused.rep_variance, rep.variance),
        ("moments", fused.moments, rep.moments),
        ("hist", fused.history_len, rep.history_len),
        ("var_illum", fused.var_illum, var.illum),
        ("var_var", fused.var_variance, var.variance),
    ]
    for name, a, b in pairs:
        np.testing.assert_allclose(
            np.asarray(a)[interior], np.asarray(b)[interior],
            rtol=2e-5, atol=2e-5, err_msg=name)


def test_fused_matches_tiled_smooth_motion(rng):
    """Constant fractional motion: bilinear weights + validity exercised."""
    motion = jnp.stack([jnp.full((H, W), 2.25 / W),
                        jnp.full((H, W), 1.5 / H)], axis=-1)
    args = _inputs(rng, motion)
    # force the rescue path inside a block (bilinear taps fail on depth)
    args["prev_linear_z"] = args["prev_linear_z"].at[8:16, 8:16].add(5.0)
    _check(args, CFG)


def test_fused_matches_tiled_with_fallback_and_sky(rng):
    """Low history engages the 7x7 spatial fallback; sky rows passthrough."""
    motion = jnp.stack([jnp.full((H, W), -1.75 / W),
                        jnp.full((H, W), 0.5 / H)], axis=-1)
    args = _inputs(rng, motion)
    args["prev_history_len"] = jnp.asarray(
        (rng.random((H, W)) * 6).astype(np.float32))
    args["linear_z"] = args["linear_z"].at[0:8, :].set(1.0)  # sky band
    args["prev_linear_z"] = args["linear_z"]
    _check(args, CFG)


def test_fused_matches_tiled_varying_motion(rng):
    """Smoothly varying (rotation-like) motion field across tiles."""
    yy, xx = jnp.meshgrid(jnp.arange(H, dtype=jnp.float32),
                          jnp.arange(W, dtype=jnp.float32), indexing="ij")
    motion = jnp.stack([(xx / W - 0.5) * 4.0 / W + 1.2 / W,
                        (yy / H - 0.5) * 3.0 / H - 0.7 / H], axis=-1)
    args = _inputs(rng, motion)
    _check(args, CFG)


def test_fused_finite_wild_motion(rng):
    """Per-pixel random motion: conservative invalidation, no NaNs."""
    motion = jnp.asarray((rng.random((H, W, 2)) - 0.5).astype(np.float32))
    args = _inputs(rng, motion)
    fused = reproject_variance_fused(**args, cfg=CFG, interpret=True)
    for a in fused:
        assert np.isfinite(np.asarray(a)).all()
    # failed reprojection restarts history
    assert np.asarray(fused.history_len).mean() < 3.0


def test_fused_non_divisible_shape(rng):
    """H, W not multiples of the tile: padded tiles masked correctly."""
    h2, w2 = 48, 200
    motion = jnp.stack([jnp.full((h2, w2), 1.25 / w2),
                        jnp.full((h2, w2), -0.5 / h2)], axis=-1)
    normal = jnp.broadcast_to(jnp.asarray([0.0, 0.0, 1.0]), (h2, w2, 3))
    z = jnp.asarray((rng.random((h2, w2)) * 0.5 + 0.2).astype(np.float32))
    args = dict(
        color=jnp.asarray(rng.random((h2, w2, 3)).astype(np.float32)),
        emission=jnp.zeros((h2, w2, 3)),
        albedo=jnp.full((h2, w2, 3), 0.5),
        motion=motion, normal=normal, linear_z=z,
        fwidth_normal=jnp.full((h2, w2), 0.05),
        fwidth_z=jnp.full((h2, w2), 0.01),
        prev_illum=jnp.asarray(rng.random((h2, w2, 3)).astype(np.float32)),
        prev_variance=jnp.asarray(rng.random((h2, w2)).astype(np.float32)),
        prev_normal=normal, prev_linear_z=z,
        prev_moments=jnp.asarray(rng.random((h2, w2, 2)).astype(np.float32)),
        prev_history_len=jnp.full((h2, w2), 5.0))
    cfg = RenderConfig(width=w2, height=h2, reproject_gather="tiled")
    rep, var = _reference(args, cfg)
    fused = reproject_variance_fused(**args, cfg=cfg, interpret=True)
    interior = np.s_[4:-4, 4:-4]
    np.testing.assert_allclose(
        np.asarray(fused.var_illum)[interior],
        np.asarray(var.illum)[interior], rtol=2e-5, atol=2e-5)
    np.testing.assert_allclose(
        np.asarray(fused.history_len)[interior],
        np.asarray(rep.history_len)[interior], rtol=2e-5, atol=2e-5)
