"""Golden-harness image-comparison utilities (tpuray/utils/imgcmp.py)."""
import numpy as np
import pytest

from tpuray.utils.imgcmp import best_offset, grad_mag, luminance, ncc, ssim


def _pattern(h, w, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.meshgrid(np.arange(h), np.arange(w), indexing="ij")
    img = (np.sin(xx * 0.3) * np.cos(yy * 0.2)
           + 0.1 * rng.standard_normal((h, w))).astype(np.float32)
    return (img - img.min()) / (img.max() - img.min())


def test_ssim_identity_and_degradation():
    a = _pattern(48, 48)
    assert ssim(a, a) == pytest.approx(1.0, abs=1e-5)
    noisy = np.clip(a + 0.3 * np.random.default_rng(1).standard_normal(a.shape), 0, 1)
    assert ssim(a, noisy.astype(np.float32)) < 0.9


def test_ncc_bounds():
    a = _pattern(32, 32)
    assert ncc(a, a) == pytest.approx(1.0, abs=1e-6)
    assert ncc(a, -a) == pytest.approx(-1.0, abs=1e-6)
    assert ncc(a, np.full_like(a, 0.5)) == 0.0


def test_best_offset_recovers_planted_shift():
    big = _pattern(96, 96, seed=2)
    dy, dx = 17, 9
    small = big[dy:dy + 48, dx:dx + 48]
    (fy, fx), score = best_offset(small, big, search=32)
    assert (fy, fx) == (dy, dx)
    assert score > 0.99


def test_luminance_weights():
    img = np.zeros((2, 2, 3), np.float32)
    img[..., 1] = 1.0
    assert luminance(img)[0, 0] == pytest.approx(0.6)


def test_grad_mag_edge():
    img = np.zeros((8, 8), np.float32)
    img[:, 4:] = 1.0
    g = grad_mag(img)
    assert g[:, 3].min() == 1.0 and g[:, :3].max() == 0.0
