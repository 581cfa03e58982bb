import numpy as np
import pytest

from xmipp3_tpu.ops.mask import (background_mask, circular_mask, crown_mask,
                                 raised_cosine_window_1d, rectangular_mask)
from xmipp3_tpu.ops.normalize import (normalize, normalize_old_xmipp,
                                      normalize_ramp, normalize_robust,
                                      subtract_background_plane)


def test_circular_mask_area():
    m = circular_mask((64, 64), 20)
    assert abs(m.sum() - np.pi * 400) / (np.pi * 400) < 0.02
    assert m[32, 32] == 1.0
    assert m[0, 0] == 0.0


def test_crown_and_background():
    c = crown_mask((64, 64), 10, 20)
    assert c[32, 32] == 0.0
    assert c[32, 32 + 15] == 1.0
    b = background_mask((64, 64), 30)
    assert b[32, 32] == 0.0
    assert b[0, 0] == 1.0


def test_spherical_mask():
    m = circular_mask((32, 32, 32), 10)
    assert m[16, 16, 16] == 1.0
    vol = 4 / 3 * np.pi * 1000
    assert abs(m.sum() - vol) / vol < 0.05


def test_rect_mask():
    m = rectangular_mask((32, 32), 5, 8)
    assert m.sum() == (2 * 5 + 1) * (2 * 8 + 1)


def test_old_xmipp():
    rng = np.random.default_rng(0)
    img = (5.0 + 3.0 * rng.standard_normal((4, 32, 32))).astype(np.float32)
    out = np.asarray(normalize_old_xmipp(img))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=(1, 2)), 1, atol=1e-5)


def test_plane_subtraction_recovers():
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    plane = 2.0 + 0.1 * (x - 32) - 0.05 * (y - 32)
    rng = np.random.default_rng(1)
    signal = np.zeros((64, 64), np.float32)
    signal[28:36, 28:36] = 5.0  # particle in the middle
    img = (plane + signal).astype(np.float32)
    bg = background_mask((64, 64), 20)
    out = np.asarray(subtract_background_plane(img[None], bg))[0]
    # background should be ~0 after plane removal
    assert np.abs(out[bg > 0]).max() < 1e-2
    assert out[32, 32] == pytest.approx(5.0, abs=0.02)


def test_normalize_ramp_zero_background():
    rng = np.random.default_rng(2)
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    img = (0.2 * x + rng.standard_normal((64, 64))).astype(np.float32)
    out = np.asarray(normalize_ramp(img[None]))[0]
    bg = background_mask((64, 64)) > 0
    assert abs(out[bg].mean()) < 0.05
    assert out[bg].std() == pytest.approx(1.0, abs=0.05)


def test_robust_resists_outliers():
    rng = np.random.default_rng(3)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    img[0, 0] = 1e4
    out = np.asarray(normalize_robust(img))
    assert abs(np.median(out)) < 0.05


def test_dispatch_methods():
    rng = np.random.default_rng(4)
    img = rng.standard_normal((2, 32, 32)).astype(np.float32)
    for m in ("OldXmipp", "NewXmipp", "Ramp", "Robust", "Michael"):
        out = np.asarray(normalize(img, m))
        assert out.shape == img.shape and np.isfinite(out).all()
    with pytest.raises(ValueError):
        normalize(img, "nope")


def test_piece_smoother():
    w = raised_cosine_window_1d(64, 0.5)
    assert w[0] < 0.1 and w[32] == 1.0 and w[-1] < 0.1
    np.testing.assert_allclose(w, w[::-1], atol=1e-6)
