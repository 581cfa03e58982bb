import numpy as np
import pytest

from xmipp3_tpu.ops.geo import (apply_affine_2d, apply_affine_3d,
                                apply_alignment_2d, rotate_2d, shift_2d_real,
                                window_2d)
from xmipp3_tpu.core.geometry import rotation2d_matrix


def gaussian_blob(h, w, cy, cx, sigma=2.0):
    y, x = np.mgrid[0:h, 0:w].astype(np.float32)
    return np.exp(-((y - cy) ** 2 + (x - cx) ** 2) / (2 * sigma ** 2))


def centroid(img):
    img = np.asarray(img)
    img = np.maximum(img, 0)
    y, x = np.mgrid[0:img.shape[0], 0:img.shape[1]]
    s = img.sum()
    return (y * img).sum() / s, (x * img).sum() / s


def test_shift_moves_content():
    img = gaussian_blob(64, 64, 32, 32)
    out = np.asarray(shift_2d_real(img[None], 5.0, -3.0))[0]
    cy, cx = centroid(out)
    assert cx == pytest.approx(37.0, abs=0.1)
    assert cy == pytest.approx(29.0, abs=0.1)


def test_rotation_moves_blob():
    img = gaussian_blob(64, 64, 32, 42)  # blob at +x from center
    out = np.asarray(rotate_2d(img[None], 90.0))[0]
    cy, cx = centroid(out)
    # +90° rotation (CCW in logical x-right/y-up == CW in row coords):
    # blob at +x should move to +y logical = row-down or row-up consistently
    assert abs(cx - 32) < 0.2
    assert abs(cy - 32) == pytest.approx(10.0, abs=0.3)


def test_rotation_inverse_consistency():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    from xmipp3_tpu.ops.fourier_filter import low_pass_mask, apply_fourier_mask_2d
    img = np.asarray(apply_fourier_mask_2d(img, low_pass_mask(64, 64, 0.15)))
    fwd = np.asarray(rotate_2d(img[None], 33.0, order=3))[0]
    back = np.asarray(rotate_2d(fwd[None], -33.0, order=3))[0]
    # compare central region (border is lost)
    c = slice(20, 44)
    err = np.abs(back[c, c] - img[c, c]).max() / np.abs(img).max()
    assert err < 0.06


def test_affine_matches_alignment():
    img = gaussian_blob(32, 32, 16, 20)
    A = rotation2d_matrix(45.0)
    out1 = np.asarray(apply_affine_2d(img[None], A[None]))[0]
    out2 = np.asarray(apply_alignment_2d(img[None], np.array([45.0]),
                                         np.zeros(1), np.zeros(1)))[0]
    np.testing.assert_allclose(out1, out2, atol=1e-5)


def test_bspline_matches_bilinear_smooth():
    # On a smooth image both interpolators agree closely
    img = gaussian_blob(64, 64, 30, 36, sigma=6.0)
    r1 = np.asarray(rotate_2d(img[None], 20.0, order=1))[0]
    r3 = np.asarray(rotate_2d(img[None], 20.0, order=3))[0]
    assert np.abs(r1 - r3).max() < 1e-2


def test_apply_affine_3d_identity_and_z90():
    rng = np.random.default_rng(2)
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    out = np.asarray(apply_affine_3d(vol, np.eye(3)[None]))[0]
    np.testing.assert_allclose(out, vol, atol=1e-4)


def test_window_crop_pad_roundtrip():
    img = gaussian_blob(33, 33, 16, 16)
    big = np.asarray(window_2d(img, 64, 64))
    small = np.asarray(window_2d(big, 33, 33))
    np.testing.assert_allclose(small, img, atol=1e-6)
    assert centroid(big)[0] == pytest.approx(32, abs=0.01)
