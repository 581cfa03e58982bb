"""Transliteration of the reference wavelets and resolution-FRC gtests
(applications/tests/function_tests/test_wavelets_main.cpp,
test_resolution_frc.cpp).

The wavelets suite runs phaseCongMono on filters/KLH.tif with
(nScale=2, minWaveLength=80, mult=1.25, sigmaOnf=2) and asserts nothing;
we run the same call on the same fixture plus analytic orientation/phase
invariants the reference's formulas imply. The FRC suite embeds two 3x3x3
volumes and asserts rFactor == 0.134661 to 1e-5 (test_resolution_frc.cpp:
frc_dpr call with sam=2, do_rfactor, min_sam=-1, max_sam=2)."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.ops.fsc import frc_rfactor
from xmipp3_tpu.ops.monogenic import phase_cong_mono

KLH = "/root/reference/src/xmipp/resources/test/filters/KLH.tif"


def _gtest_volumes():
    v1 = np.zeros((3, 3, 3))
    v2 = np.zeros((3, 3, 3))
    v1[0, 0] = [1, 2, 3]
    v1[0, 1] = [4, 5, 6]
    v1[0, 2] = [7, 8, 9]
    v1[1, 0] = [10, 11, 12]
    v1[1, 1] = [13, 14, 15]
    v1[1, 2] = [17, 18, 19]
    v1[2, 0] = [20, 21, 22]
    v1[2, 1] = [23, 24, 25]
    v1[2, 2] = [26.4, 27.5, 28.5]
    v2[2, 0] = [1.5, 2.4, 3.3]
    v2[2, 1] = [4.6, 5.7, 6.4]
    v2[2, 2] = [7.3, 8.2, 9.5]
    v2[1, 0] = [10.2, 11.4, 12.5]
    v2[1, 1] = [13.6, 14.5, 15.7]
    v2[1, 2] = [17.3, 18.2, 19.4]
    v2[0, 0] = [20.3, 21.4, 22.5]
    v2[0, 1] = [23.4, 24.5, 25.6]
    v2[0, 2] = [26.7, 24, 23]
    return v1, v2


def test_frc_rfactor_golden():
    """test_resolution_frc.cpp TEST_F(ResolutionFSCTest, copy):
    rFactor == 0.134661 to 1e-5 (sam=2 -> min_freq=sam/min_sam=-2,
    max_freq=sam/max_sam=1)."""
    v1, v2 = _gtest_volumes()
    r = float(frc_rfactor(v1, v2, min_freq=-2.0, max_freq=1.0))
    assert abs(r - 0.134661) < 1e-5


def test_phase_cong_mono_klh_smoke():
    """test_wavelets_main.cpp TEST_F(WaveletTests, phaseCongMono): the
    gtest parameters on the gtest fixture must run and produce sane maps."""
    im = np.squeeze(Image(KLH).data)
    ph, orient, energy = (np.asarray(a) for a in phase_cong_mono(
        im, n_scale=2, min_wavelength=80.0, mult=1.25, sigma_onf=2.0))
    assert ph.shape == orient.shape == energy.shape == im.shape
    for a in (ph, orient, energy):
        assert np.isfinite(a).all()
    # Ph = atan2(F, sqrt(h1^2+h2^2) >= 0) in [-pi/2, pi/2]; Energy >= eps
    assert ph.min() >= -np.pi / 2 - 1e-6 and ph.max() <= np.pi / 2 + 1e-6
    assert energy.min() >= 1e-4 - 1e-8
    assert np.abs(orient).max() <= np.pi + 1e-6


def test_phase_cong_mono_orientation_analytic():
    """Riesz orientation: an x-varying sinusoid gives |Or| ~ pi/2, a
    y-varying one gives Or ~ 0/pi (reference formula Or=atan2(h1,h2),
    wavelet.cpp:1006)."""
    n = 128
    x = np.arange(n)
    imx = np.tile(np.cos(2 * np.pi * x / 8.0), (n, 1))
    imy = imx.T.copy()
    _, or_x, _ = (np.asarray(a) for a in phase_cong_mono(
        imx, n_scale=1, min_wavelength=8.0))
    _, or_y, _ = (np.asarray(a) for a in phase_cong_mono(
        imy, n_scale=1, min_wavelength=8.0))
    # atan2 is only well-conditioned where the Riesz response is large:
    # |sin(2*pi*x/8)| = 1 at x = 2 mod 4
    strong = np.arange(2, n, 4)
    assert np.abs(np.abs(or_x[:, strong]) - np.pi / 2).max() < 0.05
    ory = np.abs(or_y[strong, :])
    assert np.minimum(ory, np.pi - ory).max() < 0.05


def test_phase_cong_mono_phase_analytic():
    """At the peak of an even (cosine) feature F is maximal and |h|~0,
    so Ph ~ +pi/2 (wavelet.cpp:1007 Ph=atan2(F,|h|))."""
    n = 128
    im = np.tile(np.cos(2 * np.pi * np.arange(n) / 8.0), (n, 1))
    ph, _, _ = (np.asarray(a) for a in phase_cong_mono(
        im, n_scale=1, min_wavelength=8.0))
    peak_cols = np.arange(0, n, 8)  # cos peaks
    assert np.abs(ph[:, peak_cols] - np.pi / 2).max() < 0.1
