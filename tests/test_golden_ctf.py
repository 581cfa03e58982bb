"""Golden parity with function_tests/test_ctf_main.cpp: the embedded
errorBetween2CTFs / errorMaxFreqCTFs / errorMaxFreqCTFs2D values and the
phase-flip delta-response statistics, all on the reference's exact CTF
parameter sets."""
import numpy as np
import pytest

import jax.numpy as jnp

from xmipp3_tpu.ops.ctf import (CTFDescription, error_between_2ctfs,
                                error_max_freq_ctfs, error_max_freq_ctfs_2d,
                                generate_image_with_2ctfs, phase_flip)


def test_error_between_2ctfs():
    c1 = CTFDescription(sampling_rate=2.1, voltage=300, defocusU=5000,
                        defocusV=10000, azimuthal_angle=-45, Cs=2, Q0=0.1)
    c2 = CTFDescription(sampling_rate=2.1, voltage=300, defocusU=10000,
                        defocusV=10000, azimuthal_angle=45, Cs=2, Q0=0.1)
    err = error_between_2ctfs(c1, c2, 256, 0.05, 0.25)
    assert err == pytest.approx(7121.4971, rel=1e-5)


def test_error_max_freq_ctfs():
    c = CTFDescription(sampling_rate=2, voltage=300, defocusU=6000,
                       defocusV=7500, azimuthal_angle=45, Cs=2, Q0=0.1)
    assert error_max_freq_ctfs(c, np.pi / 2) == pytest.approx(7.6852355,
                                                              rel=1e-6)


def test_error_max_freq_ctfs_2d():
    c1 = CTFDescription(sampling_rate=2, voltage=300, defocusU=10000,
                        defocusV=5400, azimuthal_angle=45, Cs=2, Q0=0.1)
    c2 = CTFDescription(sampling_rate=2, voltage=300, defocusU=5000,
                        defocusV=5000, azimuthal_angle=45, Cs=2, Q0=0.1)
    res = error_max_freq_ctfs_2d(c1, c2, 256, np.pi / 2)
    assert res == pytest.approx(13.921659080780355, abs=1e-5)


def test_phase_flip_delta_stats():
    c = CTFDescription(sampling_rate=1, voltage=300, defocusU=20000,
                       defocusV=20000, Cs=2, Q0=0.1, K=1.0)
    img = np.zeros((256, 256), np.float32)
    img[128, 128] = 1.0
    out = np.asarray(phase_flip(jnp.asarray(img[None]), c))[0]
    assert out.std() == pytest.approx(0.003906, abs=1e-4)
    assert out.max() == pytest.approx(0.017565, abs=1e-4)


def test_generate_image_with_2ctfs():
    c = CTFDescription(sampling_rate=1, voltage=300, defocusU=26000,
                       defocusV=2000, azimuthal_angle=45, Cs=2, Q0=0.1)
    img = generate_image_with_2ctfs(c, c, 256)
    assert img.shape == (256, 256)
    assert np.isfinite(img).all()
    assert np.abs(img).max() <= 1.0 + 1e-5
