import numpy as np
import pytest
from scipy.special import j0 as scipy_j0

from xmipp3_tpu.ops.ctf import (CTFDescription, _bessel_j0, apply_ctf,
                                phase_flip, wiener_filter_2d)


def make_ctf(**kw):
    defaults = dict(sampling_rate=1.5, voltage=300.0, defocusU=15000.0,
                    defocusV=14000.0, azimuthal_angle=30.0, Cs=2.7, Q0=0.07)
    defaults.update(kw)
    return CTFDescription(**defaults)


def test_lambda_relativistic():
    si = make_ctf(voltage=300.0).side_info()
    assert si["lam"] == pytest.approx(0.0196875, abs=1e-4)  # Å at 300kV
    si = make_ctf(voltage=100.0).side_info()
    assert si["lam"] == pytest.approx(0.037014, abs=1e-4)


def test_ctf_at_origin():
    ctf = make_ctf()
    v = float(np.asarray(ctf.pure_at(0.0, 0.0)))
    # at u=0: arg=0 -> -K(0 - Q0) = K*Q0
    assert v == pytest.approx(ctf.K * ctf.Q0, abs=1e-6)


def test_first_zero_matches_analytic():
    # weak astigmatism free case: first zero at sqrt(1/(lambda*defocus)) approx
    ctf = make_ctf(defocusU=20000.0, defocusV=20000.0, Cs=0.0, Q0=0.0)
    si = ctf.side_info()
    analytic = np.sqrt(1.0 / (si["lam"] * 20000.0))
    assert ctf.first_zero_freq() == pytest.approx(analytic, rel=1e-3)


def test_astigmatism_angle_dependence():
    ctf = make_ctf(defocusU=20000.0, defocusV=10000.0, azimuthal_angle=0.0)
    f = 0.02
    vU = float(np.asarray(ctf.pure_at(f, 0.0)))
    vV = float(np.asarray(ctf.pure_at(0.0, f)))
    # different defoci along the two axes -> different CTF values
    assert abs(vU - vV) > 1e-3


def test_bessel_j0_accuracy():
    x = np.linspace(0, 30, 1000).astype(np.float32)
    np.testing.assert_allclose(np.asarray(_bessel_j0(x)), scipy_j0(x),
                               atol=2e-6)


def test_metadata_roundtrip(tmp_path):
    ctf = make_ctf()
    fn = str(tmp_path / "test.ctfparam")
    ctf.write(fn)
    ctf2 = CTFDescription.from_metadata(fn)
    assert ctf2.defocusU == pytest.approx(15000.0)
    assert ctf2.azimuthal_angle == pytest.approx(30.0)
    assert ctf2.voltage == pytest.approx(300.0)


def test_phase_flip_involution():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    ctf = make_ctf()
    flipped = np.asarray(phase_flip(img, ctf))
    double = np.asarray(phase_flip(flipped, ctf))
    np.testing.assert_allclose(double, img, atol=1e-4)


def test_apply_ctf_attenuates():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    out = np.asarray(apply_ctf(img, make_ctf()))
    assert out.shape == img.shape
    assert np.std(out) < np.std(img)  # CTF always attenuates white noise


def test_wiener_bounded():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((4, 64, 64)).astype(np.float32)
    out = np.asarray(wiener_filter_2d(img, make_ctf(), wiener_constant=0.1))
    assert np.isfinite(out).all()


def test_noise_model_baseline():
    ctf = CTFDescription(base_line=2.0, gaussian_K=1.0, sigmaU=100.0,
                         sigmaV=100.0, cU=0.0, cV=0.0)
    v = float(np.asarray(ctf.noise_at(0.0, 0.0)))
    assert v == pytest.approx(3.0, abs=1e-5)
