"""CTF estimation tests: synthetic micrograph with a KNOWN CTF must be
recovered within tolerance (self-consistency — the reference validates via
golden files; the physics check here is stronger)."""
import numpy as np
import pytest

from xmipp3_tpu.models.ctf_estimation import CTFEstimator
from xmipp3_tpu.ops.ctf import CTFDescription, apply_ctf
from xmipp3_tpu.ops.psd import (estimate_psd, psd_half_to_full_centered,
                                radial_profile, tile_positions)


def synth_micrograph(ctf, size=1024, seed=0):
    """White noise shaped by the CTF + white background noise."""
    rng = np.random.default_rng(seed)
    signal = rng.standard_normal((size, size)).astype(np.float32)
    shaped = np.asarray(apply_ctf(signal, ctf))
    return (shaped + 0.3 * rng.standard_normal((size, size))
            ).astype(np.float32)


def test_tile_positions_cover():
    pos = tile_positions(1024, 512, 0.5)
    assert pos[0] == 0 and pos[-1] == 512
    assert len(pos) == 3


def test_psd_shape_and_positivity():
    rng = np.random.default_rng(0)
    mic = rng.standard_normal((600, 700)).astype(np.float32)
    psd = np.asarray(estimate_psd(mic, piece=256))
    assert psd.shape == (256, 129)
    assert (psd >= 0).all()
    # white noise -> flat PSD
    freqs, prof = radial_profile(psd)
    inner = prof[3:-3]
    assert inner.std() / inner.mean() < 0.2


def test_psd_full_centered_symmetric():
    rng = np.random.default_rng(1)
    mic = rng.standard_normal((512, 512)).astype(np.float32)
    psd = np.asarray(estimate_psd(mic, piece=128))
    full = psd_half_to_full_centered(psd, 128)
    assert full.shape == (128, 128)
    # centro-symmetry of a real signal's PSD
    c = full[1:, 1:]
    np.testing.assert_allclose(c, c[::-1, ::-1], rtol=1e-3, atol=1e-3)


@pytest.mark.slow
def test_recover_known_defocus():
    true = CTFDescription(sampling_rate=1.5, voltage=300.0, Cs=2.7, Q0=0.07,
                          defocusU=18000.0, defocusV=18000.0)
    mic = synth_micrograph(true, size=1024)
    psd = np.asarray(estimate_psd(mic, piece=256))
    est = CTFEstimator(psd, sampling=1.5, voltage=300.0, Cs=2.7, Q0=0.07,
                       defocus_range=(5000, 30000))
    ctf = est.estimate()
    err = abs(ctf.defocusU - 18000.0) / 18000.0
    assert err < 0.05, f"defocusU {ctf.defocusU} (rel err {err:.3f})"


@pytest.mark.slow
def test_recover_astigmatic_defocus():
    true = CTFDescription(sampling_rate=1.5, voltage=300.0, Cs=2.7, Q0=0.07,
                          defocusU=22000.0, defocusV=17000.0,
                          azimuthal_angle=40.0)
    mic = synth_micrograph(true, size=1024, seed=3)
    psd = np.asarray(estimate_psd(mic, piece=256))
    est = CTFEstimator(psd, sampling=1.5, voltage=300.0, Cs=2.7, Q0=0.07,
                       defocus_range=(5000, 35000))
    ctf = est.estimate()
    avg_true = (22000 + 17000) / 2
    avg_est = (ctf.defocusU + ctf.defocusV) / 2
    assert abs(avg_est - avg_true) / avg_true < 0.07
    # astigmatism magnitude recovered within 40%
    astig_true = 22000 - 17000
    astig_est = abs(ctf.defocusU - ctf.defocusV)
    assert abs(astig_est - astig_true) < 0.5 * astig_true + 1000
