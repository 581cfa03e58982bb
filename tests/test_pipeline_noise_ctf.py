"""Full synthetic pipeline gate under noise + CTF (VERDICT r4 Next #5).

phantom -> simulate microscope (per-group CTF + noise) -> ctf_estimate
(full staged fit on the simulated micrograph PSD) -> correct (Wiener with
the ESTIMATED params / --useCTF gridding with the ESTIMATED params) ->
reconstruct (tri+kb and direct-KB) -> FSC vs ground truth with an
ABSOLUTE resolution assertion past Nyquist/2.

This evidences, on realistic data rather than clean phantoms: (a) the
tri+kb-as-default claim, (b) the r5 per-frequency CTF gridding, and
(c) that estimation errors from a real ctf_estimate fit do not break
either correction route. Reference pipeline pattern: SURVEY §4 tier-2
(project -> simulate_microscope -> ctf_estimate -> ctf_correct ->
reconstruct -> resolution_fsc)."""
import numpy as np
import pytest

from xmipp3_tpu.models.ctf_estimation import estimate_ctf_from_psd
from xmipp3_tpu.ops.ctf import (CTFDescription, ctf_params_arrays,
                                wiener_filter_2d)
from xmipp3_tpu.ops.fsc import fsc_3d
from xmipp3_tpu.ops.psd import estimate_psd
from xmipp3_tpu.ops.reconstruct import reconstruct_fourier

TS = 2.0   # A/px


def _ctf_affect(projs, descs, phase_flip=False):
    N = projs.shape[-1]
    fy = np.fft.fftfreq(N).astype(np.float32)[:, None] / TS
    fx = np.fft.rfftfreq(N).astype(np.float32)[None, :] / TS
    out = np.empty_like(projs)
    for i, d in enumerate(descs):
        c = np.asarray(d.pure_at(fx, fy)).astype(np.float32)
        if phase_flip:
            c = np.abs(c)
        out[i] = np.fft.irfft2(np.fft.rfft2(projs[i]) * c,
                               s=(N, N)).astype(np.float32)
    return out


def _simulated_micrograph(desc, n=1024, seed=0):
    """CTF-affected white-noise field — the background/ice signal a real
    ctf_estimate sees (structure of phantom_simulate_microscope's noise
    path: noise convolved with the signed CTF)."""
    rng = np.random.default_rng(seed)
    mic = rng.standard_normal((n, n)).astype(np.float32)
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / TS
    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / TS
    c = np.asarray(desc.pure_at(fx, fy)).astype(np.float32)
    mic = np.fft.irfft2(np.fft.rfft2(mic) * c, s=(n, n)).astype(np.float32)
    return mic + 0.2 * rng.standard_normal((n, n)).astype(np.float32)


@pytest.mark.slow
class TestNoiseCTFPipeline:
    @pytest.fixture(scope="class")
    def pipeline(self):
        from tests.test_reconstruct_quality import _phantom_and_projections
        vol, projs, rot, tilt, psi = _phantom_and_projections(N=64, M=840,
                                                              seed=13)
        group_defs = [(11000.0, 10300.0, 15.0), (15000.0, 14100.0, 60.0),
                      (19000.0, 18200.0, 120.0)]
        group_of = np.arange(len(projs)) % 3
        true_descs = [CTFDescription(sampling_rate=TS, voltage=300, Cs=2.7,
                                     Q0=0.07, defocusU=dU, defocusV=dV,
                                     azimuthal_angle=ang, K=1.0)
                      for dU, dV, ang in group_defs]
        per_img = [true_descs[g] for g in group_of]
        imgs = _ctf_affect(projs, per_img)
        rng = np.random.default_rng(21)
        sigma = 0.35 * projs.std()                   # SNR ~ 8
        noisy = (imgs + sigma * rng.standard_normal(imgs.shape)
                 ).astype(np.float32)

        # ctf_estimate: full staged anisotropic fit on each group's
        # simulated micrograph PSD (the real estimation path)
        est_descs = []
        for g, d in enumerate(true_descs):
            mic = _simulated_micrograph(d, seed=100 + g)
            psd = estimate_psd(mic, piece=256)
            est_descs.append(estimate_ctf_from_psd(
                np.asarray(psd), TS, 300, 2.7, 0.07))
        return (vol, noisy, rot, tilt, psi, group_of, true_descs,
                est_descs)

    @staticmethod
    def _fsc(rec, vol):
        f, c = fsc_3d(rec, vol)
        return np.asarray(f), np.asarray(c)

    def test_ctf_estimation_accuracy(self, pipeline):
        *_, true_descs, est_descs = pipeline
        for t, e in zip(true_descs, est_descs):
            assert abs(e.defocusU - t.defocusU) / t.defocusU < 0.03, \
                (e.defocusU, t.defocusU)
            assert abs(e.defocusV - t.defocusV) / t.defocusV < 0.03, \
                (e.defocusV, t.defocusV)

    def test_usectf_with_estimated_params_resolution_gate(self, pipeline):
        (vol, noisy, rot, tilt, psi, group_of, _true,
         est_descs) = pipeline
        per_img = [est_descs[g] for g in group_of]
        ctfp = ctf_params_arrays(per_img)

        rec_raw = np.asarray(reconstruct_fourier(
            noisy, rot, tilt, psi, interp="tri+kb", batch=64))
        rec_ctf = np.asarray(reconstruct_fourier(
            noisy, rot, tilt, psi, interp="tri+kb", batch=64,
            ctfp=ctfp, sampling=TS, min_ctf=0.05))

        f, c_raw = self._fsc(rec_raw, vol)
        _, c_ctf = self._fsc(rec_ctf, vol)
        lo = f <= 0.30
        assert np.trapezoid(c_ctf[lo], f[lo]) > \
            np.trapezoid(c_raw[lo], f[lo]) + 0.005
        # ABSOLUTE resolution gate past Nyquist/2 (0.25 cycles/px): the
        # gold-standard FSC=0.143 criterion must hold through 0.26, i.e.
        # measured resolution > Nyquist/2. (The falloff is pure SNR —
        # the clean-data gridding ceiling is FSC 0.999 to 0.45; the
        # signed-CTF uncorrected volume goes NEGATIVE past the first
        # zero, so this gate fails without the per-frequency inversion.)
        assert (c_ctf[f <= 0.26] >= 0.143).all(), \
            c_ctf[f <= 0.26].min()

    def test_wiener_with_estimated_params_resolution_gate(self, pipeline):
        (vol, noisy, rot, tilt, psi, group_of, _true,
         est_descs) = pipeline
        corrected = np.empty_like(noisy)
        for g, d in enumerate(est_descs):
            sel = group_of == g
            corrected[sel] = np.asarray(wiener_filter_2d(
                noisy[sel], d, wiener_constant=0.1))
        rec_w = np.asarray(reconstruct_fourier(
            corrected, rot, tilt, psi, interp="tri+kb", batch=64))
        f, c_w = self._fsc(rec_w, vol)
        assert (c_w[f <= 0.26] >= 0.143).all(), c_w[f <= 0.26].min()

    def test_direct_kb_usectf_matches_trikb_under_noise(self, pipeline):
        (vol, noisy, rot, tilt, psi, group_of, _true,
         est_descs) = pipeline
        per_img = [est_descs[g] for g in group_of]
        ctfp = ctf_params_arrays(per_img)
        rec_fast = np.asarray(reconstruct_fourier(
            noisy, rot, tilt, psi, interp="tri+kb", batch=64,
            ctfp=ctfp, sampling=TS, min_ctf=0.05))
        rec_blob = np.asarray(reconstruct_fourier(
            noisy, rot, tilt, psi, interp="kb", batch=64,
            ctfp=ctfp, sampling=TS, min_ctf=0.05))
        f, c_fast = self._fsc(rec_fast, vol)
        _, c_blob = self._fsc(rec_blob, vol)
        keep = f <= 0.45
        # the shipped tri+kb default concedes <2% FSC anywhere vs the
        # reference-exact direct blob, now WITH noise + CTF inversion
        assert (c_fast[keep] >= c_blob[keep] - 0.02).all()
