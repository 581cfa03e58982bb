"""CTF estimation reference flag surface (round 3): fastDefocus,
noDefocus, radial_noise, model_simplification, bootstrapFit,
refine_amplitude_contrast, ctfmodelSize, downSamplingPerformed,
ctf_similar_to, Nsubpiece, psd_estimator ARMA.

Reference grammar: ctf_estimate_from_psd_base.cpp:99-168 (basic params),
data/ctf.cpp CTFDescription1D/2D::defineParams,
ctf_estimate_from_micrograph.cpp defineParams."""
import os

import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.models.ctf_estimation import CTFEstimator
from xmipp3_tpu.ops.ctf import CTFDescription
from xmipp3_tpu.ops.psd import psd_half_to_full_centered
from xmipp3_tpu.programs import get_program

N, TS = 192, 1.5
DEFU, DEFV, ANG = 17500.0, 14500.0, 40.0


def run_prog(name, args):
    prog = get_program(name)
    prog.read(["x"] + args.split())
    assert prog.tryRun() == 0, f"{name} failed"
    return prog


def _synthetic_psd(n=N, Ts=TS, defU=DEFU, defV=DEFV, ang=ANG, seed=0):
    true = CTFDescription(
        sampling_rate=Ts, voltage=300, Cs=2.7, Q0=0.07, defocusU=defU,
        defocusV=defV, azimuthal_angle=ang, K=1.0, espr=1.0, alpha=2e-4,
        base_line=0.1, sqrt_K=3.0, sqU=12.0, sqV=14.0, sqrt_angle=20.0,
        gaussian_K=1.5, sigmaU=8000.0, sigmaV=9000.0, cU=0.02, cV=0.022,
        gaussian_angle=10.0)
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / Ts
    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / Ts
    ctf2 = np.asarray(true.pure_at(fx, fy)) ** 2
    noise = np.asarray(true.noise_at(fx, fy))
    rng = np.random.default_rng(seed)
    mult = rng.chisquare(20, ctf2.shape).astype(np.float32) / 20
    return ((noise + ctf2) * mult).astype(np.float32), true


@pytest.fixture(scope="module")
def psd_pair():
    return _synthetic_psd()


class TestEstimatorFlags:
    def test_fast_defocus_zernike_initializer(self, psd_pair):
        """--fastDefocus path: SPTH ring demodulation seeds the defocus
        without the coarse grid (reference estimate_defoci_Zernike,
        ctf_estimate_from_psd.cpp:1936)."""
        psd, true = psd_pair
        est = CTFEstimator(psd, TS, 300, 2.7, 0.07, fast_defocus=(2.0, 10))
        est.fit_background()
        est.fit_gaussian1()
        assert est.fast_defocus_zernike()
        d_avg = 0.5 * (est.params[0] + est.params[1])
        true_avg = 0.5 * (true.defocusU + true.defocusV)
        assert abs(d_avg - true_avg) / true_avg < 0.10

    def test_no_defocus_keeps_initial(self, psd_pair):
        psd, _ = psd_pair
        est = CTFEstimator(psd, TS, 300, 2.7, 0.07, no_defocus=True,
                           initial_defocus=(16000.0, 16000.0, 0.0),
                           fast=True)
        ctf = est.estimate()
        assert ctf.defocusU == 16000.0 and ctf.defocusV == 16000.0

    def test_radial_noise_is_isotropic(self, psd_pair):
        psd, true = psd_pair
        est = CTFEstimator(psd, TS, 300, 2.7, 0.07, radial_noise=True)
        ctf = est.estimate()
        assert ctf.sqU == ctf.sqV
        assert ctf.sigmaU == ctf.sigmaV
        assert ctf.cU == ctf.cV
        # defocus recovery survives the constraint
        assert abs(ctf.defocusU - true.defocusU) / true.defocusU < 0.05

    def test_model_simplification_removes_gauss2(self, psd_pair):
        psd, _ = psd_pair
        est = CTFEstimator(psd, TS, 300, 2.7, 0.07, model_simplification=2)
        ctf = est.estimate()
        assert ctf.gaussian_K2 == 0.0
        # level 1 freezes the envelope extras too
        assert ctf.DeltaF == 0.0 and ctf.DeltaR == 0.0

    def test_bootstrap_fit_variability(self, psd_pair):
        psd, true = psd_pair
        est = CTFEstimator(psd, TS, 300, 2.7, 0.07, fast=True)
        est.estimate()
        samples = est.bootstrap_fit(4, seed=1)
        assert samples.shape == (4, 3)
        # every bootstrap half-sample stays near the full-band fit
        assert np.all(np.abs(samples[:, 0] - true.defocusU)
                      / true.defocusU < 0.15)

    def test_refine_amplitude_contrast(self, psd_pair):
        psd, _ = psd_pair
        est = CTFEstimator(psd, TS, 300, 2.7, 0.05, fast=True,
                           refine_Q0=True)
        est.estimate()
        q = est.consts[3]
        assert 0.005 <= q <= 0.6


class TestCLISurface:
    @pytest.fixture(scope="class")
    def psd_file(self, tmp_path_factory):
        d = str(tmp_path_factory.mktemp("ctfflags"))
        psd, true = _synthetic_psd()
        save_image(d + "/in.psd", psd_half_to_full_centered(psd, N))
        return d, true

    def test_psd_program_full_surface(self, psd_file):
        d, true = psd_file
        run_prog("ctf_estimate_from_psd",
                 f"--psd {d}/in.psd -o {d}/out.ctfparam -s {TS} "
                 f"--voltage 300 --spherical_aberration 2.7 --Q0 0.07 "
                 f"--defocusU 17000 --defocus_range 6000 "
                 f"--ctfmodelSize 64 --bootstrapFit 3 "
                 f"--downSamplingPerformed 2 --model_simplification 2")
        ctf = CTFDescription.from_metadata(d + "/out.ctfparam")
        # output referred to the original sampling rate (Tm /= factor,
        # ctf_estimate_from_psd.cpp:2456)
        assert abs(ctf.sampling_rate - TS / 2) < 1e-6
        assert abs(ctf.defocusU - true.defocusU) / true.defocusU < 0.05
        assert os.path.exists(d + "/out_ctfmodel_quadrant.xmp")
        assert os.path.exists(d + "/out_ctfmodel_halfplane.xmp")
        q = np.squeeze(Image(d + "/out_ctfmodel_quadrant.xmp").data)
        assert q.shape == (64, 64)
        md = MetaData(d + "/out_bootstrap.xmd")
        assert md.size() == 3
        assert md.containsLabel("ctfDefocusU")

    def test_psd_program_fastdefocus_radial(self, psd_file):
        d, true = psd_file
        run_prog("ctf_estimate_from_psd",
                 f"--psd {d}/in.psd -o {d}/fd.ctfparam -s {TS} "
                 f"--kV 300 --Cs 2.7 --Q0 0.07 --fastDefocus 2 10 "
                 f"--radial_noise --show_optimization")
        ctf = CTFDescription.from_metadata(d + "/fd.ctfparam")
        assert ctf.sqU == ctf.sqV
        assert abs(ctf.defocusU - true.defocusU) / true.defocusU < 0.05

    def test_ctf_similar_to_seeds_nodefocus(self, psd_file):
        d, _ = psd_file
        seed = CTFDescription(sampling_rate=TS, voltage=300, Cs=2.7,
                              Q0=0.07, defocusU=15500, defocusV=14000,
                              azimuthal_angle=25.0)
        seed.write(d + "/seed.ctfparam")
        run_prog("ctf_estimate_from_psd",
                 f"--psd {d}/in.psd -o {d}/sim.ctfparam -s {TS} "
                 f"--ctf_similar_to {d}/seed.ctfparam --noDefocus")
        ctf = CTFDescription.from_metadata(d + "/sim.ctfparam")
        assert abs(ctf.defocusU - 15500) < 1e-3
        assert abs(ctf.defocusV - 14000) < 1e-3

    def test_micrograph_nsubpiece_and_arma(self, tmp_path):
        d = str(tmp_path)
        rng = np.random.default_rng(2)
        mic = rng.standard_normal((256, 256)).astype(np.float32)
        Image(mic).write(d + "/mic.mrc")
        run_prog("ctf_estimate_from_micrograph",
                 f"--micrograph {d}/mic.mrc --oroot {d}/sub "
                 f"--pieceDim 128 --Nsubpiece 2 --dont_estimate_ctf")
        psd = np.squeeze(Image(d + "/sub.psd").data)
        assert psd.shape == (128, 128)
        assert np.all(np.isfinite(psd))
        run_prog("ctf_estimate_from_micrograph",
                 f"--micrograph {d}/mic.mrc --oroot {d}/arma "
                 f"--pieceDim 64 --psd_estimator ARMA --dont_estimate_ctf")
        psd = np.squeeze(Image(d + "/arma.psd").data)
        assert psd.shape == (64, 64)
        assert psd.min() > 0            # ARMA spectra are strictly positive
