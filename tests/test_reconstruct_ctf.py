"""--useCTF per-frequency gridding inversion (VERDICT r4 Missing #1).

The reference multiplies every inserted Fourier sample by 1/CTF (clipped
at --minCTF, sign-preserved; fabs when --phaseFlipped) and folds the
modulator into the weights cube INSIDE the gridding loop
(reconstruct_fourier.cpp:576-625). These tests check (a) the batched CTF
evaluator against the scalar reference-parity evaluator, (b) the clip
branch logic against a numpy transliteration, and (c) end-to-end that
--useCTF reconstruction of signed-CTF-affected particles beats both no
correction and the scalar-weight (Wiener-style precorrect) pipeline —
the VERDICT done-criterion."""
import numpy as np
import pytest

from xmipp3_tpu.ops.ctf import (CTFDescription, ctf_params_arrays,
                                ctf_pure_batched, gridding_ctf_factors)


def _descs():
    return [
        CTFDescription(sampling_rate=2.0, voltage=300, Cs=2.7, Q0=0.07,
                       defocusU=12000, defocusV=12000, K=1.0),
        CTFDescription(sampling_rate=2.0, voltage=200, Cs=2.0, Q0=0.1,
                       defocusU=18000, defocusV=14000, azimuthal_angle=35.0,
                       K=1.2, espr=0.8, Ca=2.0, alpha=0.1),
        CTFDescription(sampling_rate=1.5, voltage=300, Cs=2.7, Q0=0.07,
                       defocusU=25000, defocusV=23000, azimuthal_angle=120.0,
                       K=0.9, phase_shift=1.2, VPP_radius=0.005),
    ]


class TestBatchedCTF:
    def test_matches_scalar_pure_at(self):
        """ctf_pure_batched == per-row pure_at (reference
        getValuePureNoKAt = K*getValuePureAt, data/ctf.h:499-502)."""
        descs = _descs()
        rng = np.random.default_rng(0)
        fx = rng.uniform(-0.25, 0.25, 512).astype(np.float32)
        fy = rng.uniform(-0.25, 0.25, 512).astype(np.float32)
        fx[0] = fy[0] = 0.0
        batched = np.asarray(ctf_pure_batched(fx, fy,
                                              ctf_params_arrays(descs)))
        for i, d in enumerate(descs):
            ref = np.asarray(d.pure_at(fx, fy))
            np.testing.assert_allclose(batched[i], ref, atol=1e-4)

    def test_params_from_rows(self):
        """ctf_params_arrays accepts metadata row dicts (inline ctf*
        labels) and CTFDescription objects interchangeably."""
        descs = _descs()
        rows = [{lbl: getattr(d, attr)
                 for attr, lbl in CTFDescription._MD_MAP.items()}
                for d in descs]
        a = ctf_params_arrays(descs)
        b = ctf_params_arrays(rows)
        for k in a:
            np.testing.assert_allclose(a[k], b[k])

    def test_gridding_factor_branches(self):
        """Clip logic transliteration (reconstruct_fourier.cpp:616-625):
        |c|>=minCTF -> (1/c, 1); |c|<minCTF -> (sgn c, |c|); NaN -> 0."""
        c = np.array([0.8, -0.5, 0.005, -0.003, np.nan, 0.0], np.float32)
        m_data, m_w = (np.asarray(x) for x in
                       gridding_ctf_factors(c, 0.01, False))
        np.testing.assert_allclose(m_data[:2], [1 / 0.8, 1 / -0.5],
                                   rtol=1e-6)
        np.testing.assert_allclose(m_w[:2], [1.0, 1.0])
        np.testing.assert_allclose(m_data[2:4], [1.0, -1.0])
        np.testing.assert_allclose(m_w[2:4], [0.005, 0.003], rtol=1e-6)
        assert m_data[4] == 0.0 and m_w[4] == 0.0
        assert m_data[5] == 0.0 and m_w[5] == 0.0   # sgn(0)=0, |0|=0
        # --phaseFlipped: fabs on the data factor only
        m_data_f, m_w_f = (np.asarray(x) for x in
                           gridding_ctf_factors(c, 0.01, True))
        np.testing.assert_allclose(m_data_f[:5], np.abs(m_data[:5]))
        np.testing.assert_allclose(m_w_f, m_w)


def _ctf_affect(projs, descs, Ts, phase_flip=False):
    """Apply each row's signed 2-D CTF in Fourier space (the forward model
    the reference inverts during gridding)."""
    N = projs.shape[-1]
    fy = np.fft.fftfreq(N).astype(np.float32)[:, None] / Ts
    fx = np.fft.rfftfreq(N).astype(np.float32)[None, :] / Ts
    out = np.empty_like(projs)
    for i, d in enumerate(descs):
        c = np.asarray(d.pure_at(fx, fy)).astype(np.float32)
        if phase_flip:
            c = np.abs(c)
        spec = np.fft.rfft2(projs[i]) * c
        out[i] = np.fft.irfft2(spec, s=(N, N)).astype(np.float32)
    return out


@pytest.mark.slow
class TestUseCTFGridding:
    @pytest.fixture(scope="class")
    def data(self):
        from tests.test_reconstruct_quality import _phantom_and_projections
        vol, projs, rot, tilt, psi = _phantom_and_projections(N=48, M=240,
                                                              seed=11)
        Ts = 2.0
        defs = np.asarray([9000, 14000, 21000], np.float32)[
            np.arange(len(projs)) % 3]
        descs = [CTFDescription(sampling_rate=Ts, voltage=300, Cs=2.7,
                                Q0=0.07, defocusU=float(d),
                                defocusV=float(d) * 0.92,
                                azimuthal_angle=30.0, K=1.0)
                 for d in defs]
        imgs = _ctf_affect(projs, descs, Ts)
        return vol, imgs, rot, tilt, psi, descs, Ts

    @staticmethod
    def _fsc_area(rec, vol, fmax=0.4):
        from xmipp3_tpu.ops.fsc import fsc_3d
        f, c = fsc_3d(rec, vol)
        f, c = np.asarray(f), np.asarray(c)
        return float(np.trapezoid(c[f <= fmax], f[f <= fmax]))

    def test_usectf_beats_uncorrected_and_scalar_weights(self, data):
        from xmipp3_tpu.ops.reconstruct import reconstruct_fourier
        vol, imgs, rot, tilt, psi, descs, Ts = data
        ctfp = ctf_params_arrays(descs)

        rec_ctf = np.asarray(reconstruct_fourier(
            imgs, rot, tilt, psi, interp="tri+kb", batch=64,
            ctfp=ctfp, sampling=Ts, min_ctf=0.05))
        rec_raw = np.asarray(reconstruct_fourier(
            imgs, rot, tilt, psi, interp="tri+kb", batch=64))
        # the scalar-weight route the divergence note used to point at:
        # per-image weight = mean CTF^2 (no per-frequency inversion)
        N = imgs.shape[-1]
        fy = np.fft.fftfreq(N).astype(np.float32)[:, None] / Ts
        fx = np.fft.rfftfreq(N).astype(np.float32)[None, :] / Ts
        wts = np.asarray([float((np.asarray(d.pure_at(fx, fy)) ** 2).mean())
                          for d in descs], np.float32)
        rec_sw = np.asarray(reconstruct_fourier(
            imgs, rot, tilt, psi, weights=wts, interp="tri+kb", batch=64))

        a_ctf = self._fsc_area(rec_ctf, vol)
        a_raw = self._fsc_area(rec_raw, vol)
        a_sw = self._fsc_area(rec_sw, vol)
        # per-frequency inversion must recover the phantom better than
        # both no correction and scalar weighting (signed CTF flips
        # phases past the first zero; only the inversion restores them)
        assert a_ctf > a_raw + 0.01
        assert a_ctf > a_sw + 0.01
        from xmipp3_tpu.ops.fsc import fsc_3d
        f, c = (np.asarray(x) for x in fsc_3d(rec_ctf, vol))
        assert float(c[f <= 0.25].min()) >= 0.95

    def test_phaseflipped_matches_abs_inversion(self, data):
        """--phaseFlipped on |CTF|-affected images reaches the same
        quality as signed inversion on signed images."""
        from xmipp3_tpu.ops.reconstruct import reconstruct_fourier
        vol, _, rot, tilt, psi, descs, Ts = data
        from tests.test_reconstruct_quality import _phantom_and_projections
        _, projs, *_ = _phantom_and_projections(N=48, M=240, seed=11)
        imgs_pf = _ctf_affect(projs, descs, Ts, phase_flip=True)
        ctfp = ctf_params_arrays(descs)
        rec_pf = np.asarray(reconstruct_fourier(
            imgs_pf, rot, tilt, psi, interp="tri+kb", batch=64,
            ctfp=ctfp, sampling=Ts, min_ctf=0.05, phase_flipped=True))
        a_pf = self._fsc_area(rec_pf, vol)
        assert a_pf > 0.3
        from xmipp3_tpu.ops.fsc import fsc_3d
        f, c = (np.asarray(x) for x in fsc_3d(rec_pf, vol))
        assert float(c[f <= 0.25].min()) >= 0.95

    def test_direct_kb_kernel_path_gets_ctf(self, data):
        """The kb (direct blob) interp path must honour ctfp too — it
        routes through the fused Pallas kernel on TPU and the tap loop on
        CPU; both consume the same (C,S) factor tables."""
        from xmipp3_tpu.ops.reconstruct import reconstruct_fourier
        vol, imgs, rot, tilt, psi, descs, Ts = data
        ctfp = ctf_params_arrays(descs)
        rec = np.asarray(reconstruct_fourier(
            imgs, rot, tilt, psi, interp="kb", batch=64,
            ctfp=ctfp, sampling=Ts, min_ctf=0.05))
        assert self._fsc_area(rec, vol) > 0.3


@pytest.mark.slow
class TestUseCTFCLI:
    def test_cli_usectf(self, tmp_path):
        """xmipp_reconstruct_fourier --useCTF with inline ctf* labels
        (reference hasCTF gate, reconstruct_fourier.cpp:335-336)."""
        from tests.test_reconstruct_quality import _phantom_and_projections
        from xmipp3_tpu.core.image import save_image, Image
        from xmipp3_tpu.core.metadata import MetaData
        from xmipp3_tpu.programs import get_program

        def run_program(name, args):
            prog = get_program(name)
            assert prog.run_with_args(args) == 0, f"{name} failed"
        vol, projs, rot, tilt, psi = _phantom_and_projections(N=32, M=90,
                                                              seed=3)
        Ts = 2.0
        defs = np.asarray([9000, 15000], np.float32)[np.arange(len(projs)) % 2]
        descs = [CTFDescription(sampling_rate=Ts, voltage=300, Cs=2.7,
                                Q0=0.07, defocusU=float(d),
                                defocusV=float(d), K=1.0) for d in defs]
        imgs = _ctf_affect(projs, descs, Ts)
        stk = str(tmp_path / "parts.stk")
        save_image(stk, imgs)
        rows = []
        for i in range(len(imgs)):
            row = {"image": f"{i + 1}@{stk}", "angleRot": float(rot[i]),
                   "angleTilt": float(tilt[i]), "anglePsi": float(psi[i])}
            row.update({lbl: float(getattr(descs[i], attr))
                        for attr, lbl in CTFDescription._MD_MAP.items()})
            rows.append(row)
        md = MetaData.fromRows(rows)
        fn_md = str(tmp_path / "parts.xmd")
        md.write(fn_md)
        out = str(tmp_path / "rec.vol")
        run_program("reconstruct_fourier",
                    ["-i", fn_md, "-o", out, "--useCTF", "--sampling",
                     str(Ts), "--minCTF", "0.05", "--interp", "tri+kb"])
        rec = np.squeeze(Image(out).data)
        out2 = str(tmp_path / "rec_noctf.vol")
        run_program("reconstruct_fourier",
                    ["-i", fn_md, "-o", out2, "--interp", "tri+kb"])
        rec2 = np.squeeze(Image(out2).data)
        cc = np.corrcoef(rec.ravel(), vol.ravel())[0, 1]
        cc2 = np.corrcoef(rec2.ravel(), vol.ravel())[0, 1]
        assert cc > cc2 + 0.005
        assert cc > 0.97
