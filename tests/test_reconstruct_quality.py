"""FSC parity of the gridding reconstruction against an analytic phantom.

The reference validates reconstruct_fourier through golden volumes; here the
ground truth is analytic (Gaussian blobs have closed-form projections along
any direction), so the test is self-contained: project analytically, grid
back with each interpolation window, and demand FSC >= 0.99 up to Nyquist/2
(VERDICT round-1 exit criterion; reference blob scatter
reconstruct_fourier.cpp:690-790, finishComputations :1103-1180)."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.ops.fsc import fsc_3d
from xmipp3_tpu.ops.reconstruct import reconstruct_fourier


def _phantom_and_projections(N, M, seed=0):
    rng = np.random.default_rng(seed)
    blobs = [(0, 0, 0, N * 0.09, 1.0), (N * 0.12, -N * 0.09, N * 0.08,
                                        N * 0.05, 0.9),
             (-N * 0.11, N * 0.08, -N * 0.06, N * 0.03, 0.8),
             (-N * 0.16, -N * 0.12, N * 0.03, N * 0.022, 1.0),
             (N * 0.08, N * 0.14, -N * 0.14, N * 0.019, 1.1)]
    z, y, x = np.mgrid[0:N, 0:N, 0:N].astype(np.float64)
    z -= N // 2
    y -= N // 2
    x -= N // 2
    vol = np.zeros((N, N, N))
    for cz, cy, cx, s, a in blobs:
        vol += a * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                          / (2 * s ** 2))
    rot = rng.uniform(0, 360, M).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, M))).astype(np.float32)
    psi = rng.uniform(0, 360, M).astype(np.float32)
    A = np.asarray(euler_matrix(rot, tilt, psi), np.float64)
    yy, xx = np.mgrid[0:N, 0:N].astype(np.float64)
    yy -= N // 2
    xx -= N // 2
    projs = np.zeros((M, N, N), np.float32)
    for cz, cy, cx, s, a in blobs:
        c = np.array([cx, cy, cz])
        u = A[:, 0, :] @ c       # in-plane center = (A[0]·c, A[1]·c)
        v = A[:, 1, :] @ c
        amp = a * s * np.sqrt(2 * np.pi)
        projs += (amp * np.exp(-(((xx[None] - u[:, None, None]) ** 2
                                  + (yy[None] - v[:, None, None]) ** 2)
                                 / (2 * s ** 2)))).astype(np.float32)
    return vol, projs, rot, tilt, psi


def _fsc_min(rec, vol, fmax):
    freqs, fsc = fsc_3d(rec, vol)
    freqs, fsc = np.asarray(freqs), np.asarray(fsc)
    return float(fsc[freqs <= fmax].min())


class TestGriddingQuality:
    @pytest.fixture(scope="class")
    def data(self):
        return _phantom_and_projections(N=48, M=240)

    def test_trilinear_fsc(self, data):
        vol, projs, rot, tilt, psi = data
        rec = np.asarray(reconstruct_fourier(projs, rot, tilt, psi,
                                             interp="tri"))
        assert _fsc_min(rec, vol, 0.25) >= 0.99
        rel = np.linalg.norm(rec - vol) / np.linalg.norm(vol)
        assert rel < 0.08

    def test_kaiser_bessel_fsc(self, data):
        vol, projs, rot, tilt, psi = data
        rec = np.asarray(reconstruct_fourier(projs, rot, tilt, psi,
                                             interp="kb", batch=64))
        assert _fsc_min(rec, vol, 0.25) >= 0.99
        # the KB window must beat trilinear in the outer shells
        rec_tri = np.asarray(reconstruct_fourier(projs, rot, tilt, psi,
                                                 interp="tri"))
        assert _fsc_min(rec, vol, 0.45) >= _fsc_min(rec_tri, vol, 0.45) - 1e-3
        rel = np.linalg.norm(rec - vol) / np.linalg.norm(vol)
        assert rel < 0.07

    def test_weight_correction_iterations_converge(self, data):
        """Pipe-Menon iterations must not degrade the reconstruction
        (reference correctWeight, reconstruct_fourier.cpp:1056-1101)."""
        vol, projs, rot, tilt, psi = data
        r1 = np.asarray(reconstruct_fourier(projs, rot, tilt, psi,
                                            interp="kb", batch=64,
                                            niter_weight=1))
        r3 = np.asarray(reconstruct_fourier(projs, rot, tilt, psi,
                                            interp="kb", batch=64,
                                            niter_weight=3))
        f1 = _fsc_min(r1, vol, 0.25)
        f3 = _fsc_min(r3, vol, 0.25)
        assert f3 >= f1 - 5e-3
