"""Projection + reconstruction consistency tests (the phantom-based strategy
the reference uses: analytic phantoms with exact projections, SURVEY.md §2.1
phantom.{h,cpp})."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.core.sampling import Sampling, compute_sampling_points
from xmipp3_tpu.core.sym import SymList, symmetry_matrices
from xmipp3_tpu.ops.fsc import fsc_3d, fsc_resolution
from xmipp3_tpu.ops.project import (FourierProjector, project_real_space)
from xmipp3_tpu.ops.reconstruct import reconstruct_fourier


# ---------------------------------------------------------------------------
# gaussian-blob phantom with analytic projections
# ---------------------------------------------------------------------------

BLOBS = [  # (cz, cy, cx, sigma, amplitude) in centered coords
    (0.0, 0.0, 0.0, 3.0, 1.0),
    (6.0, -4.0, 5.0, 2.0, 0.8),
    (-5.0, 5.0, -3.0, 2.5, 0.6),
    (3.0, 6.0, -6.0, 1.8, 0.9),
]


def make_phantom(n=48):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for cz, cy, cx, s, a in BLOBS:
        vol += a * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                          / (2 * s ** 2))
    return vol


def analytic_projection(n, rot, tilt, psi):
    """Exact projection of the gaussian phantom at a ZYZ pose."""
    A = np.asarray(euler_matrix(rot, tilt, psi), np.float64)
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    y, x = y - n // 2, x - n // 2
    img = np.zeros((n, n), np.float64)
    for cz, cy, cx, s, a in BLOBS:
        c = np.array([cx, cy, cz])
        px, py = A[0] @ c, A[1] @ c
        img += (a * s * np.sqrt(2 * np.pi) *
                np.exp(-((x - px) ** 2 + (y - py) ** 2) / (2 * s ** 2)))
    return img.astype(np.float32)


def norm_corr(a, b):
    a, b = a - a.mean(), b - b.mean()
    return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))


# ---------------------------------------------------------------------------

def test_fourier_projector_matches_analytic():
    n = 48
    vol = make_phantom(n)
    proj = FourierProjector(vol, pad_factor=2.0)
    poses = [(0, 0, 0), (30, 60, 0), (-45, 90, 20), (120, 140, -60)]
    rots, tilts, psis = (np.array(v, np.float32) for v in zip(*poses))
    imgs = np.asarray(proj.project_euler(rots, tilts, psis))
    for i, (r, t, p) in enumerate(poses):
        ref = analytic_projection(n, r, t, p)
        assert norm_corr(imgs[i], ref) > 0.995, f"pose {i}"
        # amplitude parity too, not just correlation
        assert np.abs(imgs[i] - ref).max() < 0.12 * ref.max(), f"pose {i}"


def test_real_space_projector_matches_analytic():
    n = 48
    vol = make_phantom(n)
    imgs = np.asarray(project_real_space(vol, [30.0], [60.0], [0.0]))
    ref = analytic_projection(n, 30.0, 60.0, 0.0)
    assert norm_corr(imgs[0], ref) > 0.99


def test_projector_with_shift():
    n = 48
    vol = make_phantom(n)
    proj = FourierProjector(vol)
    base = np.asarray(proj.project_euler([30.0], [60.0], [0.0]))[0]
    shifted = np.asarray(proj.project_euler(
        [30.0], [60.0], [0.0], shifts=np.array([[3.0, -2.0]], np.float32)))[0]
    np.testing.assert_allclose(shifted, np.roll(base, (-2, 3), axis=(0, 1)),
                               atol=0.05 * base.max())


def test_reconstruction_roundtrip():
    n = 48
    vol = make_phantom(n)
    proj = FourierProjector(vol, pad_factor=2.0)
    # quasi-even angular coverage
    angles = compute_sampling_points(9.0)
    rng = np.random.default_rng(0)
    psis = rng.uniform(-180, 180, len(angles)).astype(np.float32)
    imgs = np.asarray(proj.project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        psis))
    rec = np.asarray(reconstruct_fourier(
        imgs, angles[:, 0], angles[:, 1], psis, pad_factor=2.0, batch=128))
    assert rec.shape == vol.shape
    c = norm_corr(rec, vol)
    assert c > 0.98, f"reconstruction correlation {c}"
    freqs, fsc = fsc_3d(rec, vol)
    fsc = np.asarray(fsc)
    # good agreement to at least half Nyquist
    assert (fsc[: len(fsc) // 2] > 0.9).all()


def test_reconstruction_with_shifts_corrected():
    n = 48
    vol = make_phantom(n)
    proj = FourierProjector(vol)
    angles = compute_sampling_points(12.0)
    rng = np.random.default_rng(1)
    psis = np.zeros(len(angles), np.float32)
    sx = rng.uniform(-3, 3, len(angles)).astype(np.float32)
    sy = rng.uniform(-3, 3, len(angles)).astype(np.float32)
    # generate shifted particles (as if picked off-center)
    imgs = np.asarray(proj.project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        psis, shifts=np.stack([-sx, -sy], axis=1)))
    # reconstruct giving the registration shifts
    rec = np.asarray(reconstruct_fourier(
        imgs, angles[:, 0], angles[:, 1], psis, sx=sx, sy=sy, batch=128))
    c = norm_corr(rec, vol)
    assert c > 0.97, f"corr with shift correction {c}"


def test_symmetry_matrices_counts():
    assert symmetry_matrices("c1").shape == (1, 3, 3)
    assert symmetry_matrices("c6").shape == (6, 3, 3)
    assert symmetry_matrices("d7").shape == (14, 3, 3)
    assert symmetry_matrices("t").shape == (12, 3, 3)
    assert symmetry_matrices("o").shape == (24, 3, 3)
    assert symmetry_matrices("i1").shape == (60, 3, 3)
    assert symmetry_matrices("i2").shape == (60, 3, 3)
    # all proper rotations
    for s in ("c6", "d7", "t", "o", "i2"):
        mats = symmetry_matrices(s)
        dets = np.linalg.det(mats)
        np.testing.assert_allclose(dets, 1.0, atol=1e-4)


def test_symmetric_reconstruction_c4():
    """A C4-symmetric phantom reconstructed with --sym c4 from a quarter of
    the views matches the full reconstruction."""
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for ang in (0, 90, 180, 270):
        a = np.deg2rad(ang)
        cx, cy = 8 * np.cos(a), 8 * np.sin(a)
        vol += np.exp(-((x - cx) ** 2 + (y - cy) ** 2 + z ** 2) / (2 * 2.0 ** 2))
    proj = FourierProjector(vol)
    angles = compute_sampling_points(10.0)
    # use only rot in [0,90) — a quarter of the sphere
    keep = (angles[:, 0] >= 0) & (angles[:, 0] < 90)
    sub = angles[keep]
    imgs = np.asarray(proj.project_euler(
        sub[:, 0].astype(np.float32), sub[:, 1].astype(np.float32),
        np.zeros(len(sub), np.float32)))
    rec = np.asarray(reconstruct_fourier(
        imgs, sub[:, 0], sub[:, 1], np.zeros(len(sub)), sym="c4", batch=64))
    c = norm_corr(rec, vol)
    assert c > 0.9, f"c4 sym reconstruction corr {c}"


def test_sampling_even_and_pruned():
    s = Sampling(10.0, "c1")
    assert 350 < len(s) < 500  # ~4pi/(rate^2) directions
    s4 = Sampling(10.0, "c4")
    assert len(s4) < len(s) * 0.45  # pruned to ~1/4
    d = s.directions
    np.testing.assert_allclose(np.linalg.norm(d, axis=1), 1.0, atol=1e-6)


def test_fsc_identical_volumes():
    vol = make_phantom(32)
    freqs, fsc = fsc_3d(vol, vol)
    np.testing.assert_allclose(np.asarray(fsc), 1.0, atol=1e-4)
    assert fsc_resolution(freqs, np.asarray(fsc), sampling=1.0) == 2.0


def test_fsc_noise_uncorrelated():
    rng = np.random.default_rng(0)
    a = rng.standard_normal((32, 32, 32)).astype(np.float32)
    b = rng.standard_normal((32, 32, 32)).astype(np.float32)
    _, fsc = fsc_3d(a, b)
    assert np.abs(np.asarray(fsc)[5:]).mean() < 0.1


def test_art_parallel_modes():
    """Reference ARTParallelMode family (basic_art.h:92) + POCS: every
    mode converges on a small phantom; positivity holds."""
    from xmipp3_tpu.core.geometry import euler_matrix
    from xmipp3_tpu.ops.art import art_reconstruct
    rng = np.random.default_rng(0)
    n, M = 24, 60
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float64) - n // 2
    vol = np.exp(-((x - 2) ** 2 + y ** 2 + (z + 1) ** 2) / 8)
    rot = rng.uniform(0, 360, M).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, M))).astype(np.float32)
    psi = rng.uniform(0, 360, M).astype(np.float32)
    A = np.asarray(euler_matrix(rot, tilt, psi), np.float64)
    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64) - n // 2
    c = np.array([2.0, 0.0, -1.0])
    u = A[:, 0, :] @ c
    v = A[:, 1, :] @ c
    s = np.sqrt(8 / 2.0)
    projs = (s * np.sqrt(2 * np.pi) * np.exp(
        -(((xx[None] - u[:, None, None]) ** 2 +
           (yy[None] - v[:, None, None]) ** 2) / 8))).astype(np.float32)
    ncc_by_mode = {}
    for mode in ("SIRT", "pSIRT", "pSART", "pBiCAV", "pCAV", "pAVSP",
                 "pfSIRT"):
        rec, hist = art_reconstruct(projs, rot, tilt, psi, mode=mode,
                                    n_iters=3, lambda_list=[0.5],
                                    positivity=True, block_size=15)
        assert np.isfinite(rec).all()
        assert rec.min() >= 0.0          # POCS positivity
        a = vol - vol.mean()
        b = rec - rec.mean()
        ncc = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        ncc_by_mode[mode] = ncc
        assert ncc > 0.9, (mode, ncc)
        assert hist[-1] <= hist[0] + 1e-6
    # sequential ART (block_size=1) on a reduced set stays finite/positive
    rec, _ = art_reconstruct(projs[:10], rot[:10], tilt[:10], psi[:10],
                             mode="ART", n_iters=1, lambda_list=[0.2],
                             positivity=True)
    assert np.isfinite(rec).all() and rec.min() >= 0.0
