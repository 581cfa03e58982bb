"""core/funcs.py (histograms, distributions, Otsu, Zernike2D),
ops/basis.py (Kaiser-Bessel blobs, grids, blob<->voxel), models/svm.py and
the SVM picking stage, PIF codec roundtrip."""
import numpy as np
import pytest

from xmipp3_tpu.core.funcs import (Histogram1D, cdf_gauss, gaussian1d,
                                   icdf_gauss, otsu_threshold, tstudent1d,
                                   zernike2d)
from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.basis import (Blob, blob_footprint, blobs_to_voxels,
                                  grid_points, kaiser_fourier_value,
                                  kaiser_value, voxels_to_blobs)


def test_distributions():
    x = np.linspace(-40, 40, 8001)
    # densities integrate to 1 (t-dist has heavy tails: wide range needed)
    for pdf in (gaussian1d(x), tstudent1d(x, df=5)):
        assert abs(np.trapezoid(pdf, x) - 1) < 1e-3
    # cdf/icdf inverses
    p = np.array([0.025, 0.5, 0.975])
    np.testing.assert_allclose(cdf_gauss(icdf_gauss(p)), p, atol=1e-9)
    assert abs(icdf_gauss(0.975) - 1.959964) < 1e-4


def test_histogram_percentil_otsu():
    rng = np.random.default_rng(0)
    data = np.concatenate([rng.normal(0, 1, 5000), rng.normal(10, 1, 5000)])
    h = Histogram1D(data, nbins=512)
    assert abs(h.percentil(25) - 0.0) < 1.0       # first mode
    assert abs(h.percentil(75) - 10.0) < 1.0      # second mode
    thr = otsu_threshold(data)
    assert 3.0 < thr < 7.0                        # separates the two modes
    assert h.entropy() > 0


def test_zernike2d_orthogonality():
    n = 128
    y, x = np.mgrid[0:n, 0:n]
    rho = np.sqrt((x - n / 2) ** 2 + (y - n / 2) ** 2) / (n / 2)
    theta = np.arctan2(y - n / 2, x - n / 2)
    inside = rho <= 1.0
    z20 = zernike2d(2, 0, rho, theta)
    z22 = zernike2d(2, 2, rho, theta)
    z40 = zernike2d(4, 0, rho, theta)
    # distinct polynomials are orthogonal over the disk
    for a, b in [(z20, z22), (z20, z40), (z22, z40)]:
        dot = (a * b)[inside].sum()
        norm = np.sqrt((a ** 2)[inside].sum() * (b ** 2)[inside].sum())
        assert abs(dot) / norm < 0.02


def test_blob_profile():
    # b(0)=1 by normalization, b(a)=0, monotone decreasing
    assert kaiser_value(0.0) == pytest.approx(1.0)
    assert kaiser_value(2.0) == pytest.approx(0.0, abs=1e-12)
    r = np.linspace(0, 2, 50)
    v = kaiser_value(r)
    assert (np.diff(v) <= 1e-9).all()
    # Fourier transform is finite, positive at DC and decays
    fv = kaiser_fourier_value(np.array([0.0, 0.1, 0.3, 0.5]))
    assert fv[0] > fv[1] > abs(fv[3])


def test_grids():
    cc = grid_points("cc", 8, 2.0)
    bcc = grid_points("bcc", 8, 2.0)
    fcc = grid_points("fcc", 8, 2.0)
    assert len(cc) == 5 ** 3
    assert len(bcc) > len(cc)
    assert len(fcc) > len(bcc)


def test_blob_voxel_roundtrip():
    # voxelize known coefficients on a coarse BCC grid, then re-fit them
    pts = grid_points("bcc", 12, 4.0)
    rng = np.random.default_rng(1)
    coeffs = rng.normal(0, 1, len(pts))
    vol = blobs_to_voxels(coeffs, pts, Blob(), 16)
    fitted = voxels_to_blobs(vol, pts, Blob(), n_iters=20, lam=0.8)
    # overlapping blobs are not orthogonal, so compare reprojected volumes
    vol2 = blobs_to_voxels(fitted, pts, Blob(), 16)
    c = np.corrcoef(vol.ravel(), vol2.ravel())[0, 1]
    assert c > 0.99


def test_svm_picking_stage(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(2)
    yy, xx = np.mgrid[0:24, 0:24] - 12
    blob = -np.exp(-((xx ** 2 + yy ** 2) / 18.0))
    pos = np.stack([blob * rng.uniform(0.8, 1.2)
                    + rng.normal(0, 0.25, (24, 24)) for _ in range(24)])
    neg = rng.normal(0, 0.25, (24, 24, 24))
    Image(pos.astype(np.float32)).write(f"{d}/pos.mrcs")
    Image(neg.astype(np.float32)).write(f"{d}/neg.mrcs")
    for nm in ("pos", "neg"):
        MetaData.fromRows([{"image": f"{i+1:06d}@{d}/{nm}.mrcs"}
                           for i in range(24)]).write(f"{d}/{nm}.xmd")
    from xmipp3_tpu.programs import get_program
    tr = get_program("micrograph_automatic_picking")
    tr.read(["xmipp_micrograph_automatic_picking", "-i", f"{d}/pos.mrcs",
             "-o", f"{d}/dummy.xmd", "--particleSize", "24", "--trainSVM",
             "--svm", f"{d}/svm.npz", "--trainPos", f"{d}/pos.xmd",
             "--trainNeg", f"{d}/neg.xmd"])
    tr.run()
    assert tr.train_accuracy > 0.95
    # micrograph with 6 particles; SVM stage must reject noise peaks
    H = W = 240
    mic = rng.normal(0, 0.25, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    truth = [(40, 40), (200, 60), (120, 120), (60, 180), (180, 200),
             (90, 210)]
    for (x, y) in truth:
        mic -= np.exp(-(((xx - x) ** 2 + (yy - y) ** 2) / 18.0)
                      ).astype(np.float32)
    Image(mic).write(f"{d}/mic.mrc")
    pk = get_program("micrograph_automatic_picking")
    pk.read(["xmipp_micrograph_automatic_picking", "-i", f"{d}/mic.mrc",
             "-o", f"{d}/picks.xmd", "--particleSize", "24",
             "--thr", "1.0", "--svm", f"{d}/svm.npz"])
    pk.run()
    md = MetaData(f"{d}/picks.xmd")
    pts = np.stack([np.asarray(md.getColumn("xcoor"), float),
                    np.asarray(md.getColumn("ycoor"), float)], 1)
    t = np.asarray(truth, float)
    dd = np.linalg.norm(pts[:, None] - t[None], axis=-1).min(axis=1)
    # the low threshold lets noise candidates through; the SVM must keep
    # the real particles and reject (most of) the rest
    assert (dd < 6).sum() >= 5
    assert (dd >= 6).sum() <= 2


def test_pif_roundtrip(tmp_path):
    rng = np.random.default_rng(3)
    data = rng.normal(size=(4, 20, 24)).astype(np.float32)
    fn = str(tmp_path / "x.pif")
    Image(data).write(fn)
    back = Image(fn)
    assert back.data.shape == (4, 20, 24)
    # int16-scaled storage: relative error bounded by the scale quantum
    assert np.abs(back.data - data).max() < np.abs(data).max() / 16000
    s2 = Image(f"2@{fn}")
    np.testing.assert_allclose(np.squeeze(s2.data), back.data[1])


def test_rbf_svm_nonlinear_separation():
    """RBF (random-Fourier-feature) SVM separates a circularly-separable
    set a linear SVM cannot (reference libsvm C-SVC role,
    classification/svm_classifier.h)."""
    from xmipp3_tpu.models.svm import GaussianNB, LinearSVM, RBFSVM
    rng = np.random.default_rng(0)
    r_in = rng.uniform(0, 1, 120)
    r_out = rng.uniform(2, 3, 120)
    th = rng.uniform(0, 2 * np.pi, 240)
    X = np.stack([np.concatenate([r_in, r_out]) * np.cos(th),
                  np.concatenate([r_in, r_out]) * np.sin(th)], axis=1)
    y = np.concatenate([np.ones(120), np.zeros(120)])
    rbf = RBFSVM(n_features=128).fit(X, y)
    acc_rbf = ((np.asarray(rbf.predict(X)) > 0).astype(int) == y).mean()
    lin = LinearSVM().fit(X, y)
    acc_lin = (lin.predict(X) == y).mean()
    assert acc_rbf > 0.95
    assert acc_rbf > acc_lin + 0.2
    # round-trip
    import tempfile, os
    d = tempfile.mkdtemp()
    rbf.save(d + "/m")
    rbf2 = RBFSVM.load(d + "/m")
    assert np.allclose(rbf2.decision(X), rbf.decision(X))
    nb = GaussianNB().fit(X, y)
    assert (nb.predict(X) == y).mean() > 0.8   # radial var differs by class
