"""Steerable filters (ops/steerable.py), fringe processing (ops/fringe.py)
and EM-PCA / z-scores / incremental PCA (models/dimred.py)."""
import numpy as np

from xmipp3_tpu.models.dimred import IncrementalPCA, empca, pca, pca_zscores
from xmipp3_tpu.ops.fringe import demodulate, spth
from xmipp3_tpu.ops.steerable import steerable_filter_3d


def test_empca_matches_svd_subspace():
    rng = np.random.default_rng(0)
    # low-rank + noise data
    W = rng.normal(size=(50, 3))
    H = rng.normal(size=(3, 40))
    X = W @ H + 0.01 * rng.normal(size=(50, 40))
    p_em, basis, mu = empca(X, d=3, n_iters=30, return_basis=True)
    _, model = pca(X, d=3, return_model=True), None
    Y_svd = pca(X, d=3)
    # subspaces agree: projections reproduce the same pairwise distances
    d_em = np.linalg.norm(p_em[:, None] - p_em[None, :], axis=-1)
    d_sv = np.linalg.norm(Y_svd[:, None] - Y_svd[None, :], axis=-1)
    assert np.corrcoef(d_em.ravel(), d_sv.ravel())[0, 1] > 0.999


def test_pca_zscores_flags_outliers():
    rng = np.random.default_rng(1)
    X = rng.normal(size=(100, 30))
    X[:95] = X[:95] @ (np.eye(30) * 0.1)          # inliers: tight cluster
    X[95:] *= 8.0                                 # 5 gross outliers
    z = pca_zscores(X, d=3, n_iters=20)
    worst = np.argsort(z)[-5:]
    assert set(worst) == set(range(95, 100))


def test_incremental_pca_matches_batch():
    rng = np.random.default_rng(2)
    X = rng.normal(size=(200, 25)) @ np.diag(np.linspace(3, 0.1, 25))
    ipca = IncrementalPCA(d=2)
    for i in range(0, 200, 50):
        ipca.partial_fit(X[i:i + 50])
    Yi = ipca.transform(X)
    Yb = pca(X, d=2)
    di = np.linalg.norm(Yi[:, None] - Yi[None, :], axis=-1)
    db = np.linalg.norm(Yb[:, None] - Yb[None, :], axis=-1)
    assert np.corrcoef(di.ravel(), db.ravel())[0, 1] > 0.99


def test_steerable_enhances_filament():
    # a filament along x must light up under the ridge filter, more than a
    # blob of the same mass does
    Z = Y = X = 32
    vol = np.zeros((Z, Y, X), np.float32)
    vol[16, 16, 6:26] = 1.0                       # filament along x
    out = np.asarray(steerable_filter_3d(vol, sigma=1.5, delta_ang=30.0,
                                         filter_type="ridge"))
    # response peaks on the filament: every interior filament voxel ranks in
    # the top percentile, and the on-axis mean dwarfs the background
    on_axis = out[16, 16, 10:22]
    assert (on_axis > np.percentile(out, 99)).all()
    bg = out[out < np.percentile(out, 95)]
    assert on_axis.mean() > 10 * abs(bg.mean())


def test_spth_quadrature():
    # SPTH of a horizontal cosine fringe is (up to direction phase) its sine
    H = W = 64
    x = np.arange(W)[None, :] * np.ones((H, 1))
    im = np.cos(2 * np.pi * 6 * x / W).astype(np.float32)
    q = np.asarray(spth(im))
    s = np.sin(2 * np.pi * 6 * x / W)
    inner = np.abs(q)[8:-8, 8:-8]
    assert np.allclose(inner, np.abs(s)[8:-8, 8:-8], atol=0.05)


def test_demodulate_recovers_envelope():
    # fringe with a Gaussian envelope: demodulate must return ~the envelope
    H = W = 128
    yy, xx = np.mgrid[0:H, 0:W]
    env = np.exp(-(((xx - W / 2) ** 2 + (yy - H / 2) ** 2) / (2 * 30.0 ** 2)))
    im = (env * np.cos(2 * np.pi * 10 * xx / W)).astype(np.float32)
    phase, mod = (np.asarray(v) for v in demodulate(im))
    inner = slice(20, -20)
    c = np.corrcoef(mod[inner, inner].ravel(), env[inner, inner].ravel())[0, 1]
    assert c > 0.95
