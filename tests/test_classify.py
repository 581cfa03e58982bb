"""Classification tests: CL2D, ML2D, SOM on synthetic two/three-class data."""
import numpy as np
import pytest

from xmipp3_tpu.models.cl2d import classify_cl2d
from xmipp3_tpu.models.ml2d import ml2d
from xmipp3_tpu.models.som import kerdensom, som


def two_class_stack(n_per=20, size=48, seed=0, noise=0.5, max_pose=True):
    from xmipp3_tpu.ops.fourier_filter import apply_fourier_mask_2d, band_pass_mask
    from xmipp3_tpu.ops.geo import apply_alignment_2d
    rng = np.random.default_rng(seed)
    y, x = np.mgrid[0:size, 0:size].astype(np.float32)
    r = np.sqrt((y - size // 2) ** 2 + (x - size // 2) ** 2)
    apod = np.clip(1.5 - r / (size // 2 - 2), 0, 1)
    protos = []
    for s in (1, 2):
        p = rng.standard_normal((size, size)).astype(np.float32)
        p = np.asarray(apply_fourier_mask_2d(p, band_pass_mask(size, size,
                                                               0.05, 0.2)))
        protos.append((p * apod).astype(np.float32))
    imgs, labels = [], []
    for k, proto in enumerate(protos):
        for i in range(n_per):
            if max_pose:
                psi = rng.uniform(-180, 180)
                sx, sy = rng.uniform(-3, 3, 2)
            else:
                psi, sx, sy = 0.0, 0.0, 0.0
            img = np.asarray(apply_alignment_2d(
                proto[None], np.float32([psi]), np.float32([sx]),
                np.float32([sy])))[0]
            img = img + noise * proto.std() * rng.standard_normal(
                (size, size)).astype(np.float32)
            imgs.append(img)
            labels.append(k)
    order = rng.permutation(len(imgs))
    return np.stack(imgs)[order], np.array(labels)[order]


def purity(assign, labels):
    """Best-case accuracy over label permutations (2 classes)."""
    a = (assign == assign[0]).astype(int)
    l = (labels == labels[0]).astype(int)
    return max((a == l).mean(), (a != l).mean())


def test_cl2d_separates_two_classes():
    imgs, labels = two_class_stack()
    res = classify_cl2d(imgs, n_refs=2, n_iters=8, max_shift=4)
    p = purity(res["assignments"], labels)
    assert p > 0.9, f"purity {p}"


def test_ml2d_separates_two_classes():
    imgs, labels = two_class_stack(noise=0.3)
    res = ml2d(imgs, n_refs=2, n_iters=8, max_shift=4)
    p = purity(res["assignments"], labels)
    assert p > 0.85, f"purity {p}"
    assert res["loglike"][-1] >= res["loglike"][0]


def test_som_clusters_gaussians():
    rng = np.random.default_rng(0)
    c1 = rng.standard_normal((40, 5)) + np.array([5, 0, 0, 0, 0])
    c2 = rng.standard_normal((40, 5)) - np.array([5, 0, 0, 0, 0])
    X = np.vstack([c1, c2])
    code, assign = som(X, (2, 2), n_iters=100)
    # units should separate the two clusters
    a1 = set(assign[:40])
    a2 = set(assign[40:])
    assert not (a1 & a2)


def test_kerdensom_runs_and_separates():
    rng = np.random.default_rng(1)
    c1 = rng.standard_normal((30, 4)) + 4
    c2 = rng.standard_normal((30, 4)) - 4
    X = np.vstack([c1, c2])
    code, assign = kerdensom(X, (2, 2), n_iters=40, reg0=10, regF=0.1)
    assert not (set(assign[:30]) & set(assign[30:]))


def test_cl2d_program(tmp_path):
    from xmipp3_tpu.core.image import save_image
    from xmipp3_tpu.core.metadata import MetaData
    from xmipp3_tpu.programs import get_program
    imgs, labels = two_class_stack(n_per=12)
    fn = str(tmp_path / "parts.mrcs")
    save_image(fn, imgs)
    prog = get_program("classify_CL2D")
    rc = prog.run_with_args(f"-i {fn} --odir {tmp_path} --oroot cl "
                            f"--nref 2 --iter 6 -v 0")
    assert rc == 0
    md = MetaData(str(tmp_path / "cl_images.xmd"))
    assert md.size() == len(imgs)
    p = purity(md.getColumn("ref"), labels)
    assert p > 0.85
    md_c = MetaData(str(tmp_path / "cl_classes.xmd"))
    assert md_c.size() == 2


def test_ml2d_true_loglik_monotone_4class():
    """VERDICT #5 exit criterion: the TRUE data log-likelihood increases
    (EM-monotone up to top-K truncation) on a synthetic 4-class set and
    classes are recovered (reference ml_align2d.cpp:700-926)."""
    rng = np.random.default_rng(3)
    n, B = 32, 48
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
    protos = [
        np.exp(-(x ** 2 + y ** 2) / 30),
        np.exp(-((x - 6) ** 2 + y ** 2) / 18) +
        np.exp(-((x + 6) ** 2 + y ** 2) / 18),
        np.exp(-(x ** 2 / 60 + y ** 2 / 8)),
        np.exp(-((x) ** 2 + (y - 5) ** 2) / 12) +
        np.exp(-(x ** 2 + (y + 5) ** 2) / 40),
    ]
    labels = rng.integers(0, 4, B)
    imgs = np.stack([protos[c] for c in labels]).astype(np.float32)
    imgs += 0.15 * rng.standard_normal(imgs.shape).astype(np.float32)

    from xmipp3_tpu.models.ml2d import ml2d
    out = ml2d(imgs, 4, n_iters=8, max_shift=2, seed=0)
    ll = np.asarray(out["loglike"])
    assert ll[-1] > ll[0]
    # near-monotone: no decrease beyond tiny truncation noise
    dips = np.diff(ll) < -1e-3 * np.abs(ll[:-1])
    assert dips.sum() == 0, f"LL decreased: {ll}"
    # class recovery: majority label purity over the 4 found classes
    assign = out["assignments"]
    purity = 0
    for k in range(4):
        sel = assign == k
        if sel.sum():
            vals, counts = np.unique(labels[sel], return_counts=True)
            purity += counts.max()
    assert purity / B >= 0.7


def test_mlf2d_noise_model_runs_and_recovers():
    rng = np.random.default_rng(4)
    n, B = 32, 32
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
    protos = [np.exp(-(x ** 2 + y ** 2) / 30),
              np.exp(-(x ** 2 / 60 + y ** 2 / 8))]
    labels = rng.integers(0, 2, B)
    imgs = np.stack([protos[c] for c in labels]).astype(np.float32)
    imgs += 0.2 * rng.standard_normal(imgs.shape).astype(np.float32)
    from xmipp3_tpu.models.ml2d import ml2d
    out = ml2d(imgs, 2, n_iters=6, max_shift=2, seed=0,
               fourier_noise_model=True)
    assign = out["assignments"]
    purity = 0
    for k in range(2):
        sel = assign == k
        if sel.sum():
            vals, counts = np.unique(labels[sel], return_counts=True)
            purity += counts.max()
    assert purity / B >= 0.85


def test_som_family_and_codebook():
    """batch_som / fcmeans / fuzzy_som + CodeBook (reference
    classification/batch_som, fcmeans, fuzzy_som, code_book)."""
    from xmipp3_tpu.models.som import CodeBook, batch_som, fcmeans, fuzzy_som
    rng = np.random.default_rng(0)
    X = np.concatenate([rng.normal(0, 0.4, (60, 5)),
                        rng.normal(3, 0.4, (60, 5))])
    labels = np.array([0] * 60 + [1] * 60)
    for fn in (lambda: batch_som(X, (2, 2)),
               lambda: fcmeans(X, 4),
               lambda: fuzzy_som(X, (2, 2))):
        code, u = fn()
        a = u if u.ndim == 1 else u.argmax(axis=1)
        pur = sum(np.bincount(labels[a == k]).max()
                  for k in np.unique(a))
        assert pur / len(X) > 0.9
        cb = CodeBook(code)
        assert cb.histogram(X).sum() == len(X)
        assert cb.quantization_error(X) < 2.0
