"""Golden tests for ops/features.py: each vectorized extractor is compared
against a direct (loop-level) transliteration of the reference algorithm
(classify_extract_features.cpp), plus CLI coverage of the new flags."""
import numpy as np
import pytest

from xmipp3_tpu.ops import features as F


def rng_imgs(b=3, n=36, seed=0):
    rng = np.random.default_rng(seed)
    return rng.standard_normal((b, n, n)).astype(np.float32)


# ---------------------------------------------------------- entropy

def np_hist_entropy(x):
    m, M = x.min(), x.max()
    idx = np.floor((x - m) * 255.0 / (M - m)).astype(int).clip(0, 255)
    hist = np.bincount(idx.ravel(), minlength=256)
    h = np.maximum(hist, 1)
    return -np.sum(h * np.log2(h))


def np_circ(n, radius):
    y, x = np.mgrid[0:n, 0:n] - n // 2
    return (np.sqrt(x * x + y * y) <= radius).astype(int)


def test_entropy_matches_transliteration():
    imgs = rng_imgs(2, 64)
    got = np.asarray(F.extract_entropy(imgs))
    n = 64
    wave, step = n // 2, n // 32
    for b in range(2):
        x = imgs[b]
        exp = [np_hist_entropy(x)]
        wv = wave
        for _ in range(5):
            mask = (2 * np_circ(n, wv - step) - np_circ(n, wv)
                    - np_circ(n, wv - 2 * step))
            exp.append(np_hist_entropy(np.where(mask != 0, x, 0.0)))
            wv -= step
        np.testing.assert_allclose(got[b], exp, rtol=1e-5)


# ---------------------------------------------------------- granulo

def np_granulo(I):
    m, M = I.min(), I.max()
    H, W = I.shape
    fv = []
    for N in range(1, 7):
        se = [(dy, dx) for dy in range(-N, N + 1) for dx in range(-N, N + 1)
              if dx * dx + dy * dy <= N * N]
        G = np.empty_like(I)
        for y in range(H):
            for x in range(W):
                v = M
                for dy, dx in se:
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        v = min(v, I[yy, xx])
                G[y, x] = v
        s = 0.0
        for y in range(H):
            for x in range(W):
                v = m
                for dy, dx in se:
                    yy, xx = y + dy, x + dx
                    if 0 <= yy < H and 0 <= xx < W:
                        v = max(v, G[yy, xx])
                s += v
        fv.append(s)
    return np.array(fv)


def test_granulo_matches_transliteration():
    imgs = rng_imgs(1, 18)
    got = np.asarray(F.extract_granulo(imgs))
    np.testing.assert_allclose(got[0], np_granulo(imgs[0]), rtol=1e-4)


# --------------------------------------------------------- histdist

def np_histdist(I):
    H, W = I.shape
    ph, pw = H // 3, W // 3
    fv = []
    for yy in range(3):
        for xx in range(3):
            part = I[yy * ph:(yy + 1) * ph, xx * pw:(xx + 1) * pw]
            count = ph + pw
            m, M = part.min(), part.max()
            q = np.floor((part - m) * 255.0 / (M - m)).astype(int)
            hist = np.bincount(q.clip(0, 255).ravel(), minlength=256)
            lt, cnt = 0, 0
            while cnt < count:
                cnt += hist[lt]
                lt += 1
            ht, cnt = 255, 0
            while cnt < count:
                cnt += hist[ht]
                ht -= 1
            for sel in (q > ht, q < lt):
                pts = np.argwhere(sel)
                n = len(pts)
                s = 0.0
                for a in range(n):
                    for b in range(a + 1, n):
                        s += np.sqrt(((pts[a] - pts[b]) ** 2).sum())
                comps = n * (n - 1) // 2
                fv.append(s / comps if comps else np.nan)
    return np.array(fv)


def test_histdist_matches_transliteration():
    imgs = rng_imgs(1, 36, seed=3)
    got = np.asarray(F.extract_histdist(imgs))
    np.testing.assert_allclose(got[0], np_histdist(imgs[0]), rtol=1e-4)


# -------------------------------------------------------------- LBP

def np_lbp(I):
    min_idxs = []
    for i in range(256):
        code, best = i, i
        for _ in range(7):
            code = ((code >> 1) | ((code & 1) << 7)) & 0xFF
            best = min(best, code)
        min_idxs.append(best)
    uniq = sorted(set(min_idxs))
    hist = np.zeros(256)
    H, W = I.shape
    for y in range(1, H - 1):
        for x in range(1, W - 1):
            c = I[y, x]
            code = ((I[y-1, x-1] > c) << 7 | (I[y-1, x] > c) << 6
                    | (I[y-1, x+1] > c) << 5 | (I[y, x+1] > c) << 4
                    | (I[y+1, x+1] > c) << 3 | (I[y+1, x] > c) << 2
                    | (I[y+1, x-1] > c) << 1 | (I[y, x-1] > c))
            hist[min_idxs[int(code)]] += 1
    return np.array([hist[u] for u in uniq])


def test_lbp_matches_transliteration():
    imgs = rng_imgs(2, 24, seed=5)
    got = np.asarray(F.extract_lbp(imgs))
    for b in range(2):
        np.testing.assert_allclose(got[b], np_lbp(imgs[b]))


# ------------------------------------------------------------- ramp

def test_ramp_recovers_plane():
    n = 32
    j = (np.arange(n) - n // 2)[None, :] * np.ones((n, 1))
    i = (np.arange(n) - n // 2)[:, None] * np.ones((1, n))
    img = (0.7 * j - 1.3 * i + 4.2).astype(np.float32)[None]
    pA, pB, pC = np.asarray(F.extract_ramp(img))[0]
    np.testing.assert_allclose([pA, pB, pC], [0.7, -1.3, 4.2], atol=1e-3)


# --------------------------------------------------------- variance

def np_variance(I):
    H, W = I.shape
    fv, vi, vo = [], 0.0, 0.0
    for yy in range(1, 5):
        for xx in range(1, 5):
            blk = I[H // 4 * (yy - 1):H // 4 * yy,
                    W // 4 * (xx - 1):W // 4 * xx]
            v = blk.var()
            fv.append(v)
            if 1 < yy < 4 and 1 < xx < 4:
                vi += v
            else:
                vo += v
    fv.append((vi / 4) / (vo / 12))
    return np.array(fv)


def test_variance_matches_transliteration():
    imgs = rng_imgs(2, 32, seed=7)
    got = np.asarray(F.extract_variance(imgs))
    for b in range(2):
        np.testing.assert_allclose(got[b], np_variance(imgs[b]), rtol=1e-4)


# ---------------------------------------------------------- zernike

def np_zernike(I):
    facs = [1, 1, 2, 6, 24]
    Sy, Sx = I.shape
    y, x = np.mgrid[0:Sy, 0:Sx]
    r2 = 2 * (y + 1) - Sy - 1
    r1 = 2 * (x + 1) - Sy - 1
    R = np.sqrt(r1 * r1 + r2 * r2) / Sy
    R[R > 1] = 0
    Theta = np.arctan2(Sy + 1 - 2 * (y + 1), 2 * (x + 1) - Sy - 1)
    fv = []
    for n in range(1, 5):
        for m in range(-n, 0, 2):
            mn = (n - abs(m)) // 2
            nm = (n + abs(m)) // 2
            Rad = np.zeros_like(R)
            for s in range(mn + 1):
                ns = n - 2 * s
                c = ((1 if s % 2 == 0 else -1) * facs[n - s]
                     / (facs[s] * facs[nm - s] * facs[mn - s]))
                Rad += c * R ** ns
            prod = np.sum(I * Rad * np.exp(-1j * m * Theta))
            fv.append(abs(prod))
    return np.array(fv)


def test_zernike_matches_transliteration():
    imgs = rng_imgs(2, 28, seed=9)
    got = np.asarray(F.extract_zernike(imgs))
    for b in range(2):
        np.testing.assert_allclose(got[b], np_zernike(imgs[b]), rtol=1e-3)


# ------------------------------------------- centering + denoising

def test_center_translationally_centers_blob():
    n = 64
    y, x = np.mgrid[0:n, 0:n]
    blob = np.exp(-((x - n // 2 - 6.0) ** 2 + (y - n // 2 + 4.0) ** 2)
                  / (2 * 9.0)).astype(np.float32)
    cen = np.asarray(F.center_translationally(blob[None]))[0]
    cy, cx = np.unravel_index(np.argmax(cen), cen.shape)
    # started 6 px off in x, 4 in y; must land strictly closer to center
    assert abs(cx - n // 2) < 4 and abs(cy - n // 2) < 3


def test_tv_denoise_improves_correlation():
    n = 48
    y, x = np.mgrid[0:n, 0:n]
    clean = ((x + y) % 16 < 8).astype(np.float32)
    rng = np.random.default_rng(0)
    noisy = clean + 0.6 * rng.standard_normal((n, n)).astype(np.float32)

    def corr(a, b):
        a, b = a - a.mean(), b - b.mean()
        return (a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum())

    den = np.asarray(F.tv_denoise_spg(noisy[None], max_iter=60))[0]
    assert corr(den, clean) > corr(noisy, clean) + 0.05


# ---------------------------------------------------------------- CLI

def test_extract_features_cli(tmp_path):
    from tests.test_programs_batch2 import run_prog
    from xmipp3_tpu.core.image import save_image
    from xmipp3_tpu.core.metadata import MetaData
    imgs = rng_imgs(3, 36, seed=11)
    fn = str(tmp_path / "in.mrcs")
    save_image(fn, imgs)
    out = str(tmp_path / "out.xmd")
    run_prog("classify_extract_features",
             f"-i {fn} -o {out} --lbp --variance --zernike --ramp")
    md = MetaData(out)
    rows = list(md.iterRows())
    assert len(rows) == 3
    for lab, dim in (("scoreByLBP", 36), ("scoreByVariance", 17),
                     ("scoreByZernike", 6), ("scoreByRamp", 3)):
        v = np.asarray(rows[0][lab], np.float64)
        assert v.shape == (dim,), lab
        assert np.isfinite(v).all(), lab
