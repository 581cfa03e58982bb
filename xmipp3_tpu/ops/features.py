"""Image feature extractors for classification screening.

TPU-first rebuild of the reference's classify_extract_features engine
(contract: libraries/reconstruction/classify_extract_features.{h,cpp}).
Every extractor is a batched jitted function over an (B, H, W) stack:
histograms become one-hot matmuls, the pairwise histogram-distance sums
become quadratic forms m^T D m against a precomputed distance matrix
(MXU-friendly), the morphological granulometry uses accumulated shifted
minima/maxima, and the Zernike moments are one einsum against a
precomputed real/imag basis.  The scan orders, quantization rules and
coordinate quirks of the reference (e.g. extractZernike's use of Sy for
the x coordinate, classify_extract_features.cpp:520-527) are reproduced
exactly so feature vectors are comparable.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.mask import circular_mask

__all__ = [
    "extract_entropy", "extract_granulo", "extract_histdist",
    "extract_lbp", "extract_ramp", "extract_variance", "extract_zernike",
    "center_translationally", "tv_denoise_spg",
]


# ---------------------------------------------------------------- entropy

def _hist_entropy(x):
    """-sum_i max(h_i,1)*log2(max(h_i,1)) over a 256-bin histogram of a
    single image, reference classify_extract_features.cpp:105-121."""
    m = x.min()
    M = x.max()
    idx = jnp.clip(jnp.floor((x - m) * 255.0 / (M - m)), 0, 255)
    hist = jnp.zeros(256, x.dtype).at[idx.astype(jnp.int32).ravel()].add(1.0)
    h = jnp.maximum(hist, 1.0)
    return -jnp.sum(h * jnp.log2(h))


@lru_cache(maxsize=8)
def _entropy_masks(h, w):
    """Ring masks 2..6 (cpp:149-167): 2*circ(w-s) - circ(w) - circ(w-2s),
    w starting at X/2 with step X/32."""
    masks = []
    wave = w // 2
    step = w // 32
    for _ in range(5):
        m = (2 * circular_mask((h, w), wave - step)
             - circular_mask((h, w), wave)
             - circular_mask((h, w), wave - 2 * step))
        masks.append(m != 0)          # apply_binary_mask keeps mask != 0
        wave -= step
    return np.stack(masks)


@partial(jax.jit, static_argnames=())
def _entropy_jit(imgs, masks):
    def per_image(x):
        full = _hist_entropy(x)
        ring = jax.vmap(lambda mk: _hist_entropy(jnp.where(mk, x, 0.0)))(
            masks)
        return jnp.concatenate([full[None], ring])
    return jax.vmap(per_image)(imgs)


def extract_entropy(imgs):
    """(B,H,W) -> (B,6): whole-image + 5 ring entropies."""
    imgs = jnp.asarray(imgs, jnp.float32)
    masks = jnp.asarray(_entropy_masks(imgs.shape[-2], imgs.shape[-1]))
    return _entropy_jit(imgs, masks)


# --------------------------------------------------------------- granulo

def _se_offsets(N):
    offs = []
    for dy in range(-N, N + 1):
        for dx in range(-N, N + 1):
            if dx * dx + dy * dy <= N * N:
                offs.append((dy, dx))
    return offs


def _shifted(x, dy, dx, fill):
    """y[..., i, j] = x[..., i+dy, j+dx], reading `fill` out of bounds
    (the reference clips the window at the borders)."""
    pad = [(0, 0)] * (x.ndim - 2) + [(abs(dy),) * 2, (abs(dx),) * 2]
    p = jnp.pad(x, pad, constant_values=fill)
    y0, x0 = abs(dy) + dy, abs(dx) + dx
    return p[..., y0:y0 + x.shape[-2], x0:x0 + x.shape[-1]]


@jax.jit
def _granulo_jit(imgs):
    big = jnp.float32(3.4e38)
    out = []
    for N in range(1, 7):
        offs = _se_offsets(N)
        ero = imgs
        for dy, dx in offs:
            if (dy, dx) != (0, 0):
                ero = jnp.minimum(ero, _shifted(imgs, dy, dx, big))
        dil = ero
        for dy, dx in offs:
            if (dy, dx) != (0, 0):
                dil = jnp.maximum(dil, _shifted(ero, dy, dx, -big))
        out.append(dil.sum(axis=(-2, -1)))
    return jnp.stack(out, axis=-1)


def extract_granulo(imgs):
    """(B,H,W) -> (B,6): sums of morphological openings with circular
    structuring elements of radius 1..6 (cpp:196-265)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    if imgs.shape[-1] < 15 or imgs.shape[-2] < 15:
        raise ValueError("granulo features need images >= 15x15")
    return _granulo_jit(imgs)


# -------------------------------------------------------------- histdist

@lru_cache(maxsize=8)
def _pair_dist_matrix(ph, pw):
    yy, xx = np.mgrid[0:ph, 0:pw].astype(np.float32)
    pts = np.stack([yy.ravel(), xx.ravel()], axis=1)
    d = np.sqrt(((pts[:, None, :] - pts[None, :, :]) ** 2).sum(-1))
    return d.astype(np.float32)


@jax.jit
def _histdist_part(part, D):
    """One 3x3-grid subimage -> (dist_high/comparisons, dist_low/comps),
    cpp:269-362."""
    ph, pw = part.shape
    count = ph + pw
    m = part.min()
    M = part.max()
    q = jnp.floor((part - m) * 255.0 / (M - m))
    hist = jnp.zeros(256, jnp.float32).at[
        jnp.clip(q, 0, 255).astype(jnp.int32).ravel()].add(1.0)
    c_lo = jnp.cumsum(hist)
    # low_thresh: one past the bin where the cumulative count reaches
    # `count`; points strictly below it
    low_thresh = jnp.argmax(c_lo >= count) + 1
    c_hi = jnp.cumsum(hist[::-1])
    high_thresh = 254 - jnp.argmax(c_hi >= count)
    lo_m = (q < low_thresh).astype(jnp.float32).ravel()
    hi_m = (q > high_thresh).astype(jnp.float32).ravel()

    def stat(mask):
        n = mask.sum()
        comps = n * (n - 1.0) / 2.0
        s = 0.5 * mask @ (D @ mask)
        return s / comps                     # nan/inf when <2 points, as C++
    return stat(hi_m), stat(lo_m)


def extract_histdist(imgs):
    """(B,H,W) -> (B,18): mean pairwise distances of high/low-intensity
    points per 3x3 subregion (scan order yy, xx; high then low)."""
    imgs = np.asarray(imgs, np.float32)
    B, H, W = imgs.shape
    ph, pw = H // 3, W // 3
    D = jnp.asarray(_pair_dist_matrix(ph, pw))
    parts = []
    for yy in range(3):
        for xx in range(3):
            parts.append(imgs[:, yy * ph:(yy + 1) * ph,
                              xx * pw:(xx + 1) * pw])
    parts = jnp.asarray(np.stack(parts, axis=1))      # (B, 9, ph, pw)
    hi, lo = jax.jit(jax.vmap(jax.vmap(
        lambda p: _histdist_part(p, D))))(parts)
    return jnp.stack([hi, lo], axis=-1).reshape(B, 18)


# ------------------------------------------------------------------- LBP

@lru_cache(maxsize=1)
def _lbp_tables():
    min_idxs = []
    for i in range(256):
        code = i
        best = code
        for _ in range(7):
            code = ((code >> 1) | ((code & 1) << 7)) & 0xFF
            best = min(best, code)
        min_idxs.append(best)
    uniq = sorted(set(min_idxs))
    assert len(uniq) == 36
    remap = np.zeros(256, np.int32)
    for c, mi in enumerate(min_idxs):
        remap[c] = uniq.index(mi)
    return np.asarray(min_idxs, np.int32), remap


@jax.jit
def _lbp_jit(imgs, remap):
    c = imgs[:, 1:-1, 1:-1]
    nb = [imgs[:, :-2, :-2], imgs[:, :-2, 1:-1], imgs[:, :-2, 2:],
          imgs[:, 1:-1, 2:], imgs[:, 2:, 2:], imgs[:, 2:, 1:-1],
          imgs[:, 2:, :-2], imgs[:, 1:-1, :-2]]
    code = jnp.zeros(c.shape, jnp.int32)
    for bit, n in enumerate(nb):
        code = code | ((n > c).astype(jnp.int32) << (7 - bit))
    slot = remap[code]                                   # (B, H-2, W-2)
    one_hot = jax.nn.one_hot(slot.reshape(slot.shape[0], -1), 36,
                             dtype=jnp.float32)
    return one_hot.sum(axis=1)


def extract_lbp(imgs):
    """(B,H,W) -> (B,36): rotation-minimal LBP histogram (cpp:366-421)."""
    _, remap = _lbp_tables()
    return _lbp_jit(jnp.asarray(imgs, jnp.float32), jnp.asarray(remap))


# ------------------------------------------------------------------ ramp

@lru_cache(maxsize=8)
def _ramp_basis(h, w):
    """Design matrix for the LS plane fit over the OUTSIDE of the
    X/2-radius circle, logical (centered) coordinates (cpp:424-453)."""
    mask = circular_mask((h, w), w // 2) == 0
    j = (np.arange(w) - w // 2)[None, :] * np.ones((h, 1))
    i = (np.arange(h) - h // 2)[:, None] * np.ones((1, w))
    A = np.stack([j[mask], i[mask], np.ones(mask.sum())], axis=1)
    pinv = np.linalg.pinv(A)                       # (3, Npts)
    return mask, pinv.astype(np.float32)


@jax.jit
def _ramp_jit(flat_pts, pinv):
    return flat_pts @ pinv.T


def extract_ramp(imgs):
    """(B,H,W) -> (B,3): LS plane coefficients (pA, pB, pC) outside the
    central circle."""
    imgs = np.asarray(imgs, np.float32)
    mask, pinv = _ramp_basis(imgs.shape[-2], imgs.shape[-1])
    pts = imgs[:, mask]
    return _ramp_jit(jnp.asarray(pts), jnp.asarray(pinv))


# -------------------------------------------------------------- variance

@jax.jit
def _variance_jit(imgs):
    B, H, W = imgs.shape
    bh, bw = H // 4, W // 4
    blocks = imgs[:, :4 * bh, :4 * bw].reshape(B, 4, bh, 4, bw)
    mean = blocks.mean(axis=(2, 4), keepdims=True)
    var = ((blocks - mean) ** 2).sum(axis=(2, 4)) / (bh * bw)  # (B,4,4)
    inner = np.zeros((4, 4), bool)
    inner[1:3, 1:3] = True
    fv = var.reshape(B, 16)
    var_i = (var * inner).sum(axis=(1, 2))
    var_o = (var * ~inner).sum(axis=(1, 2))
    ratio = (var_i / 4.0) / (var_o / 12.0)
    return jnp.concatenate([fv, ratio[:, None]], axis=1)


def extract_variance(imgs):
    """(B,H,W) -> (B,17): 4x4 block variances (scan order) + the
    inner/outer variance ratio (cpp:450-506)."""
    return _variance_jit(jnp.asarray(imgs, jnp.float32))


# --------------------------------------------------------------- zernike

def _facs(n):
    return (1, 1, 2, 6, 24)[n]


@lru_cache(maxsize=8)
def _zernike_basis(sy, sx):
    """Real/imag basis images for the 6 reference moments
    (n,m) in {(1,-1),(2,-2),(3,-3),(3,-1),(4,-4),(4,-2)}.  Reproduces the
    reference's use of Sy in the x coordinate (cpp:520-527)."""
    y, x = np.mgrid[0:sy, 0:sx]
    r2 = 2 * (y + 1) - sy - 1
    r1 = 2 * (x + 1) - sy - 1          # sic: Sy, as in the reference
    R = np.sqrt(r1 * r1 + r2 * r2) / sy
    R = np.where(R > 1, 0.0, R)
    Theta = np.arctan2(sy + 1 - 2 * (y + 1), 2 * (x + 1) - sy - 1)
    cos_b, sin_b = [], []
    for n in range(1, 5):
        for m in range(-n, 0, 2):
            mn = (n - abs(m)) // 2
            nm = (n + abs(m)) // 2
            rad = np.zeros_like(R)
            for s in range(mn + 1):
                ns = n - 2 * s
                c = ((1 if s % 2 == 0 else -1) * _facs(n - s)
                     / (_facs(s) * _facs(nm - s) * _facs(mn - s)))
                rad = rad + c * R ** ns
            # exp(-i*m*Theta) = cos(mT) - i sin(mT)
            cos_b.append(rad * np.cos(m * Theta))
            sin_b.append(-rad * np.sin(m * Theta))
    return (np.stack(cos_b).astype(np.float32).reshape(6, -1),
            np.stack(sin_b).astype(np.float32).reshape(6, -1))


@jax.jit
def _zernike_jit(flat, cos_b, sin_b):
    re = flat @ cos_b.T
    im = flat @ sin_b.T
    return jnp.sqrt(re * re + im * im)


def extract_zernike(imgs):
    """(B,H,W) -> (B,6): |Zernike moments| for n=1..4, m<0."""
    imgs = jnp.asarray(imgs, jnp.float32)
    B = imgs.shape[0]
    cos_b, sin_b = _zernike_basis(imgs.shape[-2], imgs.shape[-1])
    return _zernike_jit(imgs.reshape(B, -1), jnp.asarray(cos_b),
                        jnp.asarray(sin_b))


# ----------------------------------------------- centering + TV denoise

def center_translationally(imgs, order: int = 3):
    """Center each image at the average best shift against its X/Y/XY
    mirrors (reference centerImageTranslationally, filters.cpp:3212)."""
    from xmipp3_tpu.ops.geo import shift_2d_real
    from xmipp3_tpu.ops.shift import best_shift
    imgs = jnp.asarray(imgs, jnp.float32)
    sx = jnp.zeros(imgs.shape[0])
    sy = jnp.zeros(imgs.shape[0])
    for mirrored in (imgs[:, :, ::-1], imgs[:, ::-1, :],
                     imgs[:, ::-1, ::-1]):
        mx, my, _ = best_shift(imgs, mirrored)
        sx = sx + mx
        sy = sy + my
    # the reference translates by MINUS the mean mirror-registration shift
    return shift_2d_real(imgs, -sx / 3.0, -sy / 3.0, order=order)


@partial(jax.jit, static_argnames=("max_iter",))
def _tv_spg_one(x, max_iter):
    """Reference denoiseTVFilter (filters.cpp:4129-4259): generalized
    Anscombe VST + spectral projected gradient TV minimisation, as one
    lax.scan over iterations with a bounded inner line search."""
    lam, sigmag, g, q = 1.0, 5.8, 0.0, 255.0
    mu, gamma, s1, s2 = 0.03, 1e-4, 0.1, 0.9
    thetamin, thetamax = 1e-3, 1e3
    beta2 = 1e-5 ** 2

    K1a = (3.0 / 8.0) * lam * lam + sigmag * sigmag - lam * g
    xm = x.min()
    xs = 255.0 / (x.max() - xm)
    x = (x - xm) * xs
    x = 2.0 / lam * jnp.sqrt(jnp.maximum(0.0, lam * x + K1a))
    mx = x.max()
    xold = x / mx
    y = xold                                     # degraded input
    s = mx

    K1 = K1a / (s * s)
    K2e = lam * (q / (s * s))                    # energy K2
    K2g = lam * (q / s * s)                      # gradient K2 (sic, cpp:4034)
    K3e = 2.0 / lam
    K3g = (2.0 / (lam * lam)) * (q / (s * s)) * lam

    def energy(X):
        dXx = jnp.roll(X, -1, axis=1) - X
        dXy = jnp.roll(X, -1, axis=0) - X
        tv = jnp.sqrt(dXx * dXx + dXy * dXy + beta2).sum()
        msq = K3e * jnp.sqrt(jnp.maximum(0.0, K2e * X + K1)) - y
        return 0.5 * (msq * msq).sum() + mu * tv

    def gradient(X):
        dXx = jnp.roll(X, -1, axis=1) - X
        dXy = jnp.roll(X, -1, axis=0) - X
        d = 1.0 / jnp.sqrt(dXx * dXx + dXy * dXy + beta2)
        d_left = jnp.roll(d, 1, axis=1)
        d_up = jnp.roll(d, 1, axis=0)
        X_left = jnp.roll(X, 1, axis=1)
        X_right = jnp.roll(X, -1, axis=1)
        X_up = jnp.roll(X, 1, axis=0)
        X_down = jnp.roll(X, -1, axis=0)
        dTV = (X * (2.0 * d + d_left + d_up) - X_left * d_left
               - X_up * d_up - d * (X_right + X_down))
        dE = jnp.where(
            K2g * X + K1 > 0,
            K3g - (q / (s * s)) * y
            / jnp.sqrt(jnp.maximum(X * (q / (s * s)) * lam + K1, 1e-30)),
            0.0)
        return dE + mu * dTV

    def proj(X, G, theta):
        div = X - G * theta
        return jnp.clip(div, 0.0, 1.0) - X

    fold = energy(xold)
    grold = gradient(xold)
    dold = proj(xold, grold, 1.0)

    def step(carry, _):
        xold, grold, dold, fold = carry
        xnew = xold + dold
        delta = (grold * dold).sum()
        fnew = energy(xnew)

        def ls_cond(st):
            _, ksi, fnew = st
            return fnew > fold + gamma * ksi * delta

        def ls_body(st):
            _, ksi, fnew = st
            ksitsl = -0.5 * (ksi * ksi) * delta / (fnew - fold - ksi * delta)
            ksi = jnp.where((ksitsl >= s1) & (ksitsl <= s2 * ksi),
                            ksitsl, ksi / 2.0)
            xn = xold + ksi * dold
            return xn, ksi, energy(xn)

        xnew, _, fnew = jax.lax.while_loop(ls_cond, ls_body,
                                           (xnew, 1.0, fnew))
        grnew = gradient(xnew)
        xij = xnew - xold
        p = (xij * (grnew - grold)).sum()
        ss2 = (xij * xij).sum()
        theta = jnp.where(p <= 0, thetamax,
                          jnp.minimum(thetamax,
                                      jnp.maximum(thetamin, ss2 / p)))
        dnew = proj(xnew, grnew, theta)
        return (xnew, grnew, dnew, fnew), None

    (xf, _, _, _), _ = jax.lax.scan(step, (xold, grold, dold, fold),
                                    None, length=max_iter)
    return xf


def tv_denoise_spg(imgs, max_iter: int = 200):
    """Batched reference TV denoising; returns images in the VST domain
    scaled to [0,1] exactly as the reference leaves them."""
    imgs = jnp.asarray(imgs, jnp.float32)
    return jax.vmap(lambda x: _tv_spg_one(x, max_iter))(imgs)
