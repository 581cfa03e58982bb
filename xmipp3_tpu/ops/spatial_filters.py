"""Real-space filter family for xmipp_transform_filter.

Reference contracts (semantics, not code): data/filters.{h,cpp} —
medianFilter3x3 (filters.h:1088), boundMedianFilter (filters.h:1309),
pixelDesvFilter (filters.h:1378), forcePositive (filters.cpp:3506),
logFilter (filters.h:1405), substractBackgroundRollingBall
(filters.cpp:75), smoothingShah + Update_surface/edge_Shah
(filters.cpp:2511-2760), RetinexFilter (filters.cpp:3835-3947),
BasisFilter (filters.cpp:3788-3833), and reconstruction/mean_shift.cpp.

TPU-first notes: the hot, regular filters (median, log, retinex, basis,
mean-shift, Shah diffusion) are jitted batched XLA programs; Shah runs
Jacobi sweeps (the reference's Gauss-Seidel is inherently sequential —
same fixed point, compiler-friendly). The bad-pixel repair family is a
data-dependent host loop by nature (repeat until no orphan pixels) and
stays in numpy — it is IO-bound preprocessing, not a hot path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = [
    "median_3x3", "log_filter", "bound_median_filter", "force_positive",
    "pixel_desv_filter", "rolling_ball_background", "mean_shift_filter",
    "retinex_filter", "basis_filter", "smoothing_shah",
]


# ---------------------------------------------------------------------------
# median 3x3 (filters.h medianFilter3x3)
# ---------------------------------------------------------------------------

@jax.jit
def median_3x3(imgs):
    """3x3 median with edge replication, batched over leading axes."""
    x = jnp.asarray(imgs, jnp.float32)
    single = x.ndim == 2
    if single:
        x = x[None]
    p = jnp.pad(x, ((0, 0), (1, 1), (1, 1)), mode="edge")
    stack = jnp.stack([p[:, 1 + dy:p.shape[1] - 1 + dy,
                         1 + dx:p.shape[2] - 1 + dx]
                       for dy in (-1, 0, 1) for dx in (-1, 0, 1)], axis=0)
    out = jnp.median(stack, axis=0)
    return out[0] if single else out


# ---------------------------------------------------------------------------
# log filter (filters.h logFilter): a - b*log(x + c)
# ---------------------------------------------------------------------------

@jax.jit
def log_filter(imgs, a: float, b: float, c: float):
    x = jnp.asarray(imgs, jnp.float32)
    return a - b * jnp.log(x + c)


# ---------------------------------------------------------------------------
# bad-pixel repair (filters.h boundMedianFilter / pixelDesvFilter,
# filters.cpp forcePositive)
# ---------------------------------------------------------------------------

def bound_median_filter(img, mask):
    """Replace masked pixels by the median of their UNMASKED 5x5
    neighbours; repeat (shrinking the mask) until none remain.  Works on
    2-D or 3-D arrays, same repair rule as the reference's
    boundMedianFilter (5x5x5 neighbourhood in 3-D)."""
    out = np.array(img, np.float32, copy=True)
    bad = np.asarray(mask, bool).copy()
    if out.ndim == 2:
        out3 = out[None]
        bad3 = bad[None]
    else:
        out3, bad3 = out, bad
    Z, H, W = out3.shape
    offs = [(dz, dy, dx)
            for dz in (range(-2, 3) if Z > 1 else (0,))
            for dy in range(-2, 3) for dx in range(-2, 3)
            if not (dz == 0 and dy == 0 and dx == 0)]
    while bad3.any():
        vals = np.full((len(offs),) + out3.shape, np.nan, np.float32)
        for n, (dz, dy, dx) in enumerate(offs):
            src_z = slice(max(0, -dz), Z - max(0, dz))
            dst_z = slice(max(0, dz), Z - max(0, -dz))
            src_y = slice(max(0, -dy), H - max(0, dy))
            dst_y = slice(max(0, dy), H - max(0, -dy))
            src_x = slice(max(0, -dx), W - max(0, dx))
            dst_x = slice(max(0, dx), W - max(0, -dx))
            v = out3[src_z, src_y, src_x].copy()
            v[bad3[src_z, src_y, src_x]] = np.nan
            vals[n, dst_z, dst_y, dst_x] = v
        import warnings
        with np.errstate(all="ignore"), warnings.catch_warnings():
            warnings.simplefilter("ignore", RuntimeWarning)
            med = np.nanmedian(vals, axis=0)
        fixable = bad3 & np.isfinite(med)
        if not fixable.any():
            break  # fully surrounded by bad pixels and image is all bad
        out3[fixable] = med[fixable]
        bad3 &= ~fixable
    return out if out.ndim == img.ndim else out3[0]


def force_positive(img):
    """Repair non-positive pixels with the boundaries median filter
    (filters.cpp forcePositive)."""
    img = np.asarray(img, np.float32)
    return bound_median_filter(img, img <= 0)


def pixel_desv_filter(img, factor: float):
    """Repair pixels outside [mean - factor*std, mean + factor*std]
    (filters.h pixelDesvFilter)."""
    img = np.asarray(img, np.float32)
    if factor <= 0:
        return img.copy()
    avg, std = float(img.mean()), float(img.std())
    bad = (img < avg - factor * std) | (img > avg + factor * std)
    return bound_median_filter(img, bad)


# ---------------------------------------------------------------------------
# rolling-ball background (filters.cpp substractBackgroundRollingBall)
# ---------------------------------------------------------------------------

def rolling_ball_background(img, radius: int):
    """Subtract an ImageJ-style rolling-ball background: shrink by
    min-pooling, morphological opening with the ball height profile,
    bilinear re-expansion, then subtract.  Same shrink factors and arc
    trims as the reference."""
    from scipy.ndimage import grey_dilation, grey_erosion, zoom
    img = np.asarray(img, np.float64)
    if radius <= 10:
        shrink, trim = 1, 24
    elif radius <= 30:
        shrink, trim = 2, 24
    elif radius <= 100:
        shrink, trim = 4, 32
    else:
        shrink, trim = 8, 40
    small_r = max(1.0, radius / shrink)
    half = int(round(small_r - int(trim * small_r) / 100))
    w = 2 * half + 1
    yy, xx = np.mgrid[0:w, 0:w].astype(np.float64) - half
    t = small_r * small_r - yy * yy - xx * xx
    ball = np.where(t > 0, np.sqrt(np.maximum(t, 0)), 0.0)
    H, W = img.shape
    sh, sw = (H + shrink - 1) // shrink, (W + shrink - 1) // shrink
    if shrink > 1:
        pad_h, pad_w = sh * shrink - H, sw * shrink - W
        p = np.pad(img, ((0, pad_h), (0, pad_w)), mode="edge")
        shrunk = p.reshape(sh, shrink, sw, shrink).min(axis=(1, 3))
    else:
        shrunk = img
    bg_small = grey_dilation(grey_erosion(shrunk, structure=ball),
                             structure=ball)
    if shrink > 1:
        bg = zoom(bg_small, shrink, order=1)[:H, :W]
    else:
        bg = bg_small
    return (img - bg).astype(np.float32)


# ---------------------------------------------------------------------------
# mean shift (reconstruction/mean_shift.cpp)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("hs_i", "iters", "fast"))
def _mean_shift_jit(x, hr: float, hs_i: int, iters: int, fast: bool):
    B, H, W = x.shape
    offs = [(dy, dx) for dy in range(-hs_i, hs_i + 1)
            for dx in range(-hs_i, hs_i + 1)]
    offs_a = jnp.array(offs, jnp.int32)
    sw = (jnp.exp(-(offs_a[:, 0] ** 2 + offs_a[:, 1] ** 2)
                  / (2.0 * max(hs_i, 1) ** 2))
          if not fast else jnp.ones(len(offs), jnp.float32))
    inv_2r2 = 1.0 / (2.0 * hr * hr)

    def one_iter(img, _):
        num = jnp.zeros_like(img)
        den = jnp.zeros_like(img)

        def body(c, idx):
            num, den = c
            dy, dx = offs_a[idx, 0], offs_a[idx, 1]
            nb = jnp.roll(img, (-dy, -dx), axis=(1, 2))
            if fast:
                wr = (jnp.abs(nb - img) <= 3.0 * hr).astype(img.dtype)
            else:
                wr = jnp.exp(-(nb - img) ** 2 * inv_2r2)
            w = wr * sw[idx]
            return (num + w * nb, den + w), None

        (num, den), _ = jax.lax.scan(body, (num, den),
                                     jnp.arange(len(offs)))
        return num / jnp.maximum(den, 1e-30), None

    out, _ = jax.lax.scan(one_iter, x, None, length=iters)
    return out


def mean_shift_filter(imgs, hr: float, hs: float, iters: int = 1,
                      fast: bool = False):
    """Iterated spatial/range mean-shift smoothing.  `hr`/`hs` are the
    range/spatial sigmas as in the reference (which divides both by 3 in
    the exact mode to get the gaussian sigma from the window size)."""
    x = jnp.asarray(imgs, jnp.float32)
    single = x.ndim == 2
    if single:
        x = x[None]
    if fast:
        hs_i, hr_eff = max(1, int(np.ceil(hs))), hr
    else:
        hs_i, hr_eff = max(1, int(np.ceil(hs / 3.0))), hr / 3.0
    out = _mean_shift_jit(x, float(hr_eff), hs_i * (3 if not fast else 1),
                          int(iters), bool(fast))
    return out[0] if single else out


# ---------------------------------------------------------------------------
# retinex (filters.cpp RetinexFilter)
# ---------------------------------------------------------------------------

def retinex_filter(img, percentile: float = 0.9, mask=None,
                   eps: float = 1.0):
    """Forward discrete Laplacian in Fourier space, zero all values whose
    |value| is below the given percentile (computed outside the mask if
    one is given), inverse Laplacian back."""
    img = np.asarray(img, np.float32)
    is3d = img.ndim == 3
    axes_n = img.shape

    def lap_gain(direct):
        gain = np.zeros(axes_n, np.float64) + (len(axes_n) * 2 + eps)
        for ax, n in enumerate(axes_n):
            f = np.fft.fftfreq(n)
            shape = [1] * len(axes_n)
            shape[ax] = n
            gain = gain - 2 * np.cos(2 * np.pi * f).reshape(shape)
        if not direct:
            gain = np.where(gain > 0, 1.0 / gain, gain)
        return gain

    F = np.fft.fftn(img)
    lap = np.real(np.fft.ifftn(F * lap_gain(True))).astype(np.float32)
    sel = (np.abs(lap) if mask is None
           else np.abs(lap)[np.asarray(mask) == 0])
    vals = np.sort(sel.ravel())
    thr = vals[min(len(vals) - 1, int(percentile * len(vals)))]
    lap = np.where(np.abs(lap) < thr, 0.0, lap)
    out = np.real(np.fft.ifftn(np.fft.fftn(lap) * lap_gain(False)))
    return out.astype(np.float32) if is3d else out.astype(np.float32)


# ---------------------------------------------------------------------------
# basis projection (filters.cpp BasisFilter)
# ---------------------------------------------------------------------------

@jax.jit
def basis_filter(imgs, basis):
    """Project each image onto the (non-orthogonalized) basis stack and
    re-synthesize: out = sum_n <img, b_n> b_n."""
    x = jnp.asarray(imgs, jnp.float32)
    b = jnp.asarray(basis, jnp.float32)
    single = x.ndim == 2
    if single:
        x = x[None]
    coef = jnp.einsum("byx,nyx->bn", x, b)
    out = jnp.einsum("bn,nyx->byx", coef, b)
    return out[0] if single else out


# ---------------------------------------------------------------------------
# Shah anisotropic diffusion (filters.cpp smoothingShah)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("outer", "inner", "refinement"))
def _shah_jit(img, w, outer: int, inner: int, refinement: int):
    f0 = img

    def surface_update(fs, s):
        sx = 0.5 * (jnp.roll(s, -1, 1) - jnp.roll(s, 1, 1))
        sy = 0.5 * (jnp.roll(s, -1, 0) - jnp.roll(s, 1, 0))
        ns2 = (1 - s) ** 2
        fxp = jnp.roll(fs, -1, 1)
        fxm = jnp.roll(fs, 1, 1)
        fyp = jnp.roll(fs, -1, 0)
        fym = jnp.roll(fs, 1, 0)
        fx = 0.5 * (fxp - fxm)
        fy = 0.5 * (fyp - fym)
        wfx = 4 * w[1] * (1 - s) * sx
        wfy = 4 * w[1] * (1 - s) * sy
        wfxx = -2 * w[1] * ns2
        constant = -2 * w[0] * f0
        central = -2 * w[0] + 4 * wfxx
        neigh = wfx * fx + wfy * fy + wfxx * (fxp + fxm) + wfxx * (fyp + fym)
        new = jnp.where(jnp.abs(central) > 1e-12,
                        (constant + neigh) / central, f0)
        new = jnp.clip(new, 0.0, 1.0)
        # the reference only sweeps interior pixels
        inner_m = jnp.zeros_like(fs).at[1:-1, 1:-1].set(1.0)
        return fs * (1 - inner_m) + new * inner_m

    def edge_update(fs, s, k):
        fx = 0.5 * (jnp.roll(fs, -1, 1) - jnp.roll(fs, 1, 1))
        fy = 0.5 * (jnp.roll(fs, -1, 0) - jnp.roll(fs, 1, 0))
        constant = w[1] * (fx * fx + fy * fy)
        central = w[2] * k + w[3] / k * 4
        neigh = (w[3] / k) * (jnp.roll(s, 1, 0) + jnp.roll(s, -1, 0)
                              + jnp.roll(s, 1, 1) + jnp.roll(s, -1, 1))
        new = (constant + neigh) / (constant + central)
        new = jnp.where(new < 0, s * 0.5,
                        jnp.where(new > 1, 0.5 * (s + 1), new))
        inner_m = jnp.zeros_like(s).at[1:-1, 1:-1].set(1.0)
        return s * (1 - inner_m) + new * inner_m

    fs = img
    for k in range(1, refinement + 1):
        s = jnp.zeros_like(img)

        def outer_body(c, _):
            fs, s = c
            fs = jax.lax.fori_loop(
                0, inner, lambda _, f: surface_update(f, s), fs)
            s = jax.lax.fori_loop(
                0, inner, lambda _, ss: edge_update(fs, ss, float(k)), s)
            return (fs, s), None

        (fs, s), _ = jax.lax.scan(outer_body, (fs, s), None, length=outer)
    return fs, s


def smoothing_shah(img, weights=(0.0, 50.0, 50.0, 0.02), outer: int = 10,
                   inner: int = 1, refinement: int = 1,
                   adjust_range: bool = True):
    """Mumford-Shah surface/edge smoothing.  Returns (surface, edge).
    Jacobi sweeps under jit (reference Gauss-Seidel: same fixed point)."""
    x = np.asarray(img, np.float32)
    if adjust_range:
        lo, hi = float(x.min()), float(x.max())
        x = (x - lo) / (hi - lo) if hi > lo else x * 0.0
    fs, s = _shah_jit(jnp.asarray(x), jnp.asarray(weights, jnp.float32),
                      int(outer), int(inner), int(refinement))
    return np.asarray(fs), np.asarray(s)
