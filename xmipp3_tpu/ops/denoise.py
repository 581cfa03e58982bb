"""Denoising ops: total-variation (Chambolle), wavelet soft-threshold, BEPS.

Replaces the reference's denoising paths (DenoiseTVFilter in data/filters.h
:1441-1596 bank, wavelet DWT denoising in data/wavelet, the denoising_tv
script) with jitted device implementations.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("n_iters",))
def tv_denoise_2d(imgs, weight: float = 0.1, n_iters: int = 50):
    """Rudin-Osher-Fatemi TV denoising via Chambolle's dual projection.

    imgs (B,H,W); weight = regularization strength (bigger = smoother)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    tau = 0.25

    def grad(u):
        gx = jnp.diff(u, axis=-1, append=u[..., -1:])
        gy = jnp.diff(u, axis=-2, append=u[..., -1:, :])
        return gx, gy

    def div(px, py):
        dx = px - jnp.roll(px, 1, axis=-1)
        dx = dx.at[..., 0].set(px[..., 0])
        dx = dx.at[..., -1].set(-px[..., -2])
        dy = py - jnp.roll(py, 1, axis=-2)
        dy = dy.at[..., 0, :].set(py[..., 0, :])
        dy = dy.at[..., -1, :].set(-py[..., -2, :])
        return dx + dy

    def body(carry, _):
        px, py = carry
        # Chambolle 2004: p <- (p + tau*grad(div p - f/lambda)) /
        #                      (1 + tau*|grad(div p - f/lambda)|)
        gx, gy = grad(div(px, py) - imgs / weight)
        mag = jnp.sqrt(gx * gx + gy * gy)
        px = (px + tau * gx) / (1 + tau * mag)
        py = (py + tau * gy) / (1 + tau * mag)
        return (px, py), None

    init = (jnp.zeros_like(imgs), jnp.zeros_like(imgs))
    (px, py), _ = jax.lax.scan(body, init, None, length=n_iters)
    out = imgs - weight * div(px, py)
    return out[0] if single else out


def _haar_dwt2(x):
    """One Haar DWT level: (B, H, W) -> (LL, (LH, HL, HH))."""
    a = (x[..., 0::2, :] + x[..., 1::2, :]) / np.sqrt(2)
    d = (x[..., 0::2, :] - x[..., 1::2, :]) / np.sqrt(2)
    ll = (a[..., :, 0::2] + a[..., :, 1::2]) / np.sqrt(2)
    lh = (a[..., :, 0::2] - a[..., :, 1::2]) / np.sqrt(2)
    hl = (d[..., :, 0::2] + d[..., :, 1::2]) / np.sqrt(2)
    hh = (d[..., :, 0::2] - d[..., :, 1::2]) / np.sqrt(2)
    return ll, (lh, hl, hh)


def dwt3(vol):
    """One 3D Haar DWT level: (Z, Y, X) -> list of 8 subbands ordered
    [lll, llh, lhl, lhh, hll, hlh, hhl, hhh] (z-axis split first). Used by
    the volume consensus (reference volume_consensus.py SWT role)."""
    x = jnp.asarray(vol, jnp.float32)

    def split(u, axis):
        lo = (jnp.take(u, jnp.arange(0, u.shape[axis], 2), axis) +
              jnp.take(u, jnp.arange(1, u.shape[axis], 2), axis)) / np.sqrt(2)
        hi = (jnp.take(u, jnp.arange(0, u.shape[axis], 2), axis) -
              jnp.take(u, jnp.arange(1, u.shape[axis], 2), axis)) / np.sqrt(2)
        return lo, hi

    bands = [x]
    for axis in (0, 1, 2):
        bands = [b for u in bands for b in split(u, axis)]
    return bands


def idwt3(bands):
    """Inverse of dwt3."""
    bands = [jnp.asarray(b, jnp.float32) for b in bands]

    def merge(lo, hi, axis):
        n = lo.shape[axis] * 2
        shape = list(lo.shape)
        shape[axis] = n
        out = jnp.zeros(shape, lo.dtype)
        idx_lo = [slice(None)] * 3
        idx_hi = [slice(None)] * 3
        idx_lo[axis] = slice(0, n, 2)
        idx_hi[axis] = slice(1, n, 2)
        out = out.at[tuple(idx_lo)].set((lo + hi) / np.sqrt(2))
        out = out.at[tuple(idx_hi)].set((lo - hi) / np.sqrt(2))
        return out

    for axis in (2, 1, 0):
        bands = [merge(bands[i], bands[i + 1], axis)
                 for i in range(0, len(bands), 2)]
    return bands[0]


def _haar_idwt2(ll, bands):
    lh, hl, hh = bands
    a = jnp.zeros(ll.shape[:-1] + (ll.shape[-1] * 2,), ll.dtype)
    a = a.at[..., 0::2].set((ll + lh) / np.sqrt(2))
    a = a.at[..., 1::2].set((ll - lh) / np.sqrt(2))
    d = jnp.zeros_like(a)
    d = d.at[..., 0::2].set((hl + hh) / np.sqrt(2))
    d = d.at[..., 1::2].set((hl - hh) / np.sqrt(2))
    out = jnp.zeros(a.shape[:-2] + (a.shape[-2] * 2, a.shape[-1]), a.dtype)
    out = out.at[..., 0::2, :].set((a + d) / np.sqrt(2))
    out = out.at[..., 1::2, :].set((a - d) / np.sqrt(2))
    return out


@partial(jax.jit, static_argnames=("levels",))
def wavelet_denoise_2d(imgs, threshold_sigmas: float = 2.5, levels: int = 3):
    """Haar DWT soft-threshold denoising (reference ProgFilter wavelet modes).

    Noise sigma estimated from the finest HH band (MAD)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]

    lls = []
    bandss = []
    x = imgs
    for _ in range(levels):
        x, bands = _haar_dwt2(x)
        lls.append(x)
        bandss.append(bands)
    # sigma from finest detail band
    hh0 = bandss[0][2]
    sigma = jnp.median(jnp.abs(hh0)) / 0.6745
    th = threshold_sigmas * sigma

    def soft(v):
        return jnp.sign(v) * jnp.maximum(jnp.abs(v) - th, 0.0)

    rec = lls[-1]
    for lvl in range(levels - 1, -1, -1):
        bands = tuple(soft(b) for b in bandss[lvl])
        rec = _haar_idwt2(rec, bands)
    out = rec
    return out[0] if single else out


# ---------------------------------------------------------------------------
# Daubechies-4 DWT (the reference's bilib orthogonal-wavelet role:
# core/bilib DWT used by angular_discrete_assign and wavelet denoising;
# periodic boundary handling, exact reconstruction)
# ---------------------------------------------------------------------------

_SQ3 = np.sqrt(3.0)
_DB4_H = np.array([1 + _SQ3, 3 + _SQ3, 3 - _SQ3, 1 - _SQ3]) / (4 * np.sqrt(2))
_DB4_G = np.array([_DB4_H[3], -_DB4_H[2], _DB4_H[1], -_DB4_H[0]])


def _db4_analysis_1d(x, axis):
    """One db4 analysis level along `axis` (periodic): returns (lo, hi)."""
    x = jnp.moveaxis(x, axis, -1)
    n = x.shape[-1]
    taps = [jnp.roll(x, -k, axis=-1) for k in range(4)]
    lo = sum(float(_DB4_H[k]) * taps[k] for k in range(4))[..., 0::2]
    hi = sum(float(_DB4_G[k]) * taps[k] for k in range(4))[..., 0::2]
    return jnp.moveaxis(lo, -1, axis), jnp.moveaxis(hi, -1, axis)


def _db4_synthesis_1d(lo, hi, axis):
    """Inverse of _db4_analysis_1d (periodic, orthogonal)."""
    lo = jnp.moveaxis(lo, axis, -1)
    hi = jnp.moveaxis(hi, axis, -1)
    n2 = lo.shape[-1]
    up_lo = jnp.zeros(lo.shape[:-1] + (2 * n2,), lo.dtype)
    up_hi = jnp.zeros_like(up_lo)
    up_lo = up_lo.at[..., 0::2].set(lo)
    up_hi = up_hi.at[..., 0::2].set(hi)
    x = sum(float(_DB4_H[k]) * jnp.roll(up_lo, k, axis=-1)
            + float(_DB4_G[k]) * jnp.roll(up_hi, k, axis=-1)
            for k in range(4))
    return jnp.moveaxis(x, -1, axis)


def db4_dwt2(x, levels: int = 1):
    """2-D db4 DWT pyramid: returns (ll, [(lh, hl, hh) per level],
    coarsest first in the detail list is the FINEST level)."""
    x = jnp.asarray(x, jnp.float32)
    details = []
    cur = x
    for _ in range(levels):
        lo, hi = _db4_analysis_1d(cur, -1)
        ll, lh = _db4_analysis_1d(lo, -2)
        hl, hh = _db4_analysis_1d(hi, -2)
        details.append((lh, hl, hh))
        cur = ll
    return cur, details


def db4_idwt2(ll, details):
    """Exact inverse of db4_dwt2."""
    cur = ll
    for lh, hl, hh in reversed(details):
        lo = _db4_synthesis_1d(cur, lh, -2)
        hi = _db4_synthesis_1d(hl, hh, -2)
        cur = _db4_synthesis_1d(lo, hi, -1)
    return cur


def db4_denoise_2d(imgs, threshold_sigmas: float = 3.0, levels: int = 2):
    """Soft-threshold db4 wavelet denoising (the reference's
    xmipp_transform_filter --wavelet / DWT denoising role). The noise
    scale is the MAD of the finest diagonal band."""
    imgs = jnp.asarray(imgs, jnp.float32)
    ll, details = db4_dwt2(imgs, levels)
    hh_fine = details[0][2]
    sigma = jnp.median(jnp.abs(hh_fine)) / 0.6745
    thr = threshold_sigmas * sigma

    def soft(c):
        return jnp.sign(c) * jnp.maximum(jnp.abs(c) - thr, 0.0)

    details = [(soft(lh), soft(hl), soft(hh)) for lh, hl, hh in details]
    return db4_idwt2(ll, details)


# ---------------------------------------------------------------------------
# General Daubechies banks + the reference WaveletFilter mode family
# (reconstruction/denoise.{h,cpp} WaveletFilter: remove_scale /
# soft_thresholding / bayesian / adaptive_soft / central, with --scale /
# --output_scale / --th / -R / --white_noise).  TPU-first: pyramid of
# batched separable convolutions (periodic, orthogonal, exact inverse)
# instead of the packed in-place layout.
# ---------------------------------------------------------------------------

_DAUB_H = {
    # standard orthogonal Daubechies lowpass banks (sum = sqrt(2))
    "DAUB4": _DB4_H,
    "DAUB12": np.array([
        0.111540743350, 0.494623890398, 0.751133908021, 0.315250351709,
        -0.226264693965, -0.129766867567, 0.097501605587, 0.027522865530,
        -0.031582039318, 0.000553842201, 0.004777257511, -0.001077301085]),
    "DAUB20": np.array([
        0.026670057901, 0.188176800078, 0.527201188932, 0.688459039454,
        0.281172343661, -0.249846424327, -0.195946274377, 0.127369340336,
        0.093057364604, -0.071394147166, -0.029457536822, 0.033212674059,
        0.003606553567, -0.010733175483, 0.001395351747, 0.001992405295,
        -0.000685856695, -0.000116466855, 0.000093588670, -0.000013264203]),
}


def _daub_filters(kind: str):
    h = np.asarray(_DAUB_H[kind.upper()], np.float64)
    g = np.array([(-1) ** k * h[len(h) - 1 - k] for k in range(len(h))])
    return h, g


def _daub_analysis_1d(x, axis, h, g):
    x = jnp.moveaxis(x, axis, -1)
    taps = [jnp.roll(x, -k, axis=-1) for k in range(len(h))]
    lo = sum(float(h[k]) * taps[k] for k in range(len(h)))[..., 0::2]
    hi = sum(float(g[k]) * taps[k] for k in range(len(g)))[..., 0::2]
    return jnp.moveaxis(lo, -1, axis), jnp.moveaxis(hi, -1, axis)


def _daub_synthesis_1d(lo, hi, axis, h, g):
    lo = jnp.moveaxis(lo, axis, -1)
    hi = jnp.moveaxis(hi, axis, -1)
    n2 = lo.shape[-1]
    up_lo = jnp.zeros(lo.shape[:-1] + (2 * n2,), lo.dtype)
    up_hi = jnp.zeros_like(up_lo)
    up_lo = up_lo.at[..., 0::2].set(lo)
    up_hi = up_hi.at[..., 0::2].set(hi)
    x = sum(float(h[k]) * jnp.roll(up_lo, k, axis=-1)
            + float(g[k]) * jnp.roll(up_hi, k, axis=-1)
            for k in range(len(h)))
    return jnp.moveaxis(x, -1, axis)


def daub_dwt2(x, levels: int = 1, kind: str = "DAUB4"):
    """2-D Daubechies DWT pyramid: (ll, [(lh, hl, hh)...] finest first)."""
    h, g = _daub_filters(kind)
    x = jnp.asarray(x, jnp.float32)
    details = []
    cur = x
    for _ in range(levels):
        lo, hi = _daub_analysis_1d(cur, -1, h, g)
        ll, lh = _daub_analysis_1d(lo, -2, h, g)
        hl, hh = _daub_analysis_1d(hi, -2, h, g)
        details.append((lh, hl, hh))
        cur = ll
    return cur, details


def daub_idwt2(ll, details, kind: str = "DAUB4"):
    h, g = _daub_filters(kind)
    cur = ll
    for lh, hl, hh in reversed(details):
        lo = _daub_synthesis_1d(cur, lh, -2, h, g)
        hi = _daub_synthesis_1d(hl, hh, -2, h, g)
        cur = _daub_synthesis_1d(lo, hi, -1, h, g)
    return cur


def _band_radius_mask(shape, level, R):
    """Coefficients whose spatial support center lies within radius R of
    the image center (DWT_keep_central_part semantics, per band)."""
    hy, wx = shape[-2], shape[-1]
    scale = 2 ** (level + 1)
    yy = (jnp.arange(hy) - hy / 2.0) * scale
    xx = (jnp.arange(wx) - wx / 2.0) * scale
    r = jnp.sqrt(yy[:, None] ** 2 + xx[None, :] ** 2)
    return (r <= R).astype(jnp.float32)


def wavelet_filter_2d(imgs, kind: str = "DAUB12", mode: str = "remove_scale",
                      scale: int = 0, output_scale: int = 0,
                      threshold_pct: float = 50.0, R: int = -1,
                      snr0: float = 0.1, snrf: float = 0.2,
                      white_noise: bool = False):
    """The reference WaveletFilter mode family (denoise.cpp apply()):

    - remove_scale: zero the detail quadrants at `scale`
    - soft_thresholding: soft-threshold details at the `threshold_pct`
      percentile of |coefficients|
    - bayesian: per-band Wiener shrinkage, noise from the finest HH MAD,
      prior SNR clipped to [snr0, snrf] (redesign of
      bayesian_wiener_filtering2D's point estimate; white_noise keeps the
      per-band noise flat)
    - adaptive_soft: per-band BayesShrink threshold sigma_n^2/sigma_x
    - central: keep coefficients whose support lies within radius R

    output_scale > 0 drops that many finest levels from the synthesis
    (image shrinks by 2^output_scale, reference denoise.cpp:188-193).
    """
    x = jnp.asarray(imgs, jnp.float32)
    single = x.ndim == 2
    if single:
        x = x[None]
    n = min(x.shape[-2:])
    max_levels = max(1, int(np.log2(n)) - 2)
    levels = max(max_levels, scale + 1, output_scale)
    levels = min(levels, int(np.log2(n)) - 1)
    ll, details = daub_dwt2(x, levels, kind)

    hh = details[0][2]
    sigma_n = jnp.median(jnp.abs(hh)) / 0.6745

    if mode == "remove_scale":
        s = min(scale, levels - 1)
        details = [tuple(jnp.zeros_like(b) for b in bands) if l == s
                   else bands for l, bands in enumerate(details)]
    elif mode == "soft_thresholding":
        allc = jnp.concatenate([jnp.abs(b).ravel()
                                for bands in details for b in bands])
        thr = jnp.percentile(allc, threshold_pct)
        details = [tuple(jnp.sign(b) * jnp.maximum(jnp.abs(b) - thr, 0.0)
                         for b in bands) for bands in details]
    elif mode == "bayesian":
        out_details = []
        for l, bands in enumerate(details):
            nb = []
            for b in bands:
                var_b = jnp.maximum(jnp.var(b), 1e-30)
                noise_var = sigma_n ** 2 if white_noise else \
                    jnp.minimum(sigma_n ** 2, var_b)
                sig_var = jnp.clip(var_b - noise_var,
                                   snr0 * noise_var, snrf * noise_var
                                   ) if l <= max(scale, 0) else \
                    jnp.maximum(var_b - noise_var, 0.0)
                nb.append(b * sig_var / (sig_var + noise_var))
            out_details.append(tuple(nb))
        details = out_details
    elif mode == "adaptive_soft":
        out_details = []
        for bands in details:
            nb = []
            for b in bands:
                sig = jnp.sqrt(jnp.maximum(jnp.var(b) - sigma_n ** 2, 1e-30))
                thr = sigma_n ** 2 / sig
                nb.append(jnp.sign(b) * jnp.maximum(jnp.abs(b) - thr, 0.0))
            out_details.append(tuple(nb))
        details = out_details
    elif mode == "central":
        Reff = R if R > 0 else n // 2
        details = [tuple(b * _band_radius_mask(b.shape, l, Reff)
                         for b in bands)
                   for l, bands in enumerate(details)]
    else:
        raise ValueError(f"unknown wavelet mode {mode!r}")

    if output_scale > 0:
        details = details[output_scale:]
    out = daub_idwt2(ll, details, kind)
    return out[0] if single else out
