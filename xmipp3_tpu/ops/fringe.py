"""Fringe processing: spiral phase transform and fringe-pattern
demodulation (used for CTF ring demodulation).

Contract: reference reconstruction/fringe_processing.{h,cpp} — SPTH
(spiral phase transform, Larkin's 2D quadrature), orientation/direction
maps, and demodulate() which recovers the modulating phase and envelope of
a fringe pattern. The TPU form is a handful of whole-image FFT multiplies.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@jax.jit
def spth(im):
    """Spiral phase transform: IFFT( FFT(im) * e^{i phi_f} ) with
    e^{i phi_f} = (fx + i fy)/|f| (fringe_processing.cpp SPTH). Returns the
    complex quadrature image."""
    im = jnp.asarray(im, jnp.float32)
    H, W = im.shape[-2:]
    fy = jnp.fft.fftfreq(H).astype(jnp.float32)[:, None]
    fx = jnp.fft.fftfreq(W).astype(jnp.float32)[None, :]
    r = jnp.sqrt(fx ** 2 + fy ** 2)
    spiral = jnp.where(r > 0, (fx + 1j * fy) / jnp.maximum(r, 1e-12), 0.0)
    return jnp.fft.ifft2(jnp.fft.fft2(im) * spiral)


@jax.jit
def orientation_map(im, sigma=2.0):
    """Local fringe orientation in [-pi/2, pi/2) from smoothed gradient
    tensor components (fringe_processing orMinDer role)."""
    im = jnp.asarray(im, jnp.float32)
    gy, gx = jnp.gradient(im)
    H, W = im.shape
    fy = jnp.fft.fftfreq(H).astype(jnp.float32)[:, None]
    fx = jnp.fft.fftfreq(W).astype(jnp.float32)[None, :]
    G = jnp.exp(-2 * (jnp.pi * sigma) ** 2 * (fx ** 2 + fy ** 2))
    smooth = lambda x: jnp.real(jnp.fft.ifft2(jnp.fft.fft2(x) * G))
    jxx, jxy, jyy = smooth(gx * gx), smooth(gx * gy), smooth(gy * gy)
    return 0.5 * jnp.arctan2(2 * jxy, jxx - jyy)


def demodulate(im, sigma_or=2.0):
    """Demodulate a fringe pattern: returns (phase, mod).

    mod (the envelope) = sqrt(im^2 + |Q|^2) where Q is the direction-
    corrected quadrature from the SPTH; phase = atan2(Q, im) (reference
    demodulate(); the direction map resolves the quadrature sign)."""
    im = jnp.asarray(im, jnp.float32)
    im = im - im.mean()
    q = spth(im)
    beta = orientation_map(im, sigma_or)
    # direction-corrected real quadrature: Re{ conj(i e^{i beta}) * q }
    Q = jnp.real(jnp.conj(1j * jnp.exp(1j * beta)) * q)
    mod = jnp.sqrt(im ** 2 + Q ** 2)
    phase = jnp.arctan2(Q, im)
    return phase, mod


def simul_pattern(kind: str, nx: int, ny: int, noise_level: float = 0.0,
                  freq: float = 1.0, coefs=None, rng=None):
    """Synthetic fringe patterns (reference simulPattern,
    fringe_processing.cpp:42-108), output in DIRECT coordinates (the
    reference resets STARTING to 0 before returning). Kinds:
      open:        cos(j·c·freq)
      closed:      cos(50·exp(-((i·c·freq)^2+(j·c·freq)^2)/2))
      complex_open/complex_closed: same with a Zernike phase term from
      `coefs` added inside the cosine
      closed_mod:  closed fringes under a Gaussian modulation envelope
    with c = 2/max(nx, ny) over centered logical coords. Values pinned by
    tests/test_golden_fringe.py against the embedded constants of
    function_tests/test_fringe_processing_main.cpp."""
    c = 2.0 / max(nx, ny)
    i = (np.arange(ny) - ny // 2)[:, None] * c
    j = (np.arange(nx) - nx // 2)[None, :] * c
    phase = 0.0
    if kind.startswith("complex") and coefs is not None:
        from xmipp3_tpu.ops.zernike import zernike2d_pols
        phase = zernike2d_pols(np.asarray(coefs, float), (ny, nx))
    if kind in ("open", "complex_open"):
        im = np.cos(j * freq + phase) * np.ones((ny, nx))
    elif kind in ("closed", "complex_closed"):
        im = np.cos(50 * np.exp(-0.5 * ((i * freq) ** 2 + (j * freq) ** 2))
                    + phase)
    elif kind == "closed_mod":
        env = np.exp(-0.5 * ((i * freq) ** 2 + (j * freq) ** 2) / 4.0)
        im = env * np.cos(50 * np.exp(
            -0.5 * ((i * freq) ** 2 + (j * freq) ** 2)))
    else:
        raise ValueError(f"unknown pattern kind '{kind}'")
    if noise_level > 0:
        rng = np.random.default_rng() if rng is None else rng
        im = im + rng.normal(0.0, noise_level, im.shape)
    return np.broadcast_to(im, (ny, nx)).astype(np.float64).copy()


@partial(jax.jit, static_argnames=())
def _annular_bandpass(im, rmin, rmax):
    """normalizeWB's annular filter (fringe_processing.cpp:298-330):
    logistic high cut at freq1 = X/(rang/15), Gaussian low suppression at
    freq2 = X/rang with rang = (rmax - rmin)/2, applied on CENTERED
    frequencies in pixel units."""
    H, W = im.shape[-2:]
    rang = (rmax - rmin) / 2.0
    freq2 = W / jnp.maximum(rang, 1e-6)
    freq1 = W / jnp.maximum(rang / 15.0, 1e-6)
    ii = (jnp.arange(H) - H // 2)[:, None].astype(jnp.float32)
    jj = (jnp.arange(W) - W // 2)[None, :].astype(jnp.float32)
    r2 = ii * ii + jj * jj
    Hf = (1.0 / (1.0 + jnp.exp((jnp.sqrt(r2) - freq1) / 10.0))) \
        * (1.0 - jnp.exp(-r2 / (2.0 * freq2 * freq2)))
    Hf = jnp.fft.ifftshift(Hf)
    return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(im) * Hf))


def normalize_wb(im, rmin: float, rmax: float, roi=None):
    """normalizeWB (fringe_processing.cpp:298-360): annular band-pass,
    SPTH quadrature, imN = cos(atan2(|quadrature|, bandpassed)) in
    [-1, 1], mod_map = modulation magnitude; zero outside the ROI."""
    im = jnp.asarray(im, jnp.float32)
    bp = _annular_bandpass(im, float(rmin), float(rmax))
    q = spth(bp)
    mod = jnp.sqrt(jnp.abs(q) ** 2 + bp ** 2)
    imN = jnp.cos(jnp.arctan2(jnp.abs(q), bp))
    if roi is not None:
        roi = jnp.asarray(roi, bool)
        imN = jnp.where(roi, imN, 0.0)
        mod = jnp.where(roi, mod, 0.0)
    return imN, mod


def unwrap_phase(wrapped, quality=None):
    """2-D phase unwrapping (reference `unwrapping`,
    fringe_processing.cpp:552-700 — a quality-guided flood fill with a
    predictor/corrector).  Design shift: the flood fill is inherently
    serial, so the TPU form solves the equivalent weighted least-squares
    problem  min ||grad(u) - W(grad(wrapped))||^2  by the classic
    DCT/Poisson method (Ghiglia & Romero 1994) — identical results on
    smooth phases (the regime the reference's demodulation feeds it),
    one FFT dispatch."""
    w = jnp.asarray(wrapped, jnp.float32)
    H, W = w.shape

    def wrapd(x):
        return (x + jnp.pi) % (2 * jnp.pi) - jnp.pi

    dx = wrapd(jnp.diff(w, axis=1, append=w[:, -1:]))
    dy = wrapd(jnp.diff(w, axis=0, append=w[-1:, :]))
    rho = (dx - jnp.roll(dx, 1, axis=1)) + (dy - jnp.roll(dy, 1, axis=0))
    # Neumann Poisson solve via DCT-II (mirror-extend with rFFTs)
    ext = jnp.concatenate([rho, rho[::-1, :]], axis=0)
    ext = jnp.concatenate([ext, ext[:, ::-1]], axis=1)
    F = jnp.fft.fft2(ext)
    ky = jnp.arange(2 * H)[:, None]
    kx = jnp.arange(2 * W)[None, :]
    denom = (2 * jnp.cos(jnp.pi * ky / H) + 2 * jnp.cos(jnp.pi * kx / W)
             - 4.0)
    denom = jnp.where(jnp.abs(denom) < 1e-9, 1.0, denom)
    U = jnp.where((ky == 0) & (kx == 0), 0.0, F / denom)
    u = jnp.real(jnp.fft.ifft2(U))[:H, :W]
    # anchor to the wrapped phase at the best-quality pixel
    if quality is not None:
        q = jnp.abs(jnp.asarray(quality))
        k = jnp.argmax(q)
    else:
        k = (H // 2) * W + W // 2
    off = w.ravel()[k] - u.ravel()[k]
    return u + off


def first_psd_zero(enhanced_psd, rmin: float, rmax: float,
                   num_angles: int = 90):
    """firsPSDZero (fringe_processing.cpp:1022-1080): walk a ray per
    angle from rmin/2 outward and record the first point whose enhanced-
    PSD value falls below the (10th-percentile + 98th-percentile)/2
    threshold.  Returns (x, y) arrays, one point per angle (centered
    coordinates).  TPU shape: ALL rays sample in one vectorized gather."""
    psd = np.asarray(enhanced_psd, np.float64)
    H, W = psd.shape
    lo = np.percentile(psd, 0.1 * 100 / 100)
    eff0 = np.percentile(psd, 0.1)
    effF = np.percentile(psd, 98.0)
    thrs = 0.5 * (eff0 + effF)
    angles = np.arange(num_angles) * (2 * np.pi / num_angles)
    n_steps = 256
    tt = np.linspace(rmin / 2.0, rmax / 2.0, n_steps)
    xs = tt[None, :] * np.cos(angles)[:, None]           # (A, S)
    ys = tt[None, :] * np.sin(angles)[:, None]
    xi = np.clip(np.round(xs).astype(int) + W // 2, 0, W - 1)
    yi = np.clip(np.round(ys).astype(int) + H // 2, 0, H - 1)
    vals = psd[yi, xi]                                   # (A, S)
    below = vals < thrs
    first = np.where(below.any(axis=1), below.argmax(axis=1), n_steps - 1)
    return (xs[np.arange(num_angles), first],
            ys[np.arange(num_angles), first])
