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
