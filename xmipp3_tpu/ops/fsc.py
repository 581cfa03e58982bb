"""Fourier Shell Correlation and related resolution measures.

Replaces reference resolution_fsc (resolution_fsc.h:33) and the FRC used by
tests; shells in the rfft layout with segment sums (no per-shell loops).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _shell_index_3d(D, H, W, nbins):
    fz = np.fft.fftfreq(D)[:, None, None]
    fy = np.fft.fftfreq(H)[None, :, None]
    fx = np.fft.rfftfreq(W)[None, None, :]
    r = np.sqrt(fz * fz + fy * fy + fx * fx)
    return np.minimum((r / 0.5 * nbins).astype(np.int32), nbins - 1)


@partial(jax.jit, static_argnames=("nbins",))
def fsc_3d(vol1, vol2, nbins: int | None = None):
    """FSC curve between two volumes. Returns (freqs, fsc) of length nbins.

    freqs are digital (cycles/px); convert with f/sampling for 1/Å."""
    vol1 = jnp.asarray(vol1, jnp.float32)
    vol2 = jnp.asarray(vol2, jnp.float32)
    D, H, W = vol1.shape
    if nbins is None:
        nbins = D // 2
    F1 = jnp.fft.rfftn(vol1)
    F2 = jnp.fft.rfftn(vol2)
    bins = jnp.asarray(_shell_index_3d(D, H, W, nbins).ravel())
    cross = (F1 * jnp.conj(F2)).ravel()
    p1 = (jnp.abs(F1) ** 2).ravel()
    p2 = (jnp.abs(F2) ** 2).ravel()
    num = jnp.zeros(nbins).at[bins].add(jnp.real(cross))
    d1 = jnp.zeros(nbins).at[bins].add(p1)
    d2 = jnp.zeros(nbins).at[bins].add(p2)
    fsc = num / jnp.maximum(jnp.sqrt(d1 * d2), 1e-12)
    freqs = (jnp.arange(nbins) + 0.5) * (0.5 / nbins)
    return freqs, fsc


def fsc_resolution(freqs, fsc, threshold: float = 0.143,
                   sampling: float = 1.0) -> float:
    """Resolution (Å) at the FSC threshold crossing."""
    freqs = np.asarray(freqs)
    fsc = np.asarray(fsc)
    below = np.where(fsc < threshold)[0]
    if len(below) == 0:
        return 2.0 * sampling  # Nyquist
    i = below[0]
    if i == 0:
        return float("inf")
    # linear interpolation of the crossing
    f = freqs[i - 1] + (freqs[i] - freqs[i - 1]) * (
        (fsc[i - 1] - threshold) / max(fsc[i - 1] - fsc[i], 1e-12))
    return float(sampling / f)


@partial(jax.jit, static_argnames=("nbins",))
def frc_2d(img1, img2, nbins: int | None = None):
    """Fourier Ring Correlation between two images."""
    img1 = jnp.asarray(img1, jnp.float32)
    img2 = jnp.asarray(img2, jnp.float32)
    H, W = img1.shape[-2:]
    if nbins is None:
        nbins = H // 2
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.rfftfreq(W)[None, :]
    r = np.sqrt(fy * fy + fx * fx)
    bins = jnp.asarray(np.minimum((r / 0.5 * nbins).astype(np.int32),
                                  nbins - 1).ravel())
    F1 = jnp.fft.rfft2(img1).ravel()
    F2 = jnp.fft.rfft2(img2).ravel()
    num = jnp.zeros(nbins).at[bins].add(jnp.real(F1 * jnp.conj(F2)))
    d1 = jnp.zeros(nbins).at[bins].add(jnp.abs(F1) ** 2)
    d2 = jnp.zeros(nbins).at[bins].add(jnp.abs(F2) ** 2)
    freqs = (jnp.arange(nbins) + 0.5) * (0.5 / nbins)
    return freqs, num / jnp.maximum(jnp.sqrt(d1 * d2), 1e-12)


def frc_rfactor(vol1, vol2, min_freq: float = -2.0, max_freq: float = 1.0):
    """R-factor between two volumes: sum(||F1|-|F2||)/sum(|F1|) over the
    half (rfft) spectrum with digital |w| in (min_freq, max_freq) — the
    reference frc_dpr's do_rfactor output (resolution_fsc.cpp:188; value
    pinned to 0.134661 on the embedded 3x3x3 fixture of
    function_tests/test_resolution_frc.cpp by tests/test_golden_frc.py)."""
    v1 = jnp.asarray(vol1, jnp.float32)
    v2 = jnp.asarray(vol2, jnp.float32)
    D, H, W = v1.shape
    F1 = jnp.abs(jnp.fft.rfftn(v1))
    F2 = jnp.abs(jnp.fft.rfftn(v2))
    fz = np.fft.fftfreq(D)[:, None, None]
    fy = np.fft.fftfreq(H)[None, :, None]
    fx = np.fft.rfftfreq(W)[None, None, :]
    R = jnp.asarray(np.sqrt(fz * fz + fy * fy + fx * fx), jnp.float32)
    m = (R > min_freq) & (R < max_freq)
    num = jnp.where(m, jnp.abs(F1 - F2), 0.0).sum()
    den = jnp.where(m, F1, 0.0).sum()
    return num / den
