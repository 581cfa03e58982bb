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


def _int_shell_bins(shape):
    """Integer-frequency shells idx = round(f*X) over the rfft layout —
    the reference frc_dpr binning (resolution_fsc.cpp:188 caller)."""
    if len(shape) == 3:
        D, H, W = shape
        fz = np.fft.fftfreq(D)[:, None, None]
        fy = np.fft.fftfreq(H)[None, :, None]
        fx = np.fft.rfftfreq(W)[None, None, :]
        r = np.sqrt(fz * fz + fy * fy + fx * fx)
        X = W
    else:
        H, W = shape
        fy = np.fft.fftfreq(H)[:, None]
        fx = np.fft.rfftfreq(W)[None, :]
        r = np.sqrt(fy * fy + fx * fx)
        X = W
    nshell = X // 2 + 1
    idx = np.minimum(np.round(r * X).astype(np.int32), nshell - 1)
    return idx.ravel(), nshell, X


@partial(jax.jit, static_argnames=("nshell", "do_dpr"))
def _frc_dpr_device(F1, F2, bins, nshell: int, do_dpr: bool):
    cross = jnp.real(F1 * jnp.conj(F2))
    p1 = jnp.abs(F1) ** 2
    p2 = jnp.abs(F2) ** 2
    z = jnp.zeros(nshell)
    num = z.at[bins].add(cross)
    d1 = z.at[bins].add(p1)
    d2 = z.at[bins].add(p2)
    cnt = z.at[bins].add(1.0)
    frc = num / jnp.maximum(jnp.sqrt(d1 * d2), 1e-30)
    frc_noise = 2.0 / jnp.sqrt(jnp.maximum(cnt, 1.0))
    err = z.at[bins].add(jnp.abs(F1 - F2) ** 2)
    error_l2 = jnp.sqrt(err / jnp.maximum(cnt, 1.0))
    if do_dpr:
        w = jnp.abs(F1) + jnp.abs(F2)
        delta = jnp.rad2deg(jnp.angle(F1 * jnp.conj(F2)))
        tw = z.at[bins].add(w * delta * delta)
        dw = z.at[bins].add(w)
        dpr = jnp.sqrt(tw / jnp.maximum(dw, 1e-30))
    else:
        dpr = jnp.zeros(nshell)
    return frc, frc_noise, dpr, error_l2


def frc_dpr_curves(a1, a2, sampling: float = 1.0, do_dpr: bool = False):
    """Reference frc_dpr: integer shells, FRC + random-noise FRC (2/sqrt(n))
    + amplitude-weighted DPR (degrees) + per-shell L2 error.

    Returns dict of numpy arrays keyed freq (1/Å), freq_dig, frc, frc_noise,
    dpr, error_l2 over shells i=0..X/2 (resolution_fsc.cpp:115-163 output
    contract)."""
    a1 = np.asarray(a1, np.float32)
    a2 = np.asarray(a2, np.float32)
    bins, nshell, X = _int_shell_bins(a1.shape)
    F1 = jnp.fft.rfftn(jnp.asarray(a1)).ravel()
    F2 = jnp.fft.rfftn(jnp.asarray(a2)).ravel()
    frc, frc_noise, dpr, error_l2 = _frc_dpr_device(
        F1, F2, jnp.asarray(bins), nshell, do_dpr)
    i = np.arange(nshell)
    return {"freq_dig": i / X,
            "freq": i / (X * sampling),
            "frc": np.asarray(frc),
            "frc_noise": np.asarray(frc_noise),
            "dpr": np.asarray(dpr),
            "error_l2": np.asarray(error_l2)}


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
