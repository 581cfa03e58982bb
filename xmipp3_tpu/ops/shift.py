"""Batched 2-D shift estimation via FFT cross-correlation.

Replaces the reference HAL shift stack (AShiftCorrEstimator/ShiftCorrEstimator
CPU + CudaShiftCorrEstimator, reconstruction/ashift_corr_estimator.h:41-95,
cuda kernels; and data/filters.h bestShift :432-472 / bestNonwrappingShift
:482) with one fused jit kernel: rfft2 → cross-power → irfft2 → windowed
argmax → 3-point parabolic subpixel refinement.

Convention: returned (sx, sy) is the shift to APPLY to `other` (content moves
by +sx,+sy, as in ops.fourier.fourier_shift_2d / ops.geo.shift_2d_real) so it
registers onto `ref`.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def _parabola_peak_1d(ym1, y0, yp1):
    """Vertex offset of the parabola through (-1,ym1),(0,y0),(1,yp1) in [-.5,.5]."""
    denom = ym1 - 2.0 * y0 + yp1
    off = jnp.where(jnp.abs(denom) > 1e-12, 0.5 * (ym1 - yp1) / denom, 0.0)
    return jnp.clip(off, -0.5, 0.5)


@partial(jax.jit, static_argnames=("max_shift",))
def correlation_peaks_2d(corrs, max_shift: int | None = None):
    """Find subpixel peaks of centered correlation maps (B,H,W).

    Returns (sx, sy, peak_value): location of max relative to image center,
    restricted to |shift| <= max_shift (box window)."""
    B, H, W = corrs.shape
    cy, cx = H // 2, W // 2
    if max_shift is not None and max_shift > 0:
        yy = jnp.abs(jnp.arange(H) - cy)[:, None]
        xx = jnp.abs(jnp.arange(W) - cx)[None, :]
        window = (yy <= max_shift) & (xx <= max_shift)
        masked = jnp.where(window[None], corrs, -jnp.inf)
    else:
        masked = corrs
    flat_idx = jnp.argmax(masked.reshape(B, -1), axis=1)
    py = flat_idx // W
    px = flat_idx % W

    def tap(dy, dx):
        return corrs[jnp.arange(B),
                     jnp.clip(py + dy, 0, H - 1),
                     jnp.clip(px + dx, 0, W - 1)]

    offx = _parabola_peak_1d(tap(0, -1), tap(0, 0), tap(0, 1))
    offy = _parabola_peak_1d(tap(-1, 0), tap(0, 0), tap(1, 0))
    peak = tap(0, 0)
    sx = px.astype(jnp.float32) + offx - cx
    sy = py.astype(jnp.float32) + offy - cy
    return sx, sy, peak


@partial(jax.jit, static_argnames=("max_shift", "normalize"))
def best_shift(ref, others, max_shift: int | None = None,
               normalize: bool = False):
    """1-vs-N shift estimation (reference bestShift / AShiftCorrEstimator).

    ref: (H,W) or (B,H,W) matching others; others: (B,H,W).
    Returns (sx, sy, corr_peak) arrays of shape (B,)."""
    others = jnp.asarray(others, jnp.float32)
    ref = jnp.asarray(ref, jnp.float32)
    if ref.ndim == 2:
        ref = ref[None]
    B, H, W = others.shape
    F_ref = jnp.fft.rfft2(ref)
    F_oth = jnp.fft.rfft2(others)
    cross = F_oth * jnp.conj(F_ref)
    if normalize:  # phase correlation
        cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    corr = jnp.fft.fftshift(jnp.fft.irfft2(cross, s=(H, W)), axes=(-2, -1))
    sx, sy, peak = correlation_peaks_2d(corr, max_shift)
    # peak at center means zero shift; correlation of other vs ref shifted by s
    # peaks at s where other(x) ≈ ref(x - s); to register other onto ref we
    # apply the negative.
    return -sx, -sy, peak / (H * W)


@partial(jax.jit, static_argnames=("max_shift",))
def best_shift_pairs(a, b, max_shift: int | None = None):
    """Pairwise shift estimation between stacks a and b (B,H,W) each."""
    return best_shift(a, b, max_shift=max_shift)


def align_translationally(ref, others, max_shift: int | None = None,
                          order: int = 1):
    """Estimate and apply shifts; returns (aligned, sx, sy, corr)."""
    from xmipp3_tpu.ops.geo import shift_2d_real
    sx, sy, c = best_shift(ref, others, max_shift=max_shift)
    return shift_2d_real(others, sx, sy, order=order), sx, sy, c


@jax.jit
def correlation_index(a, b):
    """Normalized cross-correlation of batches (the reference
    correlation_index / CorrelationComputer merit, amerit_computer.h)."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a = a[None]
    if b.ndim == 2:
        b = b[None]
    am = a - a.mean(axis=(-2, -1), keepdims=True)
    bm = b - b.mean(axis=(-2, -1), keepdims=True)
    num = (am * bm).sum(axis=(-2, -1))
    den = jnp.sqrt((am * am).sum(axis=(-2, -1)) * (bm * bm).sum(axis=(-2, -1)))
    return num / jnp.maximum(den, 1e-12)


@jax.jit
def correlation_matrix(a, b):
    """Centered circular cross-correlation map (reference
    correlation_matrix, data/filters.h — FFT cross-power without
    normalization, CenterFFT'd so zero lag sits at (H//2, W//2)).
    Parity: function_tests/test_filters_main.cpp correlation_matrix expects
    center == sum(a*b) for self-correlation."""
    a = jnp.asarray(a, jnp.float32)
    b = jnp.asarray(b, jnp.float32)
    if a.ndim == 2:
        a = a[None]
    if b.ndim == 2:
        b = b[None]
    corr = jnp.fft.ifft2(jnp.fft.fft2(a) * jnp.conj(jnp.fft.fft2(b)))
    return jnp.fft.fftshift(jnp.real(corr), axes=(-2, -1))
