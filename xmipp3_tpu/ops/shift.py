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


def _windowed_dft_tables(n: int, k: int, offsets, rfft_axis: bool):
    """cos/sin evaluation tables (k, D) for a direct windowed inverse DFT.

    rfft_axis=True: k = n//2+1 rfft bins with [1,2,…,2,(1|2)] Hermitian
    duplication folded in. rfft_axis=False: k = n full signed-frequency
    bins (fftfreq order). offsets: displacement samples (pixels)."""
    offsets = np.asarray(offsets, np.float64)
    if rfft_axis:
        freqs = np.arange(k) / n
        dup = np.full(k, 2.0)
        dup[0] = 1.0
        if n % 2 == 0:
            dup[-1] = 1.0
    else:
        freqs = np.fft.fftfreq(n)
        dup = np.ones(k)
    ang = 2 * np.pi * freqs[:, None] * offsets[None, :]
    return ((np.cos(ang) * dup[:, None]).astype(np.float32),
            (np.sin(ang) * dup[:, None]).astype(np.float32))


@partial(jax.jit, static_argnames=("H", "W", "max_shift"))
def windowed_cross_peaks(cross, H: int, W: int, max_shift: int):
    """Subpixel correlation peaks from rfft2 cross-spectra, evaluated ONLY
    on the ±max_shift displacement window via separable DFT matmuls.

    The classic path materializes the full (B, H, W) irfft2 correlation and
    then masks all but (2·ms+1)² values to -inf — at ms=8 on 512² patches
    that computes 1000× more correlation values than it uses, and batched
    2-D FFTs are latency-bound on TPU besides (CLAUDE.md r4). Here
    c(sy, sx) = (1/HW)·Σ_k X_k e^{2πi k·s} is contracted straight onto the
    window (one extra ring of samples for the 3-point parabola).

    cross: (B, H, W//2+1) complex rfft2 cross-power. Returns (sx, sy, peak)
    with the same semantics and normalization as
    fftshift(irfft2(cross)) + correlation_peaks_2d."""
    B = cross.shape[0]
    ms = int(max_shift)
    offs = np.arange(-(ms + 1), ms + 2, dtype=np.float64)   # parabola ring
    D = len(offs)
    hp = jax.lax.Precision.HIGH
    Cx, Sx = (jnp.asarray(t) for t in
              _windowed_dft_tables(W, W // 2 + 1, offs, True))
    Cy, Sy = (jnp.asarray(t) for t in
              _windowed_dft_tables(H, H, offs, False))
    xr, xi = jnp.real(cross), jnp.imag(cross)
    # contract the rfft x-axis onto the window: T = Σ_kx X e^{2πi kx sx}
    tr = (jnp.einsum("bhk,kd->bhd", xr, Cx, precision=hp)
          - jnp.einsum("bhk,kd->bhd", xi, Sx, precision=hp))
    ti = (jnp.einsum("bhk,kd->bhd", xr, Sx, precision=hp)
          + jnp.einsum("bhk,kd->bhd", xi, Cx, precision=hp))
    # contract the full y-axis; result is real (Hermitian input)
    corr = (jnp.einsum("bhd,ha->bad", tr, Cy, precision=hp)
            - jnp.einsum("bhd,ha->bad", ti, Sy, precision=hp)) / (H * W)
    # argmax restricted to |s| <= ms (the border ring is parabola margin)
    inner = (np.abs(offs)[:, None] <= ms) & (np.abs(offs)[None, :] <= ms)
    masked = jnp.where(jnp.asarray(inner)[None], corr, -jnp.inf)
    flat = jnp.argmax(masked.reshape(B, -1), axis=1)
    py = flat // D
    px = flat % D

    def tap(dy, dx):
        return corr[jnp.arange(B), py + dy, px + dx]

    offx = _parabola_peak_1d(tap(0, -1), tap(0, 0), tap(0, 1))
    offy = _parabola_peak_1d(tap(-1, 0), tap(0, 0), tap(1, 0))
    sx = px.astype(jnp.float32) + offx - (ms + 1)
    sy = py.astype(jnp.float32) + offy - (ms + 1)
    return sx, sy, tap(0, 0)


def rfft2_any(x):
    """rfft2 through the matmul-DFT fast path when the image is small enough
    to be latency-bound (ops/dft_mm.py), jnp.fft otherwise."""
    if max(x.shape[-2:]) <= 256:
        from xmipp3_tpu.ops.dft_mm import rfft2_mm
        return rfft2_mm(x)
    return jnp.fft.rfft2(x)


@partial(jax.jit, static_argnames=("max_shift", "normalize", "W"))
def best_shift_from_spectra(F_ref, F_oth, max_shift: int | None = None,
                            normalize: bool = False, W: int | None = None):
    """Spectra-level core of best_shift: callers that keep a fixed reference
    across iterations (ops/match.refine_winners) precompute rfft2(ref) once
    instead of re-transforming it every call.

    F_ref, F_oth: (B, H, W//2+1) rfft2 spectra; pass W explicitly for
    odd-width images (defaults to even 2·(k−1))."""
    H = F_oth.shape[-2]
    if W is None:
        W = 2 * (F_oth.shape[-1] - 1)
    cross = F_oth * jnp.conj(F_ref)
    if normalize:  # phase correlation
        cross = cross / jnp.maximum(jnp.abs(cross), 1e-12)
    if max_shift is not None and 0 < max_shift and \
            2 * max_shift + 3 <= min(H, W) // 2:
        sx, sy, peak = windowed_cross_peaks(cross, H, W, int(max_shift))
        return -sx, -sy, peak / (H * W)
    if max(H, W) <= 256:
        from xmipp3_tpu.ops.dft_mm import irfft2_mm
        corr = jnp.fft.fftshift(irfft2_mm(cross, (H, W)), axes=(-2, -1))
    else:
        corr = jnp.fft.fftshift(jnp.fft.irfft2(cross, s=(H, W)),
                                axes=(-2, -1))
    sx, sy, peak = correlation_peaks_2d(corr, max_shift)
    # peak at center means zero shift; correlation of other vs ref shifted by s
    # peaks at s where other(x) ≈ ref(x - s); to register other onto ref we
    # apply the negative.
    return -sx, -sy, peak / (H * W)


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
    W = others.shape[-1]
    return best_shift_from_spectra(rfft2_any(ref), rfft2_any(others),
                                   max_shift=max_shift, normalize=normalize,
                                   W=W)


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
