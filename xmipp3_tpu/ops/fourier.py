"""Batched FFT helpers + FFT-friendly size tables.

Replaces the reference HAL FFT stack (AFT/FFTwT/CudaFFT + cuFFTAdvisor
autotuning, SURVEY.md §2.2/§2.5): on TPU, XLA owns FFT planning, so the only
tuning knob that matters is choosing padded sizes whose factorizations XLA
likes (powers of small primes) — a static good-size table replaces
cuFFTAdvisor's live benchmark search (reference cuda_fft.cpp:316-326).

All transforms are float32/complex64, batched over the leading axis.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# good sizes
# ---------------------------------------------------------------------------

def _is_smooth(n: int, primes=(2, 3, 5)) -> bool:
    for p in primes:
        while n % p == 0:
            n //= p
    return n == 1


def next_good_fft_size(n: int) -> int:
    """Smallest 5-smooth integer >= n (static table stand-in for cuFFTAdvisor)."""
    while not _is_smooth(n):
        n += 1
    return n


def good_fft_sizes(n: int, count: int = 8) -> list[int]:
    out, m = [], n
    while len(out) < count:
        m = next_good_fft_size(m)
        out.append(m)
        m += 1
    return out


# ---------------------------------------------------------------------------
# frequency grids (rfft layout)
# ---------------------------------------------------------------------------

def freq_grid_2d(h: int, w: int):
    """(fy, fx) normalized frequencies for the rfft2 layout: fy (h,1), fx (1,w//2+1)."""
    fy = np.fft.fftfreq(h).astype(np.float32)[:, None]
    fx = np.fft.rfftfreq(w).astype(np.float32)[None, :]
    return fy, fx


def radial_freq_2d(h: int, w: int):
    fy, fx = freq_grid_2d(h, w)
    return np.sqrt(fy * fy + fx * fx).astype(np.float32)


def freq_grid_3d(d: int, h: int, w: int):
    fz = np.fft.fftfreq(d).astype(np.float32)[:, None, None]
    fy = np.fft.fftfreq(h).astype(np.float32)[None, :, None]
    fx = np.fft.rfftfreq(w).astype(np.float32)[None, None, :]
    return fz, fy, fx


# ---------------------------------------------------------------------------
# batched transforms
# ---------------------------------------------------------------------------

@jax.jit
def rfft2(imgs):
    return jnp.fft.rfft2(jnp.asarray(imgs, jnp.float32))


@partial(jax.jit, static_argnames=("shape",))
def irfft2(spec, shape=None):
    return jnp.fft.irfft2(spec, s=shape)


def phase_ramp_1d(freqs, shifts):
    """exp(-2πi f s) for a 1-D frequency vector and a batch of shifts.

    Fourier shift phases are separable — exp(-2πi(fx·sx + fy·sy)) is the
    outer product of two 1-D phase vectors, so evaluating two 1-D exps and
    broadcasting costs H+K transcendentals per image instead of H·K (the
    2-D grid form burns ~268 M complex exps per dispatch on a 32×4096²
    movie and measurably dominates the HBM-bound shift pipeline — r5
    ablation, CLAUDE.md). shifts (...,) -> (..., len(freqs)) complex64."""
    ang = (-2 * jnp.pi) * jnp.asarray(shifts, jnp.float32)[..., None] * freqs
    return jax.lax.complex(jnp.cos(ang), jnp.sin(ang))


def shift_spec_2d(spec, sx, sy, H: int, W: int):
    """Multiply an rfft2 half-spectrum (..., H, W//2+1) by the separable
    shift phase for per-image shifts sx/sy (...,)."""
    px = phase_ramp_1d(jnp.fft.rfftfreq(W).astype(jnp.float32), sx)
    py = phase_ramp_1d(jnp.fft.fftfreq(H).astype(jnp.float32), sy)
    return spec * py[..., :, None] * px[..., None, :]


@jax.jit
def fourier_shift_2d(imgs, sx, sy):
    """Subpixel periodic shift by (sx, sy) pixels via Fourier phase ramp.

    Replaces cuda_gpu_geo_shift_transformer (SURVEY.md §2.5). Positive sx
    moves content toward +x (same convention as apply_alignment_2d shifts)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    sx = jnp.reshape(jnp.asarray(sx, jnp.float32), (-1,))
    sy = jnp.reshape(jnp.asarray(sy, jnp.float32), (-1,))
    spec = shift_spec_2d(jnp.fft.rfft2(imgs), sx, sy, H, W)
    out = jnp.fft.irfft2(spec, s=(H, W))
    return out[0] if single else out


@jax.jit
def center_fft_2d(spec_full):
    """fftshift both axes (xmipp CenterFFT for display/PSD)."""
    return jnp.fft.fftshift(spec_full, axes=(-2, -1))


def hermitian_full_from_half(spec_half, w: int):
    """Rebuild the full complex plane from the rfft half (for algorithms that
    need the whole plane, e.g. PSD display; reference half2whole
    psd_estimator.h:53)."""
    H = spec_half.shape[-2]
    left = spec_half
    cols = w - spec_half.shape[-1]
    idx = (np.arange(1, cols + 1))[::-1]
    conj_part = jnp.conj(spec_half[..., :, idx])
    row_idx = (-np.arange(H)) % H
    conj_part = conj_part[..., row_idx, :]
    return jnp.concatenate([left, conj_part], axis=-1)


# ---------------------------------------------------------------------------
# radial averaging (shared by PSD/CTF/resolution code)
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("nbins",))
def radial_average_half(power, nbins: int):
    """Radially average an rfft-layout 2D array into nbins rings of width
    0.5/nbins cycles/px. power: (..., H, W//2+1). Returns (..., nbins)."""
    H = power.shape[-2]
    W = 2 * (power.shape[-1] - 1)
    r = radial_freq_2d(H, W)
    bins = jnp.clip((r / 0.5 * nbins).astype(jnp.int32), 0, nbins - 1)
    flat_bins = bins.ravel()
    flat = power.reshape(power.shape[:-2] + (-1,))
    sums = jax.vmap(lambda p: jnp.zeros(nbins).at[flat_bins].add(p))(
        flat.reshape(-1, flat.shape[-1]))
    counts = jnp.zeros(nbins).at[flat_bins].add(1.0)
    out = sums / jnp.maximum(counts, 1.0)
    return out.reshape(power.shape[:-2] + (nbins,))


def fft_idx2digfreq(idx: int, dim: int) -> float:
    """The reference FFT_IDX2DIGFREQ: w = idx/dim for idx <= dim/2 else
    (idx-dim)/dim. NOTE the even-size Nyquist bin maps to +0.5 (numpy
    fftfreq gives -0.5 there); pinned by test_golden_multidim.py from
    function_tests/test_fftw_main.cpp:80-109."""
    return (idx if idx <= dim // 2 else idx - dim) / float(dim)
