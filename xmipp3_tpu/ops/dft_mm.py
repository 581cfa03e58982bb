"""Small-size DFTs as MXU matmuls.

Batched tiny FFTs are LATENCY-bound on TPU: a dispatch of ~131k 1-D
transforms costs ~9 ms regardless of length, and batched 64² 2-D FFTs run
at a similar floor (measured r4/r5 on v5e — see CLAUDE.md and
tools/ablate_config1.py). For n ≤ MM_MAX_SIZE the same transform written
as dense cos/sin table contractions rides the MXU instead: exact to f32
roundoff (~2e-6 roundtrip, same construction as
ops/shear_rotate._shear_tables) and ~5-10x faster at the 64²-stack sizes
of the 2-D alignment pipeline (bench config 1). Past ~256 px the O(n²)
matmul FLOPs overtake the latency win and callers keep jnp.fft.

All entry points return the SAME layouts/dtypes as their jnp.fft
counterparts and build complex values inside jit only (axon quirk:
eager complex ops raise UNIMPLEMENTED).
"""
from __future__ import annotations

from functools import lru_cache

import jax
import jax.numpy as jnp
import numpy as np

MM_MAX_SIZE = 256

_HP = jax.lax.Precision.HIGHEST


@lru_cache(maxsize=32)
def _rfft_tables(n: int):
    """Forward rfft (n, k) cos/-sin and inverse (k, n) tables with the
    [1,2,…,2,(1|2)] Hermitian duplication and 1/n folded into the
    inverse (identical construction to shear_rotate._shear_tables)."""
    k = n // 2 + 1
    ang = 2 * np.pi * np.outer(np.arange(n), np.arange(k)) / n
    dup = np.full(k, 2.0, np.float64)
    dup[0] = 1.0
    if n % 2 == 0:
        dup[-1] = 1.0
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32),
            (np.cos(ang) * dup[None, :] / n).astype(np.float32).T,
            (np.sin(ang) * dup[None, :] / n).astype(np.float32).T)


@lru_cache(maxsize=32)
def _full_dft_tables(n: int):
    """Full complex DFT (n, n) cos/sin tables; inverse carries 1/n."""
    ang = 2 * np.pi * np.outer(np.arange(n), np.arange(n)) / n
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32),
            (np.cos(ang) / n).astype(np.float32),
            (np.sin(ang) / n).astype(np.float32))


def rfft_mm_last(x):
    """jnp.fft.rfft(x, axis=-1) for real x (…, n), n ≤ MM_MAX_SIZE."""
    n = x.shape[-1]
    Cf, Sf, _, _ = (jnp.asarray(t) for t in _rfft_tables(n))
    x = jnp.asarray(x, jnp.float32)
    re = jax.lax.dot_general(x, Cf, (((x.ndim - 1,), (0,)), ((), ())),
                             precision=_HP)
    im = -jax.lax.dot_general(x, Sf, (((x.ndim - 1,), (0,)), ((), ())),
                              precision=_HP)
    return jax.lax.complex(re, im)


def irfft_mm_last(X, n: int):
    """jnp.fft.irfft(X, n=n, axis=-1) for Hermitian X (…, n//2+1)."""
    _, _, Ci, Si = (jnp.asarray(t) for t in _rfft_tables(n))
    Xr = jnp.real(X).astype(jnp.float32)
    Xi = jnp.imag(X).astype(jnp.float32)
    d = Xr.ndim - 1
    return (jax.lax.dot_general(Xr, Ci, (((d,), (0,)), ((), ())),
                                precision=_HP)
            - jax.lax.dot_general(Xi, Si, (((d,), (0,)), ((), ())),
                                  precision=_HP))


def _rfft2_mm_parts(imgs):
    """Real/imag parts of rfft2(imgs) for (B, H, W) real input."""
    B, H, W = imgs.shape
    Cfx, Sfx, _, _ = (jnp.asarray(t) for t in _rfft_tables(W))
    Cy, Sy, _, _ = (jnp.asarray(t) for t in _full_dft_tables(H))
    imgs = jnp.asarray(imgs, jnp.float32)
    # x axis (real -> half-spectrum)
    fr = jax.lax.dot_general(imgs, Cfx, (((2,), (0,)), ((), ())),
                             precision=_HP)                    # (B, H, K)
    fi = -jax.lax.dot_general(imgs, Sfx, (((2,), (0,)), ((), ())),
                              precision=_HP)
    # y axis (full complex DFT), dims-preserving einsums (see
    # shear_rotate._shear_y_mm for why not swapaxes)
    Xr = (jnp.einsum("bhk,hm->bmk", fr, Cy, precision=_HP)
          + jnp.einsum("bhk,hm->bmk", fi, Sy, precision=_HP))
    Xi = (jnp.einsum("bhk,hm->bmk", fi, Cy, precision=_HP)
          - jnp.einsum("bhk,hm->bmk", fr, Sy, precision=_HP))
    return Xr, Xi


def rfft2_mm(imgs):
    """jnp.fft.rfft2 for (B, H, W) real input, H/W ≤ MM_MAX_SIZE."""
    Xr, Xi = _rfft2_mm_parts(imgs)
    return jax.lax.complex(Xr, Xi)


def irfft2_mm(X, shape):
    """jnp.fft.irfft2(X, s=shape) for (B, H, W//2+1) Hermitian input."""
    H, W = shape
    _, _, Cyi, Syi = (jnp.asarray(t) for t in _full_dft_tables(H))
    _, _, Cxi, Sxi = (jnp.asarray(t) for t in _rfft_tables(W))
    Xr = jnp.real(X).astype(jnp.float32)
    Xi = jnp.imag(X).astype(jnp.float32)
    # inverse y (full complex; conjugate-transpose tables carry 1/H)
    Yr = (jnp.einsum("bmk,mh->bhk", Xr, Cyi, precision=_HP)
          - jnp.einsum("bmk,mh->bhk", Xi, Syi, precision=_HP))
    Yi = (jnp.einsum("bmk,mh->bhk", Xi, Cyi, precision=_HP)
          + jnp.einsum("bmk,mh->bhk", Xr, Syi, precision=_HP))
    # inverse x (Hermitian fold; output is real)
    return (jax.lax.dot_general(Yr, Cxi, (((2,), (0,)), ((), ())),
                                precision=_HP)
            - jax.lax.dot_general(Yi, Sxi, (((2,), (0,)), ((), ())),
                                  precision=_HP))


def fft2_abs_shifted_mm(imgs):
    """fftshift(|fft2(imgs)|) for (B, H, W) real input via rfft2_mm + the
    Hermitian mirror |F(h, w)| = |F(-h mod H, W-w)| — flips/rolls only,
    no gathers. Matches jnp.abs(fftshift(fft2(x))) to f32 roundoff."""
    B, H, W = imgs.shape
    K = W // 2 + 1
    Xr, Xi = _rfft2_mm_parts(imgs)
    mag = jnp.sqrt(Xr * Xr + Xi * Xi)            # (B, H, K), kx in [0, W/2]
    # right half kx in [K, W-1] (W-K columns)  <-  mirror of kx' = W-kx
    # in [1, W-K]: flip kx' axis, then h -> (-h) mod H = roll(flip(h), 1)
    mirror = jnp.flip(mag[:, :, 1:W - K + 1], axis=2)
    mirror = jnp.roll(jnp.flip(mirror, axis=1), 1, axis=1)
    full = jnp.concatenate([mag, mirror], axis=2)  # (B, H, W), fft order
    return jnp.roll(full, (H // 2, W // 2), axis=(1, 2))
