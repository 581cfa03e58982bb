"""Gather-free batched rotation+shift via FFT shears.

On TPU, per-image dynamic-index gathers (the classic warp) run ~35x slower
than elementwise/FFT work (measured: 791 ms vs ~11 ms for the same sample
count with constant indices). This module rotates by the three-shear
decomposition — R(θ) = Shx(-tan θ/2) · Shy(sin θ) · Shx(-tan θ/2) — where
each shear is a per-row/column translation applied as a Fourier phase ramp:
pure batched 1-D FFTs + elementwise complex multiplies, no gathers, and
sinc (spectral) interpolation accuracy.

Angles are reduced to (-45°, 45°] by composing an exact k·90° rotation
(transpose+flip, selected per image), so shear factors stay small.
Convention matches ops.geo.apply_affine_2d with wrap=True:
out = T(sx, sy)·R(psi) applied to the image (alignment_matrices_2d form).
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np

# images up to this size use the DFT-by-matmul shear path: batched tiny 1-D
# FFTs are LATENCY-bound on TPU (~9 ms per 131k transforms regardless of
# length, measured r4 on v5e) while the same transform as an (B·H, W)x(W, k)
# dot rides the MXU; past ~256 px the O(W^2) matmul FLOPs overtake the
# latency win and the FFT path is kept
_MM_MAX_SIZE = 256


def _shear_x(imgs, shifts_per_row):
    """Translate each row y by shifts_per_row[..., y] pixels (periodic)."""
    B, H, W = imgs.shape
    fx = jnp.fft.rfftfreq(W).astype(jnp.float32)[None, None, :]
    phase = jnp.exp(-2j * jnp.pi * fx * shifts_per_row[:, :, None])
    return jnp.fft.irfft(jnp.fft.rfft(imgs, axis=2) * phase, n=W, axis=2)


def _shear_y(imgs, shifts_per_col):
    """Translate each column x by shifts_per_col[..., x] pixels (periodic)."""
    B, H, W = imgs.shape
    fy = jnp.fft.rfftfreq(H).astype(jnp.float32)[None, :, None]
    phase = jnp.exp(-2j * jnp.pi * fy * shifts_per_col[:, None, :])
    return jnp.fft.irfft(jnp.fft.rfft(imgs, axis=1) * phase, n=H, axis=1)


@lru_cache(maxsize=16)
def _shear_tables(n: int):
    """rFFT/irFFT as dense real matrices for length-n rows: forward (n, k)
    cos/sin and inverse (k, n) with the [1,2,…,2,(1|2)] Hermitian
    duplication folded in (irfft(X)·n = Re(X)·dup @ cos - Im(X)·dup @ sin,
    exact — validated to ~2e-6 round-trip vs jnp.fft)."""
    k = n // 2 + 1
    ang = 2 * np.pi * np.outer(np.arange(n), np.arange(k)) / n
    dup = np.full(k, 2.0, np.float32)
    dup[0] = 1.0
    if n % 2 == 0:
        dup[-1] = 1.0
    return (np.cos(ang).astype(np.float32),
            np.sin(ang).astype(np.float32),
            (np.cos(ang) * dup[None, :] / n).astype(np.float32).T,
            (np.sin(ang) * dup[None, :] / n).astype(np.float32).T)


def _mm(X, W):
    # HIGH (bf16_3x) not HIGHEST (bf16_6x): these dots warp images for the
    # REFINEMENT loops, whose parabola peaks + iteration absorb the ~1e-4
    # relative error — measured r5 on v5e: pose errors identical to 4
    # decimals vs HIGHEST while config 1 runs ~8% faster. dft_mm/match
    # tables stay HIGHEST: dropping THEM measurably flips gallery argmax
    # winners (true-ref acc 0.962 -> 0.953).
    return jax.lax.dot_general(X, W, (((2,), (0,)), ((), ())),
                               precision=jax.lax.Precision.HIGH)


def _shear_x_mm(imgs, shifts_per_row):
    """_shear_x with the two rFFTs as MXU matmuls (see _MM_MAX_SIZE)."""
    W = imgs.shape[2]
    Cf, Sf, Ci, Si = (jnp.asarray(t) for t in _shear_tables(W))
    fr = _mm(imgs, Cf)
    fi = -_mm(imgs, Sf)
    fx = jnp.arange(W // 2 + 1, dtype=jnp.float32)[None, None, :] / W
    ang = -2 * jnp.pi * fx * shifts_per_row[:, :, None]
    pr, pi = jnp.cos(ang), jnp.sin(ang)
    return _mm(fr * pr - fi * pi, Ci) - _mm(fr * pi + fi * pr, Si)


def _shear_y_mm(imgs, shifts_per_col):
    """Column shear via direct dims-preserving contractions. NOT written as
    swapaxes∘_shear_x_mm∘swapaxes: a trailing transpose propagates a
    non-major layout into downstream rfft2 ops, and XLA:CPU's fft thunk
    RET_CHECKs on non-dim0-major input layouts under shard_map (hit by the
    dp mesh match tests)."""
    H = imgs.shape[1]
    Cf, Sf, Ci, Si = (jnp.asarray(t) for t in _shear_tables(H))
    hp = jax.lax.Precision.HIGH
    fr = jnp.einsum("bhw,hk->bkw", imgs, Cf, precision=hp)
    fi = -jnp.einsum("bhw,hk->bkw", imgs, Sf, precision=hp)
    fy = jnp.arange(H // 2 + 1, dtype=jnp.float32)[None, :, None] / H
    ang = -2 * jnp.pi * fy * shifts_per_col[:, None, :]
    pr, pi = jnp.cos(ang), jnp.sin(ang)
    return (jnp.einsum("bkw,kh->bhw", fr * pr - fi * pi, Ci, precision=hp)
            - jnp.einsum("bkw,kh->bhw", fr * pi + fi * pr, Si, precision=hp))


@jax.jit
def translate_fourier(imgs, sx, sy):
    """Subpixel periodic translation (B,H,W) by per-image (sx, sy) — the
    separable two-shear form; matmul path for small images (see
    _MM_MAX_SIZE), exact composition with rotate_shift_fourier (periodic
    sinc shifts compose exactly)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    B, H, W = imgs.shape
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    if max(H, W) <= _MM_MAX_SIZE:
        out = _shear_x_mm(imgs, jnp.broadcast_to(sx[:, None], (B, H)))
        return _shear_y_mm(out, jnp.broadcast_to(sy[:, None], (B, W)))
    out = _shear_x(imgs, jnp.broadcast_to(sx[:, None], (B, H)))
    return _shear_y(out, jnp.broadcast_to(sy[:, None], (B, W)))


@jax.jit
def rotate_shift_fourier(imgs, psi_deg, sx, sy):
    """Rotate by psi (ops.geo convention) then shift by (sx, sy) — all in
    Fourier space. imgs (B,H,W) float32; returns (B,H,W)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    B, H, W = imgs.shape
    psi = jnp.deg2rad(jnp.mod(jnp.asarray(psi_deg, jnp.float32) + 180.0,
                              360.0) - 180.0)

    # quadrant reduction: psi = residual + k*90°, residual in (-45°, 45°]
    k = jnp.round(psi / (jnp.pi / 2)).astype(jnp.int32) % 4
    resid = psi - jnp.round(psi / (jnp.pi / 2)) * (jnp.pi / 2)

    # exact k·90° rotations. Content convention (calibrated against
    # apply_affine_2d): psi=+90 maps logical (x, y) -> (y, -x). Inversion
    # about the center n//2 is index n-i for even n (plain flip gives n-1-i,
    # hence the +1 roll) but exactly n-1-i for odd n (no roll).
    ry = 1 if H % 2 == 0 else 0
    rx = 1 if W % 2 == 0 else 0
    r0 = imgs
    r1 = jnp.roll(jnp.flip(jnp.swapaxes(imgs, 1, 2), axis=1), ry, axis=1)
    r2 = jnp.roll(jnp.flip(imgs, axis=(1, 2)), (ry, rx), axis=(1, 2))
    r3 = jnp.roll(jnp.flip(jnp.swapaxes(imgs, 1, 2), axis=2), rx, axis=2)
    sel = k[:, None, None]
    base = jnp.where(sel == 0, r0, jnp.where(sel == 1, r1,
                                             jnp.where(sel == 2, r2, r3)))

    # three shears for the residual: content v' = Shx(t)·Shy(-sin)·Shx(t) v
    # with t = tan(resid/2) reproduces v' = [[c, s], [-s, c]] v (the
    # alignment_matrices_2d content rotation), verified by parity tests.
    t = jnp.tan(resid / 2)
    m = -jnp.sin(resid)
    y = (jnp.arange(H, dtype=jnp.float32) - H // 2)[None, :]
    x = (jnp.arange(W, dtype=jnp.float32) - W // 2)[None, :]
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)

    if max(H, W) <= _MM_MAX_SIZE:
        # matmul path; the x-translation folds into the third shear
        # (T(sx,sy)·Shx(f(y)) == Ty(sy)·Shx(f(y - 0) + sx) since per-row
        # x-shifts add and the y-translate is hoisted to the end)
        out = _shear_x_mm(base, t[:, None] * y)
        out = _shear_y_mm(out, m[:, None] * x)
        out = _shear_x_mm(out, t[:, None] * y + sx[:, None])
        return _shear_y_mm(out, jnp.broadcast_to(sy[:, None], (B, W)))

    out = _shear_x(base, t[:, None] * y)
    out = _shear_y(out, m[:, None] * x)
    out = _shear_x(out, t[:, None] * y)

    # final translation as separable 1-D phase ramps (ops/fourier.py)
    from xmipp3_tpu.ops.fourier import shift_spec_2d
    spec = shift_spec_2d(jnp.fft.rfft2(out), sx, sy, H, W)
    return jnp.fft.irfft2(spec, s=(H, W))
