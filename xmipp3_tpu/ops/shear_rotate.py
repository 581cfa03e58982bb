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

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


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
    out = _shear_x(base, t[:, None] * y)
    out = _shear_y(out, m[:, None] * x)
    out = _shear_x(out, t[:, None] * y)

    # final translation as a single 2-D phase ramp
    fy = jnp.fft.fftfreq(H).astype(jnp.float32)[None, :, None]
    fx = jnp.fft.rfftfreq(W).astype(jnp.float32)[None, None, :]
    sx = jnp.asarray(sx, jnp.float32)[:, None, None]
    sy = jnp.asarray(sy, jnp.float32)[:, None, None]
    phase = jnp.exp(-2j * jnp.pi * (fx * sx + fy * sy))
    return jnp.fft.irfft2(jnp.fft.rfft2(out) * phase, s=(H, W))
