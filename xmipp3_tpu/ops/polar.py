"""Polar resampling + rotational correlation over ring FFTs.

Replaces the reference Polar stack (data/polar.h:67 Polar<T>,
getPolarFromCartesianBSpline :625, fourierTransformRings :760,
rotationalCorrelation :828, best_rotation :852) and its GPU twin
(cuda_rot_polar_estimator + cuda_gpu_polar.cu) with batched gathers + a 1-D
FFT correlation along the angular axis — a single fused jit kernel per batch.

Layout: polar stacks are (B, n_rings, n_angles) float32; ring radii are
radius_min + i (1 px spacing, as the reference defaults to full rings);
angular samples θ_j = 2π j / n_angles, x = c + r cosθ, y = c + r sinθ.
Ring weighting for correlation: w_i ∝ r_i (annulus area, matching the
reference's ring weights in rotationalCorrelation).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.shift import _parabola_peak_1d


def polar_grid(h: int, w: int, radius_min: int, radius_max: int,
               n_angles: int | None = None):
    """Sampling coordinates (yy, xx) of shape (n_rings, n_angles)."""
    if n_angles is None:
        # enough angular samples for the outermost ring (power of 2 friendly)
        n_angles = int(2 ** np.ceil(np.log2(2 * np.pi * radius_max)))
    radii = np.arange(radius_min, radius_max + 1, dtype=np.float32)
    theta = (2 * np.pi * np.arange(n_angles) / n_angles).astype(np.float32)
    cy, cx = h // 2, w // 2
    yy = cy + radii[:, None] * np.sin(theta)[None, :]
    xx = cx + radii[:, None] * np.cos(theta)[None, :]
    return yy.astype(np.float32), xx.astype(np.float32), radii


@partial(jax.jit, static_argnames=("radius_min", "radius_max", "n_angles",
                                   "stride", "nearest"))
def cartesian_to_polar(imgs, radius_min: int = 2, radius_max: int | None = None,
                       n_angles: int | None = None, stride: int = 1,
                       nearest: bool = False):
    """Batched polar resampling. imgs (B,H,W) -> (B,R,A).

    stride>1 samples every stride-th ring and nearest=True uses 1-tap
    sampling — the cheap mode for coarse scans (gathers dominate the cost on
    TPU); defaults give full-quality bilinear rings."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    if radius_max is None:
        radius_max = H // 2 - 2
    yy, xx, _ = polar_grid(H, W, radius_min, radius_max, n_angles)
    if stride > 1:
        yy = yy[::stride]
        xx = xx[::stride]
    if nearest:
        yi = jnp.clip(jnp.round(yy).astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(jnp.round(xx).astype(jnp.int32), 0, W - 1)
        out = jax.vmap(lambda img: img[yi, xi])(imgs)
        return out[0] if single else out
    # NOTE (r5, measured on v5e): a dense-matmul variant of this resample
    # (bilinear taps baked into a (H·W, R·A) table, one MXU dot) was
    # REFUTED — 7.5 ms vs 4.4 ms for the gather at B=2048·64², uniformly
    # ~1.7x slower everywhere it ran (config-1 FULL regressed 23.9->32.1
    # ms). The table is 99.9% zeros, so the MXU wastes its FLOPs, and
    # f32-HIGHEST dots measure only ~8 TF/s effective at this shape. The
    # constant-index gather stays (experiment removed; see CLAUDE.md r5).
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    fy = yy - y0
    fx = xx - x0

    def one(img):
        def tap(dy, dx):
            return img[jnp.clip(y0 + dy, 0, H - 1), jnp.clip(x0 + dx, 0, W - 1)]
        return (tap(0, 0) * (1 - fy) * (1 - fx) + tap(0, 1) * (1 - fy) * fx +
                tap(1, 0) * fy * (1 - fx) + tap(1, 1) * fy * fx)

    out = jax.vmap(one)(imgs)
    return out[0] if single else out


@partial(jax.jit, static_argnames=("radius_min", "radius_max", "n_angles",
                                   "stride"))
def polar_at_offsets(imgs, offsets, radius_min: int = 2,
                     radius_max: int | None = None,
                     n_angles: int | None = None, stride: int = 1):
    """Polar resample around shifted centers WITHOUT shifting the images:
    sampling T(t)·img on the polar grid equals sampling img at grid - t.
    imgs (B,H,W), offsets (T,2) as (tx,ty) -> (T,B,R,A), nearest-neighbor
    (the coarse-scan fast path: replaces per-trial Fourier shifts + separate
    gathers)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    B, H, W = imgs.shape
    if radius_max is None:
        radius_max = H // 2 - 2
    yy, xx, _ = polar_grid(H, W, radius_min, radius_max, n_angles)
    if stride > 1:
        yy = yy[::stride]
        xx = xx[::stride]

    def per_offset(t):
        yi = jnp.clip(jnp.round(yy - t[1]).astype(jnp.int32), 0, H - 1)
        xi = jnp.clip(jnp.round(xx - t[0]).astype(jnp.int32), 0, W - 1)
        return jax.vmap(lambda img: img[yi, xi])(imgs)

    return jax.lax.map(per_offset, jnp.asarray(offsets, jnp.float32))


@partial(jax.jit, static_argnames=("offsets", "radius_min", "radius_max",
                                   "n_angles", "stride"))
def polar_at_static_offsets(imgs, offsets, radius_min: int = 2,
                            radius_max: int | None = None,
                            n_angles: int | None = None, stride: int = 1):
    """Bilinear polar resample around a STATIC tuple of trial shifts.

    Baking the offsets into the grid makes every gather index a compile-time
    constant — the fast TPU gather path (measured ~2.8 G samples/s vs
    pathologically slow data-dependent indices). Sampling T(t)·img on the
    polar grid equals sampling img at grid - t. imgs (B, H, W), offsets
    ((tx, ty), ...) -> (B, T, R, A)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    B, H, W = imgs.shape
    if radius_max is None:
        radius_max = H // 2 - 2
    yy0, xx0, _ = polar_grid(H, W, radius_min, radius_max, n_angles)
    if stride > 1:
        yy0 = yy0[::stride]
        xx0 = xx0[::stride]
    yy = np.stack([yy0 - ty for (tx, ty) in offsets])     # (T, R, A) consts
    xx = np.stack([xx0 - tx for (tx, ty) in offsets])
    y0 = np.floor(yy).astype(np.int32)
    x0 = np.floor(xx).astype(np.int32)
    fy = jnp.asarray(yy - y0)
    fx = jnp.asarray(xx - x0)

    def one(img):
        def tap(dy, dx):
            # periodic indexing: shifted grids can step past the frame for
            # the outer rings; wrap matches the Fourier-shift semantics of
            # the reference path (clipping changes outer-ring correlations)
            return img[(y0 + dy) % H, (x0 + dx) % W]
        return (tap(0, 0) * (1 - fy) * (1 - fx) + tap(0, 1) * (1 - fy) * fx +
                tap(1, 0) * fy * (1 - fx) + tap(1, 1) * fy * fx)

    return jax.vmap(one)(imgs)


@jax.jit
def ring_ffts(polar):
    """FFT along the angular axis (reference fourierTransformRings).

    ≤256 angular samples go through the matmul DFT (ops/dft_mm.py): a
    (B,R) batch of length-A rffts is latency-bound as an FFT dispatch
    but a single MXU dot as a table contraction."""
    polar = jnp.asarray(polar, jnp.float32)
    if polar.shape[-1] <= 256:
        from xmipp3_tpu.ops.dft_mm import rfft_mm_last
        return rfft_mm_last(polar)
    return jnp.fft.rfft(polar, axis=-1)


@partial(jax.jit, static_argnames=("radius_min",))
def rotational_correlation(f_ref, f_others, radius_min: int = 2):
    """Angular cross-correlation c(θ) summed over rings with r-weights.

    f_ref: (R, A//2+1) or (B, R, A//2+1); f_others: (B, R, A//2+1).
    Returns (B, A) correlation curves."""
    if f_ref.ndim == 2:
        f_ref = f_ref[None]
    R = f_others.shape[-2]
    A = 2 * (f_others.shape[-1] - 1)
    radii = jnp.arange(radius_min, radius_min + R, dtype=jnp.float32)
    w = radii / radii.sum()
    cross = f_others * jnp.conj(f_ref)           # (B, R, A//2+1)
    weighted = (cross * w[None, :, None]).sum(axis=-2)
    if A <= 256:
        from xmipp3_tpu.ops.dft_mm import irfft_mm_last
        return irfft_mm_last(weighted, A)
    return jnp.fft.irfft(weighted, n=A, axis=-1)


@partial(jax.jit, static_argnames=("radius_min",))
def best_rotation_from_ffts(f_ref, f_others, radius_min: int = 2):
    """Best in-plane rotation angle (degrees) and correlation peak.

    Angle returned is the rotation to apply to `other` so it matches `ref`
    (same sense as ops.geo.rotate_2d)."""
    corr = rotational_correlation(f_ref, f_others, radius_min)
    B, A = corr.shape
    idx = jnp.argmax(corr, axis=-1)
    ym1 = corr[jnp.arange(B), (idx - 1) % A]
    y0 = corr[jnp.arange(B), idx]
    yp1 = corr[jnp.arange(B), (idx + 1) % A]
    off = _parabola_peak_1d(ym1, y0, yp1)
    ang = (idx.astype(jnp.float32) + off) * (360.0 / A)
    # wrap to (-180, 180]
    ang = jnp.where(ang > 180.0, ang - 360.0, ang)
    return ang, y0


def best_rotation(ref, others, radius_min: int = 2, radius_max: int | None = None,
                  n_angles: int | None = None):
    """End-to-end 1-vs-N rotation estimation on Cartesian images."""
    ref = jnp.asarray(ref, jnp.float32)
    others = jnp.asarray(others, jnp.float32)
    if others.ndim == 2:
        others = others[None]
    H = others.shape[-2]
    if radius_max is None:
        radius_max = H // 2 - 2
    p_ref = cartesian_to_polar(ref, radius_min, radius_max, n_angles)
    p_oth = cartesian_to_polar(others, radius_min, radius_max, n_angles)
    f_ref = ring_ffts(p_ref)
    f_oth = ring_ffts(p_oth)
    return best_rotation_from_ffts(f_ref, f_oth, radius_min)


def polar_rings_reference(coeffs, first_ring: int, last_ring: int,
                          xoff: float = 0.0, yoff: float = 0.0,
                          mode: str = "full"):
    """Reference-exact polar ring sampling (Polar::getPolarFromCartesianBSpline,
    data/polar.h:625-702): rings at integer radii, 2·int(0.5·angle·r) samples
    per ring (min 1), sample (x, y) = r·(sin phi, cos phi) evaluated by cubic
    B-spline on `coeffs` (the caller passes spline COEFFICIENTS) with
    mirror-off-bounds extension and NO centering — the reference evaluates in
    the array's own coordinate frame.

    Returns (rings, radii): list of 1-D jnp arrays + list of radii.
    Parity pinned by tests/test_golden_polar.py against the embedded values
    of function_tests/test_polar_main.cpp."""
    from xmipp3_tpu.ops.geo import _gather_bspline3
    coeffs = jnp.asarray(coeffs, jnp.float32)
    twopi = 2.0 * np.pi if mode == "full" else np.pi
    rings, radii = [], []
    for r in range(first_ring, last_ring + 1):
        radius = float(r)
        nsam = max(1, 2 * int(0.5 * twopi * radius))
        phi = np.arange(nsam, dtype=np.float32) * np.float32(twopi / nsam)
        xs = jnp.asarray(np.sin(phi) * radius + xoff)
        ys = jnp.asarray(np.cos(phi) * radius + yoff)
        rings.append(_gather_bspline3(coeffs, ys, xs, wrap=False,
                                      zero_outside=False))
        radii.append(radius)
    return rings, radii


def polar_weighted_stats(rings, radii, mode: str = "full"):
    """Ring-area-weighted mean/stddev (Polar::computeAverageAndStddev,
    data/polar.h:488-534): weight per sample = angle·radius/nsam."""
    twopi = 2.0 * np.pi if mode == "full" else np.pi
    s = s2 = n = 0.0
    for ring, radius in zip(rings, radii):
        vals = np.asarray(ring, np.float64)
        w = twopi * radius / vals.size
        s += w * vals.sum()
        s2 += w * (vals ** 2).sum()
        n += w * vals.size
    if n > 0:
        mean = s / n
        return mean, float(np.sqrt(abs(s2 / n - mean * mean)))
    return 0.0, 0.0
