"""Fiducial-landmark enhancement for tilt series.

Reference contract: tomo_detect_landmarks.cpp:1310-1470 (directional
Fourier filter) — a band around the landmark frequency 1/targetFS
(digital, +-0.1) is split into `n_dirs` 10-degree Gaussian angular
cones; the per-cone responses are summed and the image is multiplied
by the summed response (isotropic blobs respond in every cone, linear
interpolation edges/stripes only in one).

TPU shape: ALL frames and ALL directions run in ONE jitted dispatch —
the cone masks are a (n_dirs, H, W//2+1) stack contracted against the
frame FFTs, where the reference loops transformer.FourierTransform per
(frame, direction) pair on host threads.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("target_fs", "n_dirs"))
def directional_enhance(imgs, target_fs: float, n_dirs: int = 8):
    """imgs (F, H, W) -> enhanced (F, H, W): img * sum_d dirfilter_d(img).

    target_fs: landmark size in pixels (the band sits at digital
    frequency 1/target_fs +- 0.1, reference lowerBound/upperBound)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    F_, H, W = imgs.shape
    fy = jnp.fft.fftfreq(H).astype(jnp.float32)[:, None]
    fx = jnp.fft.rfftfreq(W).astype(jnp.float32)[None, :]
    un = jnp.sqrt(fy * fy + fx * fx)
    inv_fs = 1.0 / float(target_fs)
    band = (un > inv_fs - 0.1) & (un < inv_fs + 0.1) & (un > 1e-6)
    ux = fx / jnp.maximum(un, 1e-12)
    uy = fy / jnp.maximum(un, 1e-12)
    cos10 = 0.9848
    aux = 8.0 / ((cos10 - 1.0) ** 2)
    angles = jnp.arange(n_dirs, dtype=jnp.float32) * (np.pi / n_dirs)
    xd = jnp.cos(angles)[:, None, None]
    yd = jnp.sin(angles)[:, None, None]
    cosine = jnp.abs(xd * ux[None] + yd * uy[None])       # (D, H, Wr)
    cone = jnp.where(cosine >= cos10,
                     jnp.exp(-((cosine - 1.0) ** 2) * aux), 0.0)
    mask = jnp.sum(cone, axis=0) * band                   # (H, Wr)
    Fimg = jnp.fft.rfft2(imgs)
    resp = jnp.fft.irfft2(Fimg * mask[None], s=(H, W))
    return imgs * resp


def downsample_factor(fiducial_px: float, target_px: float) -> float:
    """Reference generateSideInfo: ds so the fiducial lands at
    target_px pixels."""
    return max(float(fiducial_px) / max(float(target_px), 1.0), 1.0)
