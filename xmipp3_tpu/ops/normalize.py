"""Normalization modes (OldXmipp/NewXmipp/Ramp/Robust/...).

Rebuilds the reference ProgNormalize modes (data/normalize.h:201) as batched
jnp ops. Background = pixels outside a circular mask (or explicit mask).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.mask import background_mask


def _bg_stats(imgs, bg):
    w = bg[None]
    n = bg.sum()
    mean = (imgs * w).sum(axis=(-2, -1)) / n
    var = ((imgs - mean[:, None, None]) ** 2 * w).sum(axis=(-2, -1)) / n
    return mean, jnp.sqrt(jnp.maximum(var, 1e-12))


@jax.jit
def normalize_old_xmipp(imgs):
    """(I - mean) / std over the whole image."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    m = imgs.mean(axis=(-2, -1), keepdims=True)
    s = imgs.std(axis=(-2, -1), keepdims=True)
    out = (imgs - m) / jnp.maximum(s, 1e-12)
    return out[0] if single else out


@jax.jit
def normalize_new_xmipp(imgs, bg_mask):
    """(I - bg_mean) / bg_std : signal in units of background noise sigma."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    mean, std = _bg_stats(imgs, jnp.asarray(bg_mask, jnp.float32))
    out = (imgs - mean[:, None, None]) / std[:, None, None]
    return out[0] if single else out


@jax.jit
def subtract_background_plane(imgs, bg_mask):
    """LS-fit a plane a+bx+cy on background pixels, subtract everywhere
    (reference Ramp / NewXmipp preprocessing)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    w = jnp.asarray(bg_mask, jnp.float32)
    y = jnp.arange(H, dtype=jnp.float32)[:, None] - H // 2
    x = jnp.arange(W, dtype=jnp.float32)[None, :] - W // 2
    ones = jnp.ones((H, W), jnp.float32)
    basis = jnp.stack([ones, x * ones, y * ones], axis=0)     # (3,H,W)
    G = jnp.einsum("ahw,bhw,hw->ab", basis, basis, w)          # (3,3)
    rhs = jnp.einsum("ahw,nhw,hw->na", basis, imgs, w)         # (B,3)
    coef = jnp.linalg.solve(G[None], rhs[:, :, None])[:, :, 0]  # (B,3)
    plane = jnp.einsum("na,ahw->nhw", coef, basis)
    out = imgs - plane
    return out[0] if single else out


def least_squares_plane_fit(imgs, mask=None):
    """LS plane coefficients (a, b, c) with plane = a·x + b·y + c over
    logical (centered) coords; fit over `mask` points, or ALL points when
    mask is None (reference least_squares_plane_fit_All_Points,
    core/geometry — verified by function_tests/test_geometry_main.cpp which
    expects a=b=1, c=0 for img(i,j)=i+j). Returns (B, 3) [a, b, c]."""
    imgs = jnp.asarray(imgs, jnp.float32)
    if imgs.ndim == 2:
        imgs = imgs[None]
    B, H, W = imgs.shape
    w = (jnp.ones((H, W), jnp.float32) if mask is None
         else jnp.asarray(mask, jnp.float32))
    y = jnp.arange(H, dtype=jnp.float32)[:, None] - H // 2
    x = jnp.arange(W, dtype=jnp.float32)[None, :] - W // 2
    ones = jnp.ones((H, W), jnp.float32)
    basis = jnp.stack([x * ones, y * ones, ones], axis=0)
    G = jnp.einsum("ahw,bhw,hw->ab", basis, basis, w)
    rhs = jnp.einsum("ahw,nhw,hw->na", basis, imgs, w)
    return jnp.linalg.solve(G[None], rhs[:, :, None])[:, :, 0]


def normalize_ramp(imgs, bg_mask=None):
    """Reference Ramp mode: subtract the LS background plane — no rescaling
    (data/normalize.cpp:333-372; plane over ALL points when no mask)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    H, W = imgs.shape[-2:]
    coef = least_squares_plane_fit(imgs, bg_mask)
    y = jnp.arange(H, dtype=jnp.float32)[:, None] - H // 2
    x = jnp.arange(W, dtype=jnp.float32)[None, :] - W // 2
    plane = (coef[:, 0, None, None] * x[None] + coef[:, 1, None, None] * y[None]
             + coef[:, 2, None, None])
    out = imgs - plane
    return out[0] if single else out


@jax.jit
def normalize_robust(imgs):
    """(I - median) / MAD-sigma (reference Robust mode)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B = imgs.shape[0]
    flat = imgs.reshape(B, -1)
    med = jnp.median(flat, axis=1)
    mad = jnp.median(jnp.abs(flat - med[:, None]), axis=1)
    sigma = 1.4826 * jnp.maximum(mad, 1e-12)
    out = (imgs - med[:, None, None]) / sigma[:, None, None]
    return out[0] if single else out


def normalize(imgs, method: str = "NewXmipp", bg_radius: float | None = None):
    """CLI-facing dispatch (transform_normalize program)."""
    shape = np.shape(imgs)[-2:]
    method_l = method.lower()
    if method_l == "oldxmipp":
        return normalize_old_xmipp(imgs)
    bg = background_mask(shape, bg_radius)
    if method_l == "newxmipp":
        return normalize_new_xmipp(subtract_background_plane(imgs, bg), bg)
    if method_l == "ramp":
        return normalize_ramp(imgs, bg)
    if method_l == "robust":
        return normalize_robust(imgs)
    if method_l == "michael":
        # (I-bg_mean)/bg_mean scaling
        imgs_j = jnp.asarray(imgs, jnp.float32)
        if imgs_j.ndim == 2:
            imgs_j = imgs_j[None]
        mean, _ = _bg_stats(imgs_j, jnp.asarray(bg))
        return (imgs_j - mean[:, None, None]) / jnp.maximum(
            jnp.abs(mean)[:, None, None], 1e-12)
    raise ValueError(f"unknown normalize method {method}")
