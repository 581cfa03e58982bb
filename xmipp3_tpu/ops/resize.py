"""Image/volume resizing: Fourier crop/pad (band-limited) and spline scaling.

Replaces the reference image_resize / transform_downsample engines
(data/transform_downsample.* and image_resize, SURVEY.md §2.1) — Fourier-domain
crop is exact band-limited downsampling (what the reference calls
"fourier" method) and maps to two batched FFTs on the MXU-friendly path.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


@partial(jax.jit, static_argnames=("out_h", "out_w"))
def fourier_resize_2d(imgs, out_h: int, out_w: int):
    """Band-limited resize via Fourier crop/pad. imgs (B,H,W) -> (B,out_h,out_w)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    spec = jnp.fft.fftshift(jnp.fft.fft2(imgs), axes=(-2, -1))
    # center-crop or center-pad the full spectrum
    out = jnp.zeros((B, out_h, out_w), spec.dtype)
    ch, cw = min(H, out_h), min(W, out_w)
    y0s, x0s = H // 2 - ch // 2, W // 2 - cw // 2
    y0d, x0d = out_h // 2 - ch // 2, out_w // 2 - cw // 2
    out = out.at[:, y0d:y0d + ch, x0d:x0d + cw].set(
        spec[:, y0s:y0s + ch, x0s:x0s + cw])
    out = jnp.fft.ifft2(jnp.fft.ifftshift(out, axes=(-2, -1)))
    scale = (out_h * out_w) / (H * W)
    res = jnp.real(out) * scale
    return res[0] if single else res


@partial(jax.jit, static_argnames=("out_d", "out_h", "out_w"))
def fourier_resize_3d(vol, out_d: int, out_h: int, out_w: int):
    vol = jnp.asarray(vol, jnp.float32)
    D, H, W = vol.shape
    spec = jnp.fft.fftshift(jnp.fft.fftn(vol))
    out = jnp.zeros((out_d, out_h, out_w), spec.dtype)
    cd, ch, cw = min(D, out_d), min(H, out_h), min(W, out_w)
    s = (D // 2 - cd // 2, H // 2 - ch // 2, W // 2 - cw // 2)
    d = (out_d // 2 - cd // 2, out_h // 2 - ch // 2, out_w // 2 - cw // 2)
    out = out.at[d[0]:d[0] + cd, d[1]:d[1] + ch, d[2]:d[2] + cw].set(
        spec[s[0]:s[0] + cd, s[1]:s[1] + ch, s[2]:s[2] + cw])
    res = jnp.real(jnp.fft.ifftn(jnp.fft.ifftshift(out)))
    return res * ((out_d * out_h * out_w) / (D * H * W))


def scale_to_size_nearest(arr, out_shape):
    """Nearest-neighbor rescale to `out_shape` (any rank). Matches the
    reference's NEAREST preview scaling (Image::readPreview /
    scaleToSize(NEAREST), core/xmipp_image_base.cpp): pure index gather,
    every output value is an exact input value."""
    arr = jnp.asarray(arr)
    if len(out_shape) != arr.ndim:
        raise ValueError("out_shape rank must match input rank")
    out = arr
    for ax, (n_in, n_out) in enumerate(zip(arr.shape, out_shape)):
        if n_in == n_out:
            continue
        idx = jnp.clip((jnp.arange(n_out) * n_in) // n_out, 0, n_in - 1)
        out = jnp.take(out, idx, axis=ax)
    return out


def spline_resize_2d(imgs, out_h: int, out_w: int, order: int = 3):
    """Scale by resampling with B-spline/bilinear interpolation."""
    from xmipp3_tpu.ops.geo import apply_affine_2d
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    sy, sx = out_h / H, out_w / W
    # output grid maps back into input by 1/s; build per-batch matrix
    A = np.array([[sx, 0, 0], [0, sy, 0], [0, 0, 1]], np.float32)
    out = _resize_warp(imgs, A, out_h, out_w, order)
    return out[0] if single else out


@partial(jax.jit, static_argnames=("out_h", "out_w", "order"))
def _resize_warp(imgs, A, out_h: int, out_w: int, order: int):
    from xmipp3_tpu.ops.geo import (_gather_bilinear, _gather_bspline3,
                                    bspline3_prefilter_2d)
    B, H, W = imgs.shape
    Ainv = jnp.linalg.inv(jnp.asarray(A))
    yy = jnp.arange(out_h, dtype=jnp.float32)[:, None] - out_h // 2
    xx = jnp.arange(out_w, dtype=jnp.float32)[None, :] - out_w // 2
    xs = Ainv[0, 0] * xx + Ainv[0, 1] * yy + W // 2
    ys = Ainv[1, 0] * xx + Ainv[1, 1] * yy + H // 2
    xs = jnp.broadcast_to(xs, (out_h, out_w))
    ys = jnp.broadcast_to(ys, (out_h, out_w))

    def one(img):
        if order == 3:
            return _gather_bspline3(bspline3_prefilter_2d(img, wrap=False),
                                    ys, xs, False)
        if order == 0:
            # NEAREST: round-half-away-from-zero like the reference ROUND
            yi = jnp.where(ys >= 0, jnp.floor(ys + 0.5),
                           jnp.ceil(ys - 0.5)).astype(jnp.int32)
            xi = jnp.where(xs >= 0, jnp.floor(xs + 0.5),
                           jnp.ceil(xs - 0.5)).astype(jnp.int32)
            inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            return jnp.where(inside,
                             img[jnp.clip(yi, 0, H - 1),
                                 jnp.clip(xi, 0, W - 1)], 0.0)
        return _gather_bilinear(img, ys, xs, False)

    return jax.vmap(one)(imgs)


def pyramid_reduce_2d(imgs, levels: int = 1):
    """Gaussian-ish pyramid reduce (factor 2 per level) via Fourier crop of
    the smoothed image — matches the reference 'pyramid' resize option."""
    out = jnp.asarray(imgs, jnp.float32)
    for _ in range(levels):
        H, W = out.shape[-2:]
        out = fourier_resize_2d(out, H // 2, W // 2)
    return out


def reslice(vol, view: str):
    """Volume reslicing (the reference MultidimArray::reslice /
    xmipp_image_base VIEW_* semantics, pinned by test_golden_multidim.py from
    function_tests/test_multidim_main.cpp:283-308):
      y_neg: out[Zout-1-i, k, j] = in[k, i, j]
      x_neg: out[Xout-1-j, i, k] = in[k, i, j]
    y_pos / x_pos are the transposes without the new-axis flip."""
    v = np.asarray(vol)
    if view == "y_neg":
        return v.transpose(1, 0, 2)[::-1].copy()
    if view == "y_pos":
        return v.transpose(1, 0, 2)[:, ::-1].copy()
    if view == "x_neg":
        return v.transpose(2, 1, 0)[::-1].copy()
    if view == "x_pos":
        return v.transpose(2, 1, 0)[:, :, ::-1].copy()
    raise ValueError(f"unknown reslice view '{view}'")
