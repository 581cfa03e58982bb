"""Batched geometric transforms (the AGeoTransformer / applyGeometry stack).

Replaces: applyGeometry+transformations.h (xmippCore), BSplineGeoTransformer
(reference reconstruction/bspline_geo_transformer.{h,cpp}), CUDA kernels
cuda_gpu_geo_transformer.cu / cuda_geo_linear_interpolator.cu — as batched
gather kernels under jit/vmap.

Conventions:
  - images are (B, H, W) float32, logical origin at (H//2, W//2);
  - a 3x3 homogeneous matrix A maps INPUT logical coords to OUTPUT logical
    coords (so sampling uses A^-1: out(x) = in(A^-1 x));
  - `wrap=True` wraps coordinates periodically (xmipp WRAP), else zero-fill.
Interpolation: order 1 (bilinear) or 3 (cubic B-spline with FFT prefilter —
periodic-boundary variant of the reference's mirror IIR prefilter,
cuda_gpu_iirconvolve.cu:63-232).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# interpolation kernels
# ---------------------------------------------------------------------------

def _gather_bilinear(img, yy, xx, wrap: bool):
    H, W = img.shape
    y0 = jnp.floor(yy)
    x0 = jnp.floor(xx)
    fy = yy - y0
    fx = xx - x0
    y0 = y0.astype(jnp.int32)
    x0 = x0.astype(jnp.int32)

    def tap(dy, dx):
        yi, xi = y0 + dy, x0 + dx
        if wrap:
            yi, xi = jnp.mod(yi, H), jnp.mod(xi, W)
            val = img[yi, xi]
        else:
            inside = (yi >= 0) & (yi < H) & (xi >= 0) & (xi < W)
            yi = jnp.clip(yi, 0, H - 1)
            xi = jnp.clip(xi, 0, W - 1)
            val = jnp.where(inside, img[yi, xi], 0.0)
        return val

    w00 = (1 - fy) * (1 - fx)
    w01 = (1 - fy) * fx
    w10 = fy * (1 - fx)
    w11 = fy * fx
    return (tap(0, 0) * w00 + tap(0, 1) * w01 +
            tap(1, 0) * w10 + tap(1, 1) * w11)


def _bspline3_weight(t):
    """Cubic B-spline kernel B3(|t|), |t| < 2."""
    a = jnp.abs(t)
    w_inner = (4.0 - 6.0 * a * a + 3.0 * a * a * a) / 6.0
    w_outer = ((2.0 - a) ** 3) / 6.0
    return jnp.where(a < 1.0, w_inner, jnp.where(a < 2.0, w_outer, 0.0))


def bspline3_prefilter_2d(img, wrap: bool = True):
    """B-spline coefficient prefilter: coeffs = img ⊛^-1 b3 where b3 is the
    sampled cubic kernel [1/6, 4/6, 1/6] per axis.

    wrap=True: periodic boundary (via FFT) — pairs with wrapped gathers.
    wrap=False: mirror-off-bounds boundary (Bilib MirrorOffBounds, the
    reference produceSplineCoefficients convention) — the half-sample-even
    extension is exactly the DCT-II symmetry, so deconvolution is diagonal
    in the DCT-II basis: H(k) = (4 + 2 cos(pi k / N)) / 6. Verified to 1e-7
    against the embedded expected values of the reference's
    function_tests/test_transformation_main.cpp (rotate test)."""
    from jax.scipy import fft as jsp_fft
    H, W = img.shape[-2:]
    if wrap:
        ky = jnp.zeros(H, img.dtype).at[0].set(4 / 6).at[1].set(1 / 6).at[H - 1].set(1 / 6)
        kx = jnp.zeros(W, img.dtype).at[0].set(4 / 6).at[1].set(1 / 6).at[W - 1].set(1 / 6)
        denom = jnp.outer(jnp.fft.fft(ky), jnp.fft.fft(kx))
        return jnp.real(jnp.fft.ifft2(jnp.fft.fft2(img) / denom)).astype(img.dtype)
    hy = (4.0 + 2.0 * jnp.cos(jnp.pi * jnp.arange(H) / H)) / 6.0
    hx = (4.0 + 2.0 * jnp.cos(jnp.pi * jnp.arange(W) / W)) / 6.0
    c = jsp_fft.dct(img, axis=-2, norm="ortho") / hy[:, None]
    c = jsp_fft.dct(c, axis=-1, norm="ortho") / hx[None, :]
    c = jsp_fft.idct(jsp_fft.idct(c, axis=-1, norm="ortho"), axis=-2,
                     norm="ortho")
    return c.astype(img.dtype)


def _mirror_off(idx, n):
    """Map an integer index into [0, n) by mirror-off-bounds reflection
    (valid for idx in [-n, 2n-1], which covers all B-spline taps)."""
    idx = jnp.where(idx < 0, -1 - idx, idx)
    return jnp.where(idx >= n, 2 * n - 1 - idx, idx)


def _gather_bspline3(coeffs, yy, xx, wrap: bool, zero_outside: bool = True):
    """Cubic B-spline sampling. wrap=True: periodic taps. wrap=False:
    mirror-off-bounds taps, with the OUTPUT zeroed wherever the sample point
    itself falls outside [0, N-1] (the reference applyGeometry DONT_WRAP
    contract: outside points are 0, near-edge points use the mirrored
    extension — not zero-padded taps)."""
    H, W = coeffs.shape
    y0 = jnp.floor(yy).astype(jnp.int32)
    x0 = jnp.floor(xx).astype(jnp.int32)
    out = jnp.zeros_like(yy)
    for dy in range(-1, 3):
        wy = _bspline3_weight(yy - (y0 + dy).astype(yy.dtype))
        yi = y0 + dy
        yi = jnp.mod(yi, H) if wrap else _mirror_off(jnp.clip(yi, -H, 2 * H - 1), H)
        for dx in range(-1, 3):
            wx = _bspline3_weight(xx - (x0 + dx).astype(xx.dtype))
            xi = x0 + dx
            xi = jnp.mod(xi, W) if wrap else _mirror_off(jnp.clip(xi, -W, 2 * W - 1), W)
            out = out + coeffs[yi, xi] * wy * wx
    if not wrap and zero_outside:
        eps = 1e-4
        inside = ((yy >= -eps) & (yy <= H - 1 + eps) &
                  (xx >= -eps) & (xx <= W - 1 + eps))
        out = jnp.where(inside, out, 0.0)
    return out


# ---------------------------------------------------------------------------
# affine application
# ---------------------------------------------------------------------------

def _out_coords(H, W, dtype=jnp.float32):
    cy, cx = H // 2, W // 2
    yy = jnp.arange(H, dtype=dtype)[:, None] - cy
    xx = jnp.arange(W, dtype=dtype)[None, :] - cx
    return jnp.broadcast_to(yy, (H, W)), jnp.broadcast_to(xx, (H, W))


@partial(jax.jit, static_argnames=("order", "wrap", "inverse"))
def apply_affine_2d(imgs, mats, order: int = 1, wrap: bool = False,
                    inverse: bool = False):
    """Warp a batch: imgs (B,H,W), mats (B,3,3) mapping input->output coords
    in (x, y) logical order. Returns (B,H,W)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    mats = jnp.asarray(mats, jnp.float32)
    if imgs.ndim == 2:
        imgs = imgs[None]
    if mats.ndim == 2:
        mats = jnp.broadcast_to(mats[None], (imgs.shape[0], 3, 3))
    B, H, W = imgs.shape
    Ainv = mats if inverse else jnp.linalg.inv(mats)
    yy, xx = _out_coords(H, W)

    def one(img, M):
        xs = M[0, 0] * xx + M[0, 1] * yy + M[0, 2]
        ys = M[1, 0] * xx + M[1, 1] * yy + M[1, 2]
        yy_in = ys + H // 2
        xx_in = xs + W // 2
        if order == 3:
            coeffs = bspline3_prefilter_2d(img, wrap=wrap)
            return _gather_bspline3(coeffs, yy_in, xx_in, wrap)
        return _gather_bilinear(img, yy_in, xx_in, wrap)

    return jax.vmap(one)(imgs, Ainv)


def alignment_matrices_2d(psi, sx, sy, flip=None, scale=None):
    """Batched alignment matrices: T(shift)·S·R(psi) (optionally mirrored).

    jnp implementation of core.geometry.alignment_matrix_2d for traced args."""
    psi = jnp.deg2rad(jnp.asarray(psi, jnp.float32))
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    B = psi.shape[0]
    sc = jnp.ones(B, jnp.float32) if scale is None else jnp.asarray(scale)
    c, s = jnp.cos(psi) * sc, jnp.sin(psi) * sc
    zeros = jnp.zeros(B, jnp.float32)
    ones = jnp.ones(B, jnp.float32)
    A = jnp.stack([
        jnp.stack([c, s, sx], axis=-1),
        jnp.stack([-s, c, sy], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1),
    ], axis=-2)
    if flip is not None:
        f = jnp.asarray(flip)
        M = jnp.where(f[:, None, None],
                      jnp.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]),
                      jnp.eye(3))
        A = M @ A
    return A


@partial(jax.jit, static_argnames=("order", "wrap"))
def apply_alignment_2d(imgs, psi, sx, sy, flip=None, order: int = 1,
                       wrap: bool = False):
    """Apply per-image alignment (rotate by psi, then shift) to register a
    batch — the metadata-geometry application of XmippMetadataProgram."""
    A = alignment_matrices_2d(psi, sx, sy, flip)
    return apply_affine_2d(imgs, A, order=order, wrap=wrap)


# ---------------------------------------------------------------------------
# Metadata pose convention (the single framework-wide contract):
#   stored (rot, tilt, psi, shiftX, shiftY, flip) satisfy
#       shift(img, (sx, sy)) ≈ M_x^flip · proj(A(rot, tilt, psi))
#   i.e. the registered (reference-frame) image is
#       registered = M_x^flip · R(-psi) · T(sx, sy) · img
# matching the reference behavior where reconstruct applies stored shifts to
# the image and uses (rot,tilt,psi) directly as the pose
# (reconstruct_fourier.cpp:199 PRELOAD applies shifts, pose from MD).
# ---------------------------------------------------------------------------

def metadata_alignment_matrices(psi, sx, sy, flip=None, scale=None):
    """Matrices of the registration transform M_x^f·R(-psi)·S·T(s)
    (batched; scale defaults to 1)."""
    psi_r = jnp.deg2rad(jnp.asarray(psi, jnp.float32))
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    B = psi_r.shape[0]
    sc = jnp.ones(B, jnp.float32) if scale is None else \
        jnp.asarray(scale, jnp.float32)
    c, s = jnp.cos(-psi_r) * sc, jnp.sin(-psi_r) * sc
    zeros = jnp.zeros(B, jnp.float32)
    ones = jnp.ones(B, jnp.float32)
    R = jnp.stack([
        jnp.stack([c, s, zeros], axis=-1),
        jnp.stack([-s, c, zeros], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1)], axis=-2)
    T = jnp.stack([
        jnp.stack([ones, zeros, sx], axis=-1),
        jnp.stack([zeros, ones, sy], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1)], axis=-2)
    A = R @ T
    if flip is not None:
        f = jnp.asarray(flip)
        M = jnp.where(f[:, None, None],
                      jnp.array([[-1.0, 0, 0], [0, 1.0, 0], [0, 0, 1.0]]),
                      jnp.eye(3))
        A = M @ A
    return A


@partial(jax.jit, static_argnames=("order", "wrap"))
def apply_md_geometry(imgs, psi, sx, sy, flip=None, order: int = 1,
                      wrap: bool = False):
    """Register a batch using stored metadata pose parameters."""
    A = metadata_alignment_matrices(psi, sx, sy, flip)
    return apply_affine_2d(imgs, A, order=order, wrap=wrap)


def centered_flip(imgs, axis: int):
    """Mirror about the center n//2 (index i -> (n-i) mod n). A plain
    [::-1] flip maps i -> n-1-i, which for EVEN sizes is the centered
    mirror plus a one-pixel shift — that stray pixel gets absorbed into
    fitted shifts and then breaks the metadata pose conversion (the
    matrices in metadata_alignment_matrices mirror about the exact
    center)."""
    imgs = jnp.asarray(imgs)
    n = imgs.shape[axis]
    out = jnp.flip(imgs, axis=axis)
    if n % 2 == 0:
        out = jnp.roll(out, 1, axis=axis)
    return out


def rotate_vector_2d(vx, vy, angle_deg):
    """Rotate 2-vectors by angle (consistent with R(a) composition:
    v' = (c·vx + s·vy, -s·vx + c·vy))."""
    a = jnp.deg2rad(jnp.asarray(angle_deg, jnp.float32))
    c, s = jnp.cos(a), jnp.sin(a)
    return c * vx + s * vy, -s * vx + c * vy


def alignment_to_md_pose(psi_align, sx, sy, flip=None):
    """Convert 'applied alignment' params (aligned = warp(T(s)·S·R_a(ψ)) of
    the experimental image, found on its x-mirror when flip) into the stored
    metadata pose convention consumed by apply_md_geometry
    (M = M_x^flip·R_md(ψm)·T(sm)).

    Derivation (matrix identity warp(M_md) == warp(A_align·F^flip)):
      no flip:  M_md = T(s)·R_md(-ψ)         => ψm = -ψ, sm = R_md(-ψ)·s
      flip:     F·R_md(ψm)·T(sm) = T(s)·R_md(-ψ)·F
                                 = F·T(Fs)·R_md(ψ)
                => ψm = ψ,  sm = R_md(-ψ)·(-sx, sy)
    (F = diag(-1,1) x-mirror; R_a(ψ) = R_md(-ψ).) The flip branch is pinned
    by the mirror writer-identity golden (tests/test_golden_readapplygeo.py)."""
    psi_align = jnp.asarray(psi_align, jnp.float32)
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    if flip is None:
        flip = jnp.zeros(psi_align.shape, bool)
    f = jnp.asarray(flip)
    psi_md = jnp.where(f, psi_align, -psi_align)
    sx_eff = jnp.where(f, -sx, sx)
    sx_md, sy_md = rotate_vector_2d(sx_eff, sy, psi_md)
    psi_md = jnp.mod(psi_md + 180.0, 360.0) - 180.0
    return psi_md, sx_md, sy_md, f


def xmipp_geo_matrices(psi, sx, sy, flip=None, scale=None):
    """The reference geo2TransformationMatrix: gather matrix
    A = [[S·c, -S·s, sx], [S·s, S·c, sy], [0,0,1]] in (x, y) logical coords
    (flip negates the first row's rotation part). readApplyGeo resamples
    out(x) = in(A·x) — pinned EXACTLY by the reference fixtures
    pythoninterface/tinyRotated.spi (psi=90) and image/test2_wrap_*.spi
    (psi=45, tests/test_golden_readapplygeo.py)."""
    psi_r = jnp.deg2rad(jnp.asarray(psi, jnp.float32))
    sx = jnp.asarray(sx, jnp.float32)
    sy = jnp.asarray(sy, jnp.float32)
    B = psi_r.shape[0]
    sc = jnp.ones(B, jnp.float32) if scale is None else \
        jnp.asarray(scale, jnp.float32)
    c, s = jnp.cos(psi_r) * sc, jnp.sin(psi_r) * sc
    if flip is None:
        f = jnp.zeros(B, bool)
    else:
        f = jnp.asarray(flip).astype(bool)
    sgn = jnp.where(f, -1.0, 1.0)
    zeros = jnp.zeros(B, jnp.float32)
    ones = jnp.ones(B, jnp.float32)
    return jnp.stack([
        jnp.stack([sgn * c, -sgn * s, sx], axis=-1),
        jnp.stack([s, c, sy], axis=-1),
        jnp.stack([zeros, zeros, ones], axis=-1)], axis=-2)


def read_apply_geo(imgs, psi, sx, sy, flip=None, scale=None,
                   order: int = 3, wrap: bool = False):
    """Reference Image::readApplyGeo semantics: apply the stored 2-D
    registration geometry exactly as xmippCore does (BSPLINE3, gather with
    the geo2TransformationMatrix — see xmipp_geo_matrices). This is the
    convention of reference-written align2d-style metadata; note it differs
    from apply_md_geometry (our projection-pose registration,
    readApplyGeo(psi) == apply_md_geometry(-psi) for pure rotations)."""
    A = xmipp_geo_matrices(psi, sx, sy, flip, scale)
    return apply_affine_2d(imgs, A, order=order, wrap=wrap, inverse=True)


def registration_pose_to_xmipp_row(psi_align, sx, sy, flip=None):
    """Convert our aligner's registration parameters into the reference
    align2d row convention (transformationMatrix2Parameters2D analog):
    the returned (psi, shiftX, shiftY, flip, scale) row satisfies
    read_apply_geo(row) == apply_md_geometry(alignment_to_md_pose(...)),
    i.e. a reference readApplyGeo reproduces our registered image
    (reference align2d.cpp:231-234 writer; identity pinned by
    tests/test_golden_readapplygeo.py)."""
    pm, sxm, sym, f = alignment_to_md_pose(psi_align, sx, sy, flip)
    M = np.asarray(metadata_alignment_matrices(pm, sxm, sym, f), np.float64)
    A = np.linalg.inv(M)
    flip_out = np.linalg.det(A[:, :2, :2]) < 0
    R = A[:, :2, :2].copy()
    R[flip_out, 0, :] *= -1.0
    psi_out = np.degrees(np.arctan2(R[:, 1, 0], R[:, 0, 0]))
    scale = np.hypot(R[:, 0, 0], R[:, 1, 0])
    return (psi_out.astype(np.float32), A[:, 0, 2].astype(np.float32),
            A[:, 1, 2].astype(np.float32), flip_out,
            scale.astype(np.float32))


def rotate_2d(imgs, angles, order: int = 1, wrap: bool = False):
    B = imgs.shape[0] if imgs.ndim == 3 else 1
    z = jnp.zeros(B, jnp.float32)
    ang = jnp.broadcast_to(jnp.asarray(angles, jnp.float32), (B,))
    return apply_affine_2d(imgs, alignment_matrices_2d(ang, z, z), order=order,
                           wrap=wrap)


def shift_2d_real(imgs, sx, sy, order: int = 1, wrap: bool = False):
    B = imgs.shape[0] if imgs.ndim == 3 else 1
    z = jnp.zeros(B, jnp.float32)
    return apply_affine_2d(imgs, alignment_matrices_2d(
        z, jnp.broadcast_to(jnp.asarray(sx, jnp.float32), (B,)),
        jnp.broadcast_to(jnp.asarray(sy, jnp.float32), (B,))),
        order=order, wrap=wrap)


# ---------------------------------------------------------------------------
# 3D affine (volumes): used by symmetrize / volume align
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("wrap",))
def apply_affine_3d(vol, mats, wrap: bool = False):
    """vol (D,H,W), mats (S,3,3) rotation-only (or (S,3,4) with translation);
    returns (S,D,H,W) — one warped copy per matrix (symmetry replication)."""
    vol = jnp.asarray(vol, jnp.float32)
    D, H, W = vol.shape
    mats = jnp.asarray(mats, jnp.float32)
    if mats.ndim == 2:
        mats = mats[None]
    if mats.shape[-1] == 3:
        mats = jnp.concatenate(
            [mats, jnp.zeros(mats.shape[:-1] + (1,), mats.dtype)], axis=-1)
    cz, cy, cx = D // 2, H // 2, W // 2
    zz = jnp.arange(D, dtype=jnp.float32)[:, None, None] - cz
    yy = jnp.arange(H, dtype=jnp.float32)[None, :, None] - cy
    xx = jnp.arange(W, dtype=jnp.float32)[None, None, :] - cx

    def one(M):
        R = jnp.linalg.inv(M[:, :3])
        t = M[:, 3]
        xs = R[0, 0] * (xx - t[0]) + R[0, 1] * (yy - t[1]) + R[0, 2] * (zz - t[2])
        ys = R[1, 0] * (xx - t[0]) + R[1, 1] * (yy - t[1]) + R[1, 2] * (zz - t[2])
        zs = R[2, 0] * (xx - t[0]) + R[2, 1] * (yy - t[1]) + R[2, 2] * (zz - t[2])
        zi = zs + cz
        yi = ys + cy
        xi = xs + cx
        z0 = jnp.floor(zi).astype(jnp.int32)
        y0 = jnp.floor(yi).astype(jnp.int32)
        x0 = jnp.floor(xi).astype(jnp.int32)
        fz, fy, fx = zi - z0, yi - y0, xi - x0
        out = jnp.zeros((D, H, W), jnp.float32)
        for dz in range(2):
            for dy in range(2):
                for dx in range(2):
                    zj, yj, xj = z0 + dz, y0 + dy, x0 + dx
                    w = (jnp.where(dz, fz, 1 - fz) * jnp.where(dy, fy, 1 - fy)
                         * jnp.where(dx, fx, 1 - fx))
                    if wrap:
                        val = vol[jnp.mod(zj, D), jnp.mod(yj, H), jnp.mod(xj, W)]
                    else:
                        inside = ((zj >= 0) & (zj < D) & (yj >= 0) & (yj < H)
                                  & (xj >= 0) & (xj < W))
                        val = jnp.where(
                            inside, vol[jnp.clip(zj, 0, D - 1),
                                        jnp.clip(yj, 0, H - 1),
                                        jnp.clip(xj, 0, W - 1)], 0.0)
                    out = out + w * val
        return out

    return jax.vmap(one)(mats)


def window_2d(imgs, out_h: int, out_w: int, fill: float = 0.0):
    """Center crop/pad (xmipp transform_window semantics, centered origins)."""
    imgs = jnp.asarray(imgs)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    out = jnp.full((B, out_h, out_w), fill, imgs.dtype)
    # align logical centers
    cy, cx = H // 2, W // 2
    oy, ox = out_h // 2, out_w // 2
    y0_src = max(0, cy - oy)
    x0_src = max(0, cx - ox)
    y0_dst = max(0, oy - cy)
    x0_dst = max(0, ox - cx)
    hh = min(H - y0_src, out_h - y0_dst)
    ww = min(W - x0_src, out_w - x0_dst)
    out = out.at[:, y0_dst:y0_dst + hh, x0_dst:x0_dst + ww].set(
        imgs[:, y0_src:y0_src + hh, x0_src:x0_src + ww])
    return out[0] if single else out


def window_2d_logical(img, y0: int, x0: int, yF: int, xF: int,
                      fill: float = 0.0):
    """Crop/pad to the logical window [y0..yF] x [x0..xF] (the reference
    window2D contract: indices are LOGICAL, the array's origin at
    (H//2, W//2); out size (yF-y0+1, xF-x0+1) with out's STARTING at
    (y0, x0)). Out-of-range source pixels take `fill`."""
    img = np.asarray(img)
    H, W = img.shape[-2:]
    oh, ow = yF - y0 + 1, xF - x0 + 1
    out = np.full(img.shape[:-2] + (oh, ow), fill, img.dtype)
    cy, cx = H // 2, W // 2
    ys = np.arange(y0, yF + 1) + cy
    xs = np.arange(x0, xF + 1) + cx
    ok_y = (ys >= 0) & (ys < H)
    ok_x = (xs >= 0) & (xs < W)
    iy = np.where(ok_y)[0]
    ix = np.where(ok_x)[0]
    if iy.size and ix.size:
        out[..., iy[0]:iy[-1] + 1, ix[0]:ix[-1] + 1] = \
            img[..., ys[iy[0]]:ys[iy[-1]] + 1, xs[ix[0]]:xs[ix[-1]] + 1]
    return out
