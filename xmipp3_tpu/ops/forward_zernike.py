"""Forward-model Zernike3D per-particle fitting (forward_zernike_images).

Rebuilds the reference's DISTINCT forward engine
(reconstruction/forward_zernike_images.{h,cpp}: deformVol at :1047-1145
splats each masked voxel, displaced by the Zernike3D deformation field,
directly into the rotated projection plane; cost = image correlation +
lambda·deformation, optimized per particle) — unlike angular_sph_alignment,
which deforms the volume and projects through the Fourier projector.

TPU-first: the splat is a differentiable bilinear scatter-add inside jit,
so the per-particle optimization is GRADIENT-based (Adam on coefficients +
pose deltas) instead of the reference's Powell loop, and runs vmapped over
a particle batch as one device dispatch.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.zernike import (real_sph_harm, zernike_indices,
                                    zernike_radial)


def masked_voxel_basis(vol: np.ndarray, L1: int, L2: int,
                       rmax: float | None = None,
                       value_threshold: float = 0.0):
    """Voxel positions/values inside the deformation sphere + the Zernike3D
    basis evaluated AT those voxels: returns (positions (N,3) [x,y,z]
    centered, values (N,), Z (K,N))."""
    D = vol.shape[0]
    if rmax is None:
        rmax = D / 2 - 1
    z, y, x = np.mgrid[0:D, 0:D, 0:D].astype(np.float64)
    zc, yc, xc = z - D // 2, y - D // 2, x - D // 2
    r = np.sqrt(xc * xc + yc * yc + zc * zc)
    sel = (r <= rmax) & (np.abs(vol) > value_threshold)
    pos = np.stack([xc[sel], yc[sel], zc[sel]], axis=1)
    vals = np.asarray(vol)[sel].astype(np.float32)
    xr, yr, zr = (pos[:, 0] / rmax, pos[:, 1] / rmax, pos[:, 2] / rmax)
    rr = np.sqrt(xr * xr + yr * yr + zr * zr)
    rs = np.where(rr > 0, rr, 1e-9)
    theta = np.arccos(np.clip(zr / rs, -1, 1))
    phi = np.arctan2(yr, xr)
    idx = zernike_indices(L1, L2)
    Z = np.zeros((len(idx), len(vals)), np.float32)
    for k, (l, n, m) in enumerate(idx):
        Z[k] = (zernike_radial(n, l, rr)
                * real_sph_harm(l, m, theta, phi)).astype(np.float32)
    return pos.astype(np.float32), vals, Z


def _euler_rows(rot, tilt, psi):
    """First two rows of the ZYZ passive matrix (traced angles, degrees)."""
    r, t, p = (jnp.deg2rad(rot), jnp.deg2rad(tilt), jnp.deg2rad(psi))
    c1, s1 = jnp.cos(r), jnp.sin(r)
    c2, s2 = jnp.cos(t), jnp.sin(t)
    c3, s3 = jnp.cos(p), jnp.sin(p)
    row0 = jnp.stack([c3 * c2 * c1 - s3 * s1, c3 * c2 * s1 + s3 * c1,
                      -c3 * s2])
    row1 = jnp.stack([-s3 * c2 * c1 - c3 * s1, -s3 * c2 * s1 + c3 * c1,
                      s3 * s2])
    return row0, row1


def forward_splat_project(positions, values, Z, coeffs3, rot, tilt, psi,
                          size: int):
    """Project the deformed voxel cloud: g = coeffs3·Z displaces each voxel,
    the pose rows map it to image coords, and the value is splat with
    bilinear weights (differentiable scatter-add). Returns ((size, size)
    image, mean squared deformation)."""
    g = coeffs3 @ Z                                      # (3, N)
    p = positions.T + g                                  # (3, N) x,y,z
    row0, row1 = _euler_rows(rot, tilt, psi)
    xi = row0[0] * p[0] + row0[1] * p[1] + row0[2] * p[2] + size // 2
    yi = row1[0] * p[0] + row1[1] * p[1] + row1[2] * p[2] + size // 2
    x0 = jnp.floor(xi)
    y0 = jnp.floor(yi)
    fx = xi - x0
    fy = yi - y0
    x0 = x0.astype(jnp.int32)
    y0 = y0.astype(jnp.int32)
    img = jnp.zeros((size, size), jnp.float32)
    for dy in (0, 1):
        for dx in (0, 1):
            w = jnp.where(dy, fy, 1 - fy) * jnp.where(dx, fx, 1 - fx)
            yy = jnp.clip(y0 + dy, 0, size - 1)
            xx = jnp.clip(x0 + dx, 0, size - 1)
            inside = ((y0 + dy >= 0) & (y0 + dy < size)
                      & (x0 + dx >= 0) & (x0 + dx < size))
            img = img.at[yy, xx].add(jnp.where(inside, w * values, 0.0))
    def2 = jnp.mean(jnp.sum(g * g, axis=0))
    return img, def2


@partial(jax.jit, static_argnames=("size", "steps"))
def fit_forward_zernike_batch(positions, values, Z, imgs, rots, tilts, psis,
                              coeffs0, lam: float, size: int, steps: int,
                              lr: float = 0.5, max_angular: float = 5.0,
                              max_shift: float = 5.0):
    """Per-particle forward-model fit (vmapped batch, single dispatch):
    Adam over (3, K) deformation coefficients + (drot, dtilt, dpsi, dx, dy)
    minimizing  -corr(P, I) + lam·sqrt(mean|g|^2).
    Returns (coeffs (B,3,K), dpose (B,5), corr (B,), deformation (B,))."""

    def project(c3, dpose, rot, tilt, psi):
        img, def2 = forward_splat_project(
            positions, values, Z, c3,
            rot + jnp.clip(dpose[0], -max_angular, max_angular),
            tilt + jnp.clip(dpose[1], -max_angular, max_angular),
            psi + jnp.clip(dpose[2], -max_angular, max_angular), size)
        sx = jnp.clip(dpose[3], -max_shift, max_shift)
        sy = jnp.clip(dpose[4], -max_shift, max_shift)
        # shift the projection in Fourier space (differentiable, exact)
        fy = jnp.fft.fftfreq(size).astype(jnp.float32)[:, None]
        fx = jnp.fft.rfftfreq(size).astype(jnp.float32)[None, :]
        spec = jnp.fft.rfft2(img)
        phase = jnp.exp(-2j * jnp.pi * (fy * sy + fx * sx))
        return jnp.fft.irfft2(spec * phase, (size, size)), def2

    def corr(a, b):
        am = a - a.mean()
        bm = b - b.mean()
        return (am * bm).sum() / jnp.sqrt(
            jnp.maximum((am * am).sum() * (bm * bm).sum(), 1e-20))

    def loss_one(params, img, rot, tilt, psi):
        c3, dpose = params
        P, def2 = project(c3, dpose, rot, tilt, psi)
        return -corr(P, img) + lam * jnp.sqrt(def2 + 1e-12)

    def fit_one(img, rot, tilt, psi, c0):
        params = (c0, jnp.zeros(5, jnp.float32))
        m = jax.tree_util.tree_map(jnp.zeros_like, params)
        v = jax.tree_util.tree_map(jnp.zeros_like, params)
        b1, b2, eps = 0.9, 0.999, 1e-8

        def step(carry, t):
            params, m, v = carry
            g = jax.grad(loss_one)(params, img, rot, tilt, psi)
            m = jax.tree_util.tree_map(lambda a, b: b1 * a + (1 - b1) * b,
                                       m, g)
            v = jax.tree_util.tree_map(
                lambda a, b: b2 * a + (1 - b2) * b * b, v, g)
            tt = t + 1
            params = jax.tree_util.tree_map(
                lambda p, mm, vv: p - lr * (mm / (1 - b1 ** tt))
                / (jnp.sqrt(vv / (1 - b2 ** tt)) + eps), params, m, v)
            return (params, m, v), 0.0

        (params, _, _), _ = jax.lax.scan(step, (params, m, v),
                                         jnp.arange(steps, dtype=jnp.float32))
        c3, dpose = params
        P, def2 = project(c3, dpose, rot, tilt, psi)
        return c3, dpose, corr(P, img), jnp.sqrt(def2)

    return jax.vmap(fit_one)(imgs, rots, tilts, psis, coeffs0)
