"""Forward-model Zernike3D per-particle fitting (forward_zernike_images).

Rebuilds the reference's DISTINCT forward engine
(reconstruction/forward_zernike_images.{h,cpp}: deformVol at :1047-1145
splats each masked voxel, displaced by the Zernike3D deformation field,
directly into the rotated projection plane; cost = image correlation +
lambda·deformation, optimized per particle) — unlike angular_sph_alignment,
which deforms the volume and projects through the Fourier projector.

TPU-first: the splat is a differentiable bilinear scatter-add inside jit,
so the per-particle optimization is GRADIENT-based (Adam on coefficients +
pose/defocus deltas) instead of the reference's Powell loop, and runs
vmapped over a particle batch as one device dispatch. The full reference
option surface is supported: voxel selection via --mask/--Rmax/--step,
basis radius --RDef, KB blob splatting (--blobr; reference blob order 2,
alpha 7.05, forward_zernike_images.cpp:279-281), per-image CTF in the
forward model (--useCTF/--phaseFlipped/--optimizeDefocus), per-group
optimize gates, and the pairs/triplets multi-image mode (MDL_IMAGE1/2 +
angleRot2/3... labels, forward_zernike_images.cpp:653-705) where the
deformation coefficients are shared across the 2-3 images of a particle
and each image keeps its own pose/defocus deltas.
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
                       value_threshold: float = 0.0,
                       mask: np.ndarray | None = None,
                       rdef: float | None = None,
                       step: int = 1):
    """Voxel positions/values inside the deformation sphere + the Zernike3D
    basis evaluated AT those voxels: returns (positions (N,3) [x,y,z]
    centered, values (N,), Z (K,N)).

    rmax selects voxels (radius in px; reference --Rmax), rdef normalizes
    the Zernike basis (reference --RDef; defaults to rmax), mask restricts
    the selection to mask>0 (reference --mask), and step keeps every
    step-th voxel along each axis (reference --step, the deformVol loop
    stride)."""
    D = vol.shape[0]
    if rmax is None or rmax <= 0:
        rmax = D / 2 - 1
    if rdef is None or rdef <= 0:
        rdef = rmax
    z, y, x = np.mgrid[0:D, 0:D, 0:D].astype(np.float64)
    zc, yc, xc = z - D // 2, y - D // 2, x - D // 2
    r = np.sqrt(xc * xc + yc * yc + zc * zc)
    sel = (r <= rmax) & (np.abs(vol) > value_threshold)
    if mask is not None:
        sel &= np.squeeze(np.asarray(mask)) > 0.5
    if step > 1:
        sel &= ((z % step == 0) & (y % step == 0) & (x % step == 0))
    pos = np.stack([xc[sel], yc[sel], zc[sel]], axis=1)
    vals = np.asarray(vol)[sel].astype(np.float32)
    xr, yr, zr = (pos[:, 0] / rdef, pos[:, 1] / rdef, pos[:, 2] / rdef)
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


def blob_splat_profile(blob_r: float, order: int = 2, alpha: float = 7.05,
                       samples_per_px: int = 32):
    """Radial profile of the PROJECTED 3-D Kaiser-Bessel blob (its line
    integral along the projection direction), tabulated at 1/samples_per_px
    px — the reference's splatting footprint (blob.radius=blobr, order 2,
    alpha 7.05, forward_zernike_images.cpp:279-281). Returns (profile
    (T,), n_taps) where n_taps is the integer tap half-width."""
    from xmipp3_tpu.ops.basis import kaiser_value
    n_taps = int(np.ceil(blob_r))
    smax = n_taps + 1.0
    s = np.arange(int(smax * samples_per_px) + 2) / samples_per_px
    zq = np.linspace(-blob_r, blob_r, 257)
    rr = np.sqrt(s[:, None] ** 2 + zq[None, :] ** 2)
    vals = np.asarray(kaiser_value(rr.ravel(), a=blob_r, alpha=alpha,
                                   m=order), np.float64).reshape(rr.shape)
    prof = np.trapezoid(vals, zq, axis=1)
    # normalize to unit mass on the 2-D plane so splatted images keep the
    # voxel values' scale (sum over the footprint ≈ 1)
    ss = np.arange(0.0, smax, 1.0 / samples_per_px)
    pr = np.interp(ss, s, prof)
    mass = np.trapezoid(2 * np.pi * ss * pr, ss)
    prof = prof / max(mass, 1e-12)
    return prof.astype(np.float32), n_taps


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
                          size: int, blob_profile=None, n_taps: int = 0,
                          samples_per_px: int = 32):
    """Project the deformed voxel cloud: g = coeffs3·Z displaces each voxel,
    the pose rows map it to image coords, and the value is splat with
    bilinear weights (differentiable scatter-add) — or, when blob_profile
    is given, with the projected KB blob footprint over a (2·n_taps+1)²
    tap window. Returns ((size, size) image, mean squared deformation)."""
    g = coeffs3 @ Z                                      # (3, N)
    p = positions.T + g                                  # (3, N) x,y,z
    row0, row1 = _euler_rows(rot, tilt, psi)
    xi = row0[0] * p[0] + row0[1] * p[1] + row0[2] * p[2] + size // 2
    yi = row1[0] * p[0] + row1[1] * p[1] + row1[2] * p[2] + size // 2
    img = jnp.zeros((size, size), jnp.float32)
    if blob_profile is None or n_taps <= 0:
        x0 = jnp.floor(xi)
        y0 = jnp.floor(yi)
        fx = xi - x0
        fy = yi - y0
        x0 = x0.astype(jnp.int32)
        y0 = y0.astype(jnp.int32)
        for dy in (0, 1):
            for dx in (0, 1):
                w = jnp.where(dy, fy, 1 - fy) * jnp.where(dx, fx, 1 - fx)
                yy = jnp.clip(y0 + dy, 0, size - 1)
                xx = jnp.clip(x0 + dx, 0, size - 1)
                inside = ((y0 + dy >= 0) & (y0 + dy < size)
                          & (x0 + dx >= 0) & (x0 + dx < size))
                img = img.at[yy, xx].add(jnp.where(inside, w * values, 0.0))
    else:
        x0 = jnp.round(xi).astype(jnp.int32)
        y0 = jnp.round(yi).astype(jnp.int32)
        T = blob_profile.shape[0]
        for dy in range(-n_taps, n_taps + 1):
            for dx in range(-n_taps, n_taps + 1):
                yy = y0 + dy
                xx = x0 + dx
                dist = jnp.sqrt((yi - yy.astype(jnp.float32)) ** 2
                                + (xi - xx.astype(jnp.float32)) ** 2
                                + 1e-12)
                # linear interpolation of the footprint table so the
                # position gradient flows through the blob weight (an
                # integer lookup would zero the deformation/pose grads)
                tf = jnp.clip(dist * samples_per_px, 0.0, T - 1.001)
                ti = tf.astype(jnp.int32)
                frac = tf - ti.astype(jnp.float32)
                w = (jnp.take(blob_profile, ti) * (1 - frac)
                     + jnp.take(blob_profile, ti + 1) * frac)
                inside = ((yy >= 0) & (yy < size) & (xx >= 0) & (xx < size)
                          & (dist < n_taps + 1.0))
                img = img.at[jnp.clip(yy, 0, size - 1),
                             jnp.clip(xx, 0, size - 1)].add(
                    jnp.where(inside, w * values, 0.0))
    def2 = jnp.mean(jnp.sum(g * g, axis=0))
    return img, def2


def _ctf_spec(size: int, defU, defV, ang, ctf_consts,
              phase_flipped: bool):
    """Astigmatic CTF on this image's rfft grid from scalar defocus
    (same parametrization as ops/continuous._ctf_rfft)."""
    K1, K2, Ksin, Kcos, Ts = ctf_consts
    fy = jnp.fft.fftfreq(size).astype(jnp.float32)[:, None]
    fx = jnp.fft.rfftfreq(size).astype(jnp.float32)[None, :]
    r2 = fx * fx + fy * fy
    u2 = r2 / (Ts * Ts)
    safe = jnp.maximum(r2, 1e-30)
    c2t = (fx * fx - fy * fy) / safe
    s2t = 2 * fx * fy / safe
    az = jnp.deg2rad(ang)
    cos2 = c2t * jnp.cos(2 * az) + s2t * jnp.sin(2 * az)
    deltaf = -(defU + defV) / 2 + (-(defU - defV) / 2) * cos2
    arg = K1 * deltaf * u2 + K2 * u2 * u2
    ctf = -(Ksin * jnp.sin(arg) - Kcos * jnp.cos(arg))
    return jnp.abs(ctf) if phase_flipped else ctf


@partial(jax.jit, static_argnames=("size", "steps", "n_taps", "use_ctf",
                                   "phase_flipped", "opt_align",
                                   "opt_deform", "opt_defocus"))
def fit_forward_zernike_batch(positions, values, Z, imgs, rots, tilts, psis,
                              coeffs0, lam: float, size: int, steps: int,
                              lr: float = 0.5, max_angular: float = 5.0,
                              max_shift: float = 5.0,
                              shifts_x=None, shifts_y=None,
                              blob_profile=None, n_taps: int = 0,
                              use_ctf: bool = False,
                              phase_flipped: bool = False,
                              defU=None, defV=None, defAng=None,
                              ctf_consts=(0.0, 0.0, 1.0, 0.0, 1.0),
                              opt_align: bool = True,
                              opt_deform: bool = True,
                              opt_defocus: bool = False,
                              img_mask=None):
    """Per-particle forward-model fit (vmapped batch, single dispatch):
    Adam over (3, K) deformation coefficients + per-image
    (drot, dtilt, dpsi, dx, dy, ddefU, ddefV, ddefAng) deltas minimizing
    mean_images[-corr(P_m, I_m)] + lam·sqrt(mean|g|^2), with the
    --optimize* gates as per-group learning rates (0 freezes a group, the
    reference's parameter-subset Powell). Images may carry a multi-image
    axis (B, M, H, W) for the pairs/triplets mode — the coefficients are
    shared across M, the deltas are per image.
    Returns (coeffs (B,3,K), dpose (B,[M,]8), corr (B[,M]), deform (B,))."""
    multi = imgs.ndim == 4
    if not multi:
        imgs = imgs[:, None]
        rots, tilts, psis = rots[:, None], tilts[:, None], psis[:, None]
    B, M = imgs.shape[0], imgs.shape[1]

    def opt2(a):
        if a is None:
            return jnp.zeros((B, M), jnp.float32)
        a = jnp.asarray(a, jnp.float32)
        return a[:, None] * jnp.ones((1, M), jnp.float32) if a.ndim == 1 \
            else a
    sx0, sy0 = opt2(shifts_x), opt2(shifts_y)
    dU0, dV0, dA0 = opt2(defU), opt2(defV), opt2(defAng)

    lr_a = lr if opt_align else 0.0
    lr_d = 30.0 if (opt_defocus and use_ctf) else 0.0
    lr_pose = jnp.asarray([lr_a, lr_a, lr_a, lr_a, lr_a, lr_d, lr_d,
                           0.1 * lr_d], jnp.float32)
    lr_c = lr if opt_deform else 0.0

    def project(c3, dp, rot, tilt, psi, sx_i, sy_i, dU_i, dV_i, dA_i):
        img, def2 = forward_splat_project(
            positions, values, Z, c3,
            rot + jnp.clip(dp[0], -max_angular, max_angular),
            tilt + jnp.clip(dp[1], -max_angular, max_angular),
            psi + jnp.clip(dp[2], -max_angular, max_angular), size,
            blob_profile=blob_profile, n_taps=n_taps)
        sx = sx_i + jnp.clip(dp[3], -max_shift, max_shift)
        sy = sy_i + jnp.clip(dp[4], -max_shift, max_shift)
        # shift the projection in Fourier space (differentiable, exact)
        fy = jnp.fft.fftfreq(size).astype(jnp.float32)[:, None]
        fx = jnp.fft.rfftfreq(size).astype(jnp.float32)[None, :]
        spec = jnp.fft.rfft2(img)
        phase = jnp.exp(-2j * jnp.pi * (fy * sy + fx * sx))
        spec = spec * phase
        if use_ctf:
            spec = spec * _ctf_spec(size, dU_i + dp[5], dV_i + dp[6],
                                    dA_i + dp[7], ctf_consts, phase_flipped)
        return jnp.fft.irfft2(spec, (size, size)), def2

    def corr(a, b):
        # masked correlation over the --Rmax circular region (the
        # reference's mask2D, forward_zernike_images.cpp:242-246)
        if img_mask is None:
            am = a - a.mean()
            bm = b - b.mean()
            return (am * bm).sum() / jnp.sqrt(
                jnp.maximum((am * am).sum() * (bm * bm).sum(), 1e-20))
        w = img_mask
        ws = jnp.maximum(w.sum(), 1e-20)
        am = a - (a * w).sum() / ws
        bm = b - (b * w).sum() / ws
        return (w * am * bm).sum() / jnp.sqrt(
            jnp.maximum((w * am * am).sum() * (w * bm * bm).sum(), 1e-20))

    def loss_one(params, img_m, rot_m, tilt_m, psi_m, sx_m, sy_m,
                 dU_m, dV_m, dA_m):
        c3, dpose = params                       # dpose (M, 8)
        Ps, def2s = jax.vmap(
            lambda dp, im, r, t, p, sx, sy, du, dv, da: project(
                c3, dp, r, t, p, sx, sy, du, dv, da))(
            dpose, img_m, rot_m, tilt_m, psi_m, sx_m, sy_m, dU_m, dV_m,
            dA_m)
        cc = jax.vmap(corr)(Ps, img_m)
        return -cc.mean() + lam * jnp.sqrt(def2s[0] + 1e-12)

    def fit_one(img_m, rot_m, tilt_m, psi_m, c0, sx_m, sy_m, dU_m, dV_m,
                dA_m):
        params = (c0, jnp.zeros((M, 8), jnp.float32))
        m = jax.tree_util.tree_map(jnp.zeros_like, params)
        v = jax.tree_util.tree_map(jnp.zeros_like, params)
        b1, b2, eps = 0.9, 0.999, 1e-8
        lrs = (lr_c, lr_pose[None, :])

        def step(carry, t):
            params, m, v = carry
            g = jax.grad(loss_one)(params, img_m, rot_m, tilt_m, psi_m,
                                   sx_m, sy_m, dU_m, dV_m, dA_m)
            m = jax.tree_util.tree_map(lambda a, b: b1 * a + (1 - b1) * b,
                                       m, g)
            v = jax.tree_util.tree_map(
                lambda a, b: b2 * a + (1 - b2) * b * b, v, g)
            tt = t + 1
            params = jax.tree_util.tree_map(
                lambda p, mm, vv, l: p - l * (mm / (1 - b1 ** tt))
                / (jnp.sqrt(vv / (1 - b2 ** tt)) + eps), params, m, v,
                lrs)
            return (params, m, v), 0.0

        (params, _, _), _ = jax.lax.scan(step, (params, m, v),
                                         jnp.arange(steps, dtype=jnp.float32))
        c3, dpose = params
        Ps, def2s = jax.vmap(
            lambda dp, im, r, t, p, sx, sy, du, dv, da: project(
                c3, dp, r, t, p, sx, sy, du, dv, da))(
            dpose, img_m, rot_m, tilt_m, psi_m, sx_m, sy_m, dU_m, dV_m,
            dA_m)
        cc = jax.vmap(corr)(Ps, img_m)
        # report clipped (= applied) deltas
        dpose = dpose.at[:, 0:3].set(
            jnp.clip(dpose[:, 0:3], -max_angular, max_angular))
        dpose = dpose.at[:, 3:5].set(
            jnp.clip(dpose[:, 3:5], -max_shift, max_shift))
        return c3, dpose, cc, jnp.sqrt(def2s[0])

    c3, dpose, cc, deform = jax.vmap(fit_one)(
        imgs, rots, tilts, psis, coeffs0, sx0, sy0, dU0, dV0, dA0)
    if not multi:
        dpose, cc = dpose[:, 0], cc[:, 0]
    return c3, dpose, cc, deform


# ---------------------------------------------------------------------------
# 3-D forward splatting (forward_zernike_subtomos / forward_zernike_volume /
# volume_apply_coefficient_zernike3d --blobr)
# ---------------------------------------------------------------------------

def blob_splat_profile_3d(blob_r: float, order: int = 2,
                          alpha: float = 7.05, samples_per_px: int = 32):
    """Radial table of the 3-D Kaiser-Bessel blob VALUE (not projected),
    normalized to unit integral over R^3 — the volume-splat footprint.
    Returns (profile (T,), n_taps)."""
    from xmipp3_tpu.ops.basis import kaiser_value
    n_taps = int(np.ceil(blob_r))
    smax = n_taps + 1.0
    s = np.arange(int(smax * samples_per_px) + 2) / samples_per_px
    prof = np.asarray(kaiser_value(s, a=blob_r, alpha=alpha, m=order),
                      np.float64)
    mass = np.trapezoid(4 * np.pi * s * s * prof, s)
    prof = prof / max(mass, 1e-12)
    return prof.astype(np.float32), n_taps


def _euler_full(rot, tilt, psi):
    """Full ZYZ passive matrix rows (traced angles, degrees)."""
    r, t, p = (jnp.deg2rad(rot), jnp.deg2rad(tilt), jnp.deg2rad(psi))
    c1, s1 = jnp.cos(r), jnp.sin(r)
    c2, s2 = jnp.cos(t), jnp.sin(t)
    c3, s3 = jnp.cos(p), jnp.sin(p)
    row0 = jnp.stack([c3 * c2 * c1 - s3 * s1, c3 * c2 * s1 + s3 * c1,
                      -c3 * s2])
    row1 = jnp.stack([-s3 * c2 * c1 - c3 * s1, -s3 * c2 * s1 + c3 * c1,
                      s3 * s2])
    row2 = jnp.stack([s2 * c1, s2 * s1, c2])
    return row0, row1, row2


def forward_splat_volume(positions, values, Z, coeffs3, rot, tilt, psi,
                         size: int, blob_profile=None, n_taps: int = 0,
                         samples_per_px: int = 32):
    """Splat the deformed, rotated voxel cloud into a (size,size,size)
    volume: g = coeffs3·Z displaces each voxel, the full pose matrix maps
    it, and the value lands with trilinear weights (differentiable) — or
    the 3-D KB blob footprint over a (2·n_taps+1)³ window. Returns
    (volume, mean squared deformation)."""
    g = coeffs3 @ Z
    p = positions.T + g                                  # (3,N) x,y,z
    row0, row1, row2 = _euler_full(rot, tilt, psi)
    xi = row0[0] * p[0] + row0[1] * p[1] + row0[2] * p[2] + size // 2
    yi = row1[0] * p[0] + row1[1] * p[1] + row1[2] * p[2] + size // 2
    zi = row2[0] * p[0] + row2[1] * p[1] + row2[2] * p[2] + size // 2
    vol = jnp.zeros((size, size, size), jnp.float32)
    if blob_profile is None or n_taps <= 0:
        x0 = jnp.floor(xi); y0 = jnp.floor(yi); z0 = jnp.floor(zi)
        fx = xi - x0; fy = yi - y0; fz = zi - z0
        x0 = x0.astype(jnp.int32); y0 = y0.astype(jnp.int32)
        z0 = z0.astype(jnp.int32)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = (jnp.where(dz, fz, 1 - fz)
                         * jnp.where(dy, fy, 1 - fy)
                         * jnp.where(dx, fx, 1 - fx))
                    zz = z0 + dz; yy = y0 + dy; xx = x0 + dx
                    inside = ((zz >= 0) & (zz < size) & (yy >= 0)
                              & (yy < size) & (xx >= 0) & (xx < size))
                    vol = vol.at[jnp.clip(zz, 0, size - 1),
                                 jnp.clip(yy, 0, size - 1),
                                 jnp.clip(xx, 0, size - 1)].add(
                        jnp.where(inside, w * values, 0.0))
    else:
        x0 = jnp.round(xi).astype(jnp.int32)
        y0 = jnp.round(yi).astype(jnp.int32)
        z0 = jnp.round(zi).astype(jnp.int32)
        T = blob_profile.shape[0]
        for dz in range(-n_taps, n_taps + 1):
            for dy in range(-n_taps, n_taps + 1):
                for dx in range(-n_taps, n_taps + 1):
                    zz = z0 + dz; yy = y0 + dy; xx = x0 + dx
                    dist = jnp.sqrt(
                        (xi - xx.astype(jnp.float32)) ** 2
                        + (yi - yy.astype(jnp.float32)) ** 2
                        + (zi - zz.astype(jnp.float32)) ** 2 + 1e-12)
                    tf = jnp.clip(dist * samples_per_px, 0.0, T - 1.001)
                    ti = tf.astype(jnp.int32)
                    frac = tf - ti.astype(jnp.float32)
                    w = (jnp.take(blob_profile, ti) * (1 - frac)
                         + jnp.take(blob_profile, ti + 1) * frac)
                    inside = ((zz >= 0) & (zz < size) & (yy >= 0)
                              & (yy < size) & (xx >= 0) & (xx < size)
                              & (dist < n_taps + 1.0))
                    vol = vol.at[jnp.clip(zz, 0, size - 1),
                                 jnp.clip(yy, 0, size - 1),
                                 jnp.clip(xx, 0, size - 1)].add(
                        jnp.where(inside, w * values, 0.0))
    def2 = jnp.mean(jnp.sum(g * g, axis=0))
    return vol, def2


@partial(jax.jit, static_argnames=("size", "steps", "n_taps", "use_ctf",
                                   "phase_flipped", "opt_align",
                                   "opt_deform", "opt_defocus"))
def fit_forward_zernike_subtomos_batch(
        positions, values, Z, subs, rots, tilts, psis, coeffs0,
        lam: float, size: int, steps: int, lr: float = 0.5,
        max_angular: float = 5.0, max_shift: float = 5.0,
        shifts=None, spec_mask=None, vol_mask=None,
        blob_profile=None, n_taps: int = 0,
        use_ctf: bool = False, phase_flipped: bool = False,
        defU=None, defV=None, ctf_consts=(0.0, 0.0, 1.0, 0.0, 1.0),
        opt_align: bool = True, opt_deform: bool = True,
        opt_defocus: bool = False):
    """Per-subtomogram forward fit (forward_zernike_subtomos): the deformed
    cloud is splat as a 3-D volume, missing-wedge/low-pass filtered
    (spec_mask on the rfftn grid — the reference's filterMW with
    --t1/--t2), isotropic-CTF-attenuated (subtomo CTF has no astigmatic
    meaning; (defU+defV)/2 drives a radial CTF), shifted in Fourier, and
    correlated against the subtomo inside vol_mask (the --Rmax sphere).
    dpose per subtomo = (drot,dtilt,dpsi,dx,dy,dz,ddefU,ddefV)."""
    B = subs.shape[0]
    sh0 = (jnp.zeros((B, 3), jnp.float32) if shifts is None
           else jnp.asarray(shifts, jnp.float32))
    dU0 = (jnp.zeros(B, jnp.float32) if defU is None
           else jnp.asarray(defU, jnp.float32))
    dV0 = (jnp.zeros(B, jnp.float32) if defV is None
           else jnp.asarray(defV, jnp.float32))
    lr_a = lr if opt_align else 0.0
    lr_d = 30.0 if (opt_defocus and use_ctf) else 0.0
    lr_pose = jnp.asarray([lr_a] * 6 + [lr_d, lr_d], jnp.float32)
    lr_c = lr if opt_deform else 0.0

    fz = jnp.fft.fftfreq(size).astype(jnp.float32)[:, None, None]
    fy = jnp.fft.fftfreq(size).astype(jnp.float32)[None, :, None]
    fx = jnp.fft.rfftfreq(size).astype(jnp.float32)[None, None, :]

    def project(c3, dp, rot, tilt, psi, sh, dU, dV):
        v, def2 = forward_splat_volume(
            positions, values, Z, c3,
            rot + jnp.clip(dp[0], -max_angular, max_angular),
            tilt + jnp.clip(dp[1], -max_angular, max_angular),
            psi + jnp.clip(dp[2], -max_angular, max_angular), size,
            blob_profile=blob_profile, n_taps=n_taps)
        s = sh + jnp.clip(dp[3:6], -max_shift, max_shift)
        spec = jnp.fft.rfftn(v)
        spec = spec * jnp.exp(-2j * jnp.pi * (fz * s[2] + fy * s[1]
                                              + fx * s[0]))
        if spec_mask is not None:
            spec = spec * spec_mask
        if use_ctf:
            K1, K2, Ksin, Kcos, Ts = ctf_consts
            r2 = fx * fx + fy * fy + fz * fz
            u2 = r2 / (Ts * Ts)
            dmean = (dU + dp[6] + dV + dp[7]) / 2
            arg = -K1 * dmean * u2 + K2 * u2 * u2
            ctf = -(Ksin * jnp.sin(arg) - Kcos * jnp.cos(arg))
            spec = spec * (jnp.abs(ctf) if phase_flipped else ctf)
        return jnp.fft.irfftn(spec, (size, size, size)), def2

    def corr(a, b):
        w = vol_mask if vol_mask is not None else jnp.ones_like(a)
        ws = jnp.maximum(w.sum(), 1e-20)
        am = a - (a * w).sum() / ws
        bm = b - (b * w).sum() / ws
        return (w * am * bm).sum() / jnp.sqrt(
            jnp.maximum((w * am * am).sum() * (w * bm * bm).sum(), 1e-20))

    def loss_one(params, sub, rot, tilt, psi, sh, dU, dV):
        c3, dp = params
        P, def2 = project(c3, dp, rot, tilt, psi, sh, dU, dV)
        return -corr(P, sub) + lam * jnp.sqrt(def2 + 1e-12)

    def fit_one(sub, rot, tilt, psi, c0, sh, dU, dV):
        params = (c0, jnp.zeros(8, jnp.float32))
        m = jax.tree_util.tree_map(jnp.zeros_like, params)
        v = jax.tree_util.tree_map(jnp.zeros_like, params)
        b1, b2, eps = 0.9, 0.999, 1e-8
        lrs = (lr_c, lr_pose)

        def step(carry, t):
            params, m, v = carry
            g = jax.grad(loss_one)(params, sub, rot, tilt, psi, sh, dU, dV)
            m = jax.tree_util.tree_map(lambda a, b: b1 * a + (1 - b1) * b,
                                       m, g)
            v = jax.tree_util.tree_map(
                lambda a, b: b2 * a + (1 - b2) * b * b, v, g)
            tt = t + 1
            params = jax.tree_util.tree_map(
                lambda p, mm, vv, l: p - l * (mm / (1 - b1 ** tt))
                / (jnp.sqrt(vv / (1 - b2 ** tt)) + eps), params, m, v, lrs)
            return (params, m, v), 0.0

        (params, _, _), _ = jax.lax.scan(
            step, (params, m, v), jnp.arange(steps, dtype=jnp.float32))
        c3, dp = params
        P, def2 = project(c3, dp, rot, tilt, psi, sh, dU, dV)
        dp = dp.at[0:3].set(jnp.clip(dp[0:3], -max_angular, max_angular))
        dp = dp.at[3:6].set(jnp.clip(dp[3:6], -max_shift, max_shift))
        return c3, dp, corr(P, sub), jnp.sqrt(def2)

    return jax.vmap(fit_one)(subs, rots, tilts, psis, coeffs0, sh0, dU0,
                             dV0)
