"""Continuous pose refinement by differentiable projection.

Replaces the reference angular_continuous_assign2 (Powell over pose/defocus/
gray via continuous2cost, angular_continuous_assign2.cpp:522) with a
TPU-first design: the Fourier central-slice projector is differentiable with
respect to the Euler angles, shifts and magnification (trilinear gather of a
fixed complex cube), so ALL particles are refined simultaneously by batched
gradient descent — no per-particle host optimizer loop.

Reference option surface carried here (angular_continuous_assign2.cpp:120-142):
per-parameter trust regions (--max_shift/--max_scale/--max_angular_change/
--max_defocus_change/--max_gray_scale/--max_gray_shift) become projected-
gradient clips after every Adam step; --Rmax is a real-space evaluation mask;
--max_resolution/--sampling set the band limit; --sameDefocus ties the two
defocus deltas; --optimize* gate the per-parameter learning rates.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.project import (extract_central_slices,
                                    prepare_fourier_volume,
                                    slices_to_projections)


def _euler_jnp(rot, tilt, psi):
    """ZYZ Euler -> matrices, fully traced (degrees)."""
    rot = jnp.deg2rad(rot)
    tilt = jnp.deg2rad(tilt)
    psi = jnp.deg2rad(psi)
    c1, s1 = jnp.cos(rot), jnp.sin(rot)
    c2, s2 = jnp.cos(tilt), jnp.sin(tilt)
    c3, s3 = jnp.cos(psi), jnp.sin(psi)
    row0 = jnp.stack([c3 * c2 * c1 - s3 * s1, c3 * c2 * s1 + s3 * c1,
                      -c3 * s2], axis=-1)
    row1 = jnp.stack([-s3 * c2 * c1 - c3 * s1, -s3 * c2 * s1 + c3 * c1,
                      s3 * s2], axis=-1)
    row2 = jnp.stack([s2 * c1, s2 * s1, c2], axis=-1)
    return jnp.stack([row0, row1, row2], axis=-2)


@partial(jax.jit, static_argnames=("N",))
def _project_posed(vf, rot, tilt, psi, sx, sy, N: int, scale=None):
    mats = _euler_jnp(rot, tilt, psi)
    if scale is not None:
        # magnification: sample the central slice at scaled frequencies
        # (image scale m <-> frequency scale 1/m); differentiable
        mats = mats * scale[:, None, None]
    slices = extract_central_slices(vf, mats, N)
    from xmipp3_tpu.ops.fourier import shift_spec_2d
    return slices_to_projections(shift_spec_2d(slices, sx, sy, N, N), N)


@partial(jax.jit, static_argnames=("N", "max_freq"))
def _ncc_loss(params, vf, imgs, N: int, max_freq: float = 0.35):
    """Band-limited frequency-weighted NCC: |f|-weighting boosts the
    high-frequency terms that constrain the pose (plain NCC is dominated by
    low frequencies and plateaus), but only up to max_freq — beyond that the
    data is noise-dominated and would corrupt the refinement."""
    rot, tilt, psi, sx, sy = params
    proj = _project_posed(vf, rot, tilt, psi, sx, sy, N)
    fy = jnp.fft.fftfreq(N).astype(jnp.float32)[:, None]
    fx = jnp.fft.rfftfreq(N).astype(jnp.float32)[None, :]
    r = jnp.sqrt(fx * fx + fy * fy)
    w = jnp.where(r <= max_freq, r, 0.0)
    P = jnp.fft.rfft2(proj) * w[None]
    I = jnp.fft.rfft2(imgs) * w[None]
    num = jnp.real(P * jnp.conj(I)).sum(axis=(-2, -1))
    den = jnp.sqrt((jnp.abs(P) ** 2).sum(axis=(-2, -1)) *
                   (jnp.abs(I) ** 2).sum(axis=(-2, -1)))
    ncc = num / jnp.maximum(den, 1e-12)
    return -ncc.mean(), ncc


_loss_grad = jax.jit(jax.value_and_grad(_ncc_loss, has_aux=True),
                     static_argnames=("N", "max_freq"))


def _dwt2_levels(x, levels: int):
    """Batched 2-D Haar DWT coefficient pyramid: returns list of
    (ll_final, [(lh, hl, hh) per level])-style flat coefficient arrays."""
    from xmipp3_tpu.ops.denoise import _haar_dwt2
    coeffs = []
    cur = x
    for _ in range(levels):
        ll, (lh, hl, hh) = _haar_dwt2(cur)
        coeffs.extend([lh, hl, hh])
        cur = ll
    coeffs.append(cur)
    return coeffs


@partial(jax.jit, static_argnames=("N", "levels"))
def _wavelet_loss(params, vf, imgs, N: int, levels: int = 2,
                  spec_w=None, real_w=None):
    """Wavelet-space continuous assignment objective (reference
    angular_continuous_assign.h:39 — the original algorithm matches image
    and projection in DWT space, weighting scales; here: NCC over the
    multi-level Haar coefficient pyramid with the finest detail band
    down-weighted, which is what makes the wavelet variant robust to
    high-frequency noise). spec_w/real_w are the reference's
    --gaussian_Fourier / --gaussian_Real / --zerofreq_weight weighting
    masks, applied identically to projection and image (a weighted
    matching metric)."""
    rot, tilt, psi, sx, sy = params
    proj = _project_posed(vf, rot, tilt, psi, sx, sy, N)
    if spec_w is not None:
        proj = jnp.fft.irfft2(jnp.fft.rfft2(proj) * spec_w, (N, N))
        imgs = jnp.fft.irfft2(jnp.fft.rfft2(imgs) * spec_w, (N, N))
    if real_w is not None:
        proj = proj * real_w
        imgs = imgs * real_w
    cp = _dwt2_levels(proj, levels)
    ci = _dwt2_levels(imgs, levels)
    # weights: finest-level details (first 3 arrays) get 0.25; all other
    # bands weight 1 (multiscale emphasis on stable coefficients)
    num = 0.0
    pp = 0.0
    ii = 0.0
    for k, (a, b) in enumerate(zip(cp, ci)):
        w = 0.25 if k < 3 else 1.0
        num = num + w * (a * b).sum(axis=(-2, -1))
        pp = pp + w * (a * a).sum(axis=(-2, -1))
        ii = ii + w * (b * b).sum(axis=(-2, -1))
    ncc = num / jnp.maximum(jnp.sqrt(pp * ii), 1e-12)
    return -ncc.mean(), ncc


_wavelet_loss_grad = jax.jit(jax.value_and_grad(_wavelet_loss, has_aux=True),
                             static_argnames=("N", "levels"))


def _ctf_rfft(r, fx, fy, defU, defV, ang, ctf_consts, phase_flipped: bool):
    """Astigmatic CTF on the rfft grid from per-particle defocus."""
    K1, K2, Ksin, Kcos, Ts = ctf_consts
    u2 = (r / Ts) ** 2
    safe = jnp.maximum(fx * fx + fy * fy, 1e-30)
    c2t = (fx * fx - fy * fy) / safe
    s2t = 2 * fx * fy / safe
    az = jnp.deg2rad(ang)[:, None, None]
    cos2 = c2t[None] * jnp.cos(2 * az) + s2t[None] * jnp.sin(2 * az)
    dU = defU[:, None, None]
    dV = defV[:, None, None]
    deltaf = -(dU + dV) / 2 + (-(dU - dV) / 2) * cos2
    arg = K1 * deltaf * u2[None] + K2 * (u2 ** 2)[None]
    ctf = -(Ksin * jnp.sin(arg) - Kcos * jnp.cos(arg))
    if phase_flipped:
        ctf = jnp.abs(ctf)
    return ctf


@partial(jax.jit, static_argnames=("N", "max_freq", "use_ctf",
                                   "phase_flipped", "same_defocus"))
def _model_full(params, vf, ctf_pp, ctf_consts, N: int,
                max_freq: float, use_ctf: bool, phase_flipped: bool,
                same_defocus: bool):
    """Forward model a·CTF(P(pose, scale)) band-limited to max_freq, in
    real space (the gray shift b is added by the caller)."""
    rot, tilt, psi, sx, sy, scale, a, b, ddefU, ddefV = params
    proj = _project_posed(vf, rot, tilt, psi, sx, sy, N, scale=scale)
    fy = jnp.fft.fftfreq(N).astype(jnp.float32)[:, None]
    fx = jnp.fft.rfftfreq(N).astype(jnp.float32)[None, :]
    r = jnp.sqrt(fx * fx + fy * fy)
    w = jnp.where(r <= max_freq, 1.0, 0.0)
    P = jnp.fft.rfft2(proj) * w[None]
    if use_ctf:
        defU0, defV0, ang = ctf_pp
        if same_defocus:
            ddefV = ddefU
        P = P * _ctf_rfft(r, fx, fy, defU0 + ddefU, defV0 + ddefV, ang,
                          ctf_consts, phase_flipped)
    Pr = jnp.fft.irfft2(P, s=(N, N))
    return a[:, None, None] * Pr + b[:, None, None]


@partial(jax.jit, static_argnames=("N", "max_freq", "use_ctf",
                                   "phase_flipped", "same_defocus"))
def _l2_loss_full(params, vf, imgs_f, mask, ctf_pp, ctf_consts, N: int,
                  max_freq: float = 0.35, use_ctf: bool = False,
                  phase_flipped: bool = False, same_defocus: bool = False):
    """Masked, band-limited L2 with gray transform, magnification and
    per-particle CTF (reference continuous2cost: the full objective,
    angular_continuous_assign2.cpp:522 — pose + scale + gray a,b +
    defocus, evaluated inside the --Rmax mask).

    params = (rot, tilt, psi, sx, sy, scale, a, b, ddefU, ddefV);
    imgs_f = images pre-filtered to max_freq (fixed, so filtered once
    outside the optimization scan); mask = (N,N) real-space evaluation
    mask. NCC is gray-invariant, so the gray/defocus variant must use the
    L2 residual (like the reference)."""
    model = _model_full(params, vf, ctf_pp, ctf_consts, N, max_freq,
                        use_ctf, phase_flipped, same_defocus)
    resid = (model - imgs_f) * mask[None]
    norm = ((imgs_f * mask[None]) ** 2).sum(axis=(-2, -1))
    cost = (resid ** 2).sum(axis=(-2, -1)) / jnp.maximum(norm, 1e-12)
    return cost.mean(), -cost


_l2_loss_grad = jax.jit(jax.value_and_grad(_l2_loss_full, has_aux=True),
                        static_argnames=("N", "max_freq", "use_ctf",
                                        "phase_flipped", "same_defocus"))


def _adam_step(params, m, v, grads, lrs, t, lo=None, hi=None):
    """One per-particle Adam update on stacked (K, B) parameters, with
    optional trust-region projection (the reference max_* bounds)."""
    b1, b2, eps = 0.9, 0.999, 1e-8
    g = jnp.stack(grads) * params.shape[1]     # mean -> per-particle grad
    m = b1 * m + (1 - b1) * g
    v = b2 * v + (1 - b2) * g * g
    mh = m / (1 - jnp.power(b1, t))
    vh = v / (1 - jnp.power(b2, t))
    params = params - lrs[:, None] * mh / (jnp.sqrt(vh) + eps)
    if lo is not None:
        params = jnp.clip(params, lo, hi)
    return params, m, v


@partial(jax.jit, static_argnames=("N", "max_freq", "n_steps", "domain"))
def _adam_scan_pose(p0, vf, imgs, lrs, N: int, max_freq: float,
                    n_steps: int, domain: str, lo=None, hi=None,
                    spec_w=None, real_w=None):
    """Whole pose refinement (Adam over rot/tilt/psi/sx/sy) as one scan."""
    def step_fn(carry, t):
        params, m, v = carry
        if domain == "wavelet":
            (_, ncc), grads = jax.value_and_grad(
                _wavelet_loss, has_aux=True)(tuple(params), vf, imgs, N,
                                             2, spec_w, real_w)
        else:
            (_, ncc), grads = jax.value_and_grad(
                _ncc_loss, has_aux=True)(tuple(params), vf, imgs, N,
                                         max_freq)
        params, m, v = _adam_step(params, m, v, grads, lrs, t, lo, hi)
        return (params, m, v), ncc

    z = jnp.zeros_like(p0)
    ts = jnp.arange(1, n_steps + 1, dtype=jnp.float32)
    (p, _, _), nccs = jax.lax.scan(step_fn, (p0, z, z), ts)
    return p, nccs[-1]


@partial(jax.jit, static_argnames=("N", "max_freq", "use_ctf",
                                   "phase_flipped", "same_defocus",
                                   "n_steps"))
def _adam_scan_full(p0, vf, imgs_f, mask, defs, ctf_consts, lrs, lo, hi,
                    N: int, max_freq: float, use_ctf: bool,
                    phase_flipped: bool, same_defocus: bool, n_steps: int):
    """Full refinement (pose + scale + gray + defocus deltas) as one scan,
    projected onto the per-parameter trust region after every step."""
    def step_fn(carry, t):
        params, m, v = carry
        (_, cost), grads = jax.value_and_grad(
            _l2_loss_full, has_aux=True)(tuple(params), vf, imgs_f, mask,
                                         defs, ctf_consts, N, max_freq,
                                         use_ctf, phase_flipped,
                                         same_defocus)
        params, m, v = _adam_step(params, m, v, grads, lrs, t, lo, hi)
        return (params, m, v), cost

    z = jnp.zeros_like(p0)
    ts = jnp.arange(1, n_steps + 1, dtype=jnp.float32)
    (p, _, _), costs = jax.lax.scan(step_fn, (p0, z, z), ts)
    return p, costs[-1]


def _radial_mask(N: int, Rmax: float | None):
    if Rmax is None or Rmax <= 0:
        return jnp.ones((N, N), jnp.float32)
    yy, xx = np.mgrid[:N, :N]
    r = np.hypot(yy - N // 2, xx - N // 2)
    return jnp.asarray((r <= Rmax).astype(np.float32))


def continuous_assign_full(vol, imgs, rot0, tilt0, psi0, sx0=None, sy0=None,
                           defU0=None, defV0=None, def_ang=None,
                           voltage=300.0, Cs=2.7, Q0=0.07, Ts=1.0,
                           optimize_gray=False, optimize_defocus=False,
                           optimize_angles=True, optimize_shift=True,
                           optimize_scale=False, phase_flipped=False,
                           same_defocus=False, n_steps: int = 80,
                           pad_factor: float = 2.0, max_freq: float = 0.35,
                           Rmax: float | None = None,
                           max_angular_change: float | None = None,
                           max_shift: float | None = None,
                           max_scale: float | None = None,
                           max_defocus_change: float | None = None,
                           max_gray_scale: float | None = None,
                           max_gray_shift: float | None = None,
                           compute_outputs: bool = False,
                           verbose: int = 0):
    """Full continuous refinement: pose + optional scale, gray (a, b) and
    per-particle defocus (reference angular_continuous_assign2
    --optimize* family), with the reference's per-parameter trust regions
    and --Rmax evaluation mask. Returns dict with refined pose, scale,
    gray a/b, defocusU/V and the per-particle cost (negated residual
    ratio); with compute_outputs=True adds the final model projections and
    residuals (--oprojections / --oresiduals)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    B, N, _ = imgs.shape
    vf, _pad = prepare_fourier_volume(jnp.asarray(vol, jnp.float32),
                                      pad_factor)
    z = jnp.zeros(B, jnp.float32)
    use_ctf = defU0 is not None
    defU0 = z if defU0 is None else jnp.asarray(np.asarray(defU0,
                                                           np.float32))
    defV0 = defU0 if defV0 is None else jnp.asarray(np.asarray(defV0,
                                                               np.float32))
    def_ang = z if def_ang is None else jnp.asarray(np.asarray(def_ang,
                                                               np.float32))
    lam = 12.2643247 / np.sqrt(voltage * 1e3
                               * (1 + 0.978466e-6 * voltage * 1e3))
    ctf_consts = (float(np.pi * lam), float(np.pi / 2 * Cs * 1e7 * lam ** 3),
                  float(np.sqrt(max(1 - Q0 ** 2, 0.0))), float(Q0),
                  float(Ts))
    p_init = [np.asarray(rot0, np.float32),
              np.asarray(tilt0, np.float32),
              np.asarray(psi0, np.float32),
              np.zeros(B, np.float32) if sx0 is None
              else -np.asarray(sx0, np.float32),
              np.zeros(B, np.float32) if sy0 is None
              else -np.asarray(sy0, np.float32),
              np.ones(B, np.float32),                # scale
              np.ones(B, np.float32),                # gray a
              np.zeros(B, np.float32),               # gray b
              np.zeros(B, np.float32),               # ddefU
              np.zeros(B, np.float32)]               # ddefV
    p0 = jnp.asarray(np.stack(p_init))
    lr_ang = 0.5 if optimize_angles else 0.0
    lr_sh = 0.2 if optimize_shift else 0.0
    lrs = jnp.asarray(
        [lr_ang, lr_ang, lr_ang, lr_sh, lr_sh,
         0.002 if optimize_scale else 0.0,
         0.02 if optimize_gray else 0.0,
         0.02 if optimize_gray else 0.0,
         (30.0 if optimize_defocus and use_ctf else 0.0),
         (30.0 if optimize_defocus and use_ctf else 0.0)], jnp.float32)
    # trust region (reference max_* bounds): clip around the init values
    BIG = 1e30
    img_std = np.asarray(imgs.std(axis=(1, 2)))
    lo = np.full((10, B), -BIG, np.float32)
    hi = np.full((10, B), BIG, np.float32)
    if max_angular_change is not None and max_angular_change >= 0:
        for k in range(3):
            lo[k] = p_init[k] - max_angular_change
            hi[k] = p_init[k] + max_angular_change
    if max_shift is not None and max_shift >= 0:
        for k in (3, 4):
            lo[k], hi[k] = -max_shift, max_shift
    if max_scale is not None and max_scale >= 0:
        lo[5], hi[5] = 1.0 - max_scale, 1.0 + max_scale
    if max_gray_scale is not None and max_gray_scale >= 0:
        lo[6], hi[6] = 1.0 - max_gray_scale, 1.0 + max_gray_scale
    if max_gray_shift is not None and max_gray_shift >= 0:
        lo[7] = -max_gray_shift * img_std
        hi[7] = max_gray_shift * img_std
    if max_defocus_change is not None and max_defocus_change >= 0:
        for k in (8, 9):
            lo[k], hi[k] = -max_defocus_change, max_defocus_change
    mask = _radial_mask(N, Rmax)
    fy = jnp.fft.fftfreq(N).astype(jnp.float32)[:, None]
    fx = jnp.fft.rfftfreq(N).astype(jnp.float32)[None, :]
    w = jnp.where(jnp.sqrt(fx * fx + fy * fy) <= max_freq, 1.0, 0.0)
    imgs_f = jnp.fft.irfft2(jnp.fft.rfft2(imgs) * w[None], s=(N, N))
    p, cost = _adam_scan_full(p0, vf, imgs_f, mask,
                              (defU0, defV0, def_ang), ctf_consts, lrs,
                              jnp.asarray(lo), jnp.asarray(hi),
                              N, float(max_freq), use_ctf,
                              bool(phase_flipped), bool(same_defocus),
                              int(n_steps))
    if verbose:
        print(f"  continuous-full refine ({n_steps} steps): mean cost "
              f"{float(-np.asarray(cost).mean()):.5f}")
    rot, tilt, psi, sx, sy, sc, a, bb, ddU, ddV = (np.asarray(q) for q in p)
    if same_defocus:
        ddV = ddU
    out = dict(rot=rot, tilt=tilt, psi=psi, sx=-sx, sy=-sy, scale=sc,
               grayA=a, grayB=bb, defocusU=np.asarray(defU0) + ddU,
               defocusV=np.asarray(defV0) + ddV, cost=np.asarray(cost))
    if compute_outputs:
        model = _model_full(tuple(p), vf, (defU0, defV0, def_ang),
                            ctf_consts, N, float(max_freq), use_ctf,
                            bool(phase_flipped), bool(same_defocus))
        out["projections"] = np.asarray(model)
        out["residuals"] = np.asarray((jnp.asarray(imgs_f) - model)
                                      * mask[None])
    return out


def continuous_assign(vol, imgs, rot0, tilt0, psi0, sx0=None, sy0=None,
                      n_steps: int = 60, lr_angles: float = 0.5,
                      lr_shifts: float = 0.2, pad_factor: float = 2.0,
                      max_freq: float = 0.35, verbose: int = 0,
                      domain: str = "fourier",
                      max_angular_change: float | None = None,
                      max_shift: float | None = None,
                      gaussian_fourier: float | None = None,
                      gaussian_real: float | None = None,
                      zerofreq_weight: float | None = None):
    """Refine poses continuously. Returns dict(rot, tilt, psi, sx, sy, cost).

    sx0/sy0 and the returned sx/sy follow the METADATA shift convention
    (shift(img, s) = proj(pose)); internally the projector applies -s.
    Optimization: per-particle Adam on band-limited frequency-weighted NCC,
    batched over the whole particle set."""
    imgs = jnp.asarray(imgs, jnp.float32)
    B, N, _ = imgs.shape
    vf, _pad = prepare_fourier_volume(jnp.asarray(vol, jnp.float32),
                                      pad_factor)
    p_init = [np.asarray(rot0, np.float32),
              np.asarray(tilt0, np.float32),
              np.asarray(psi0, np.float32),
              np.zeros(B, np.float32) if sx0 is None
              else -np.asarray(sx0, np.float32),
              np.zeros(B, np.float32) if sy0 is None
              else -np.asarray(sy0, np.float32)]
    lrs = jnp.asarray([lr_angles, lr_angles, lr_angles, lr_shifts,
                       lr_shifts], jnp.float32)
    BIG = 1e30
    lo = np.full((5, B), -BIG, np.float32)
    hi = np.full((5, B), BIG, np.float32)
    if max_angular_change is not None and max_angular_change >= 0:
        for k in range(3):
            lo[k] = p_init[k] - max_angular_change
            hi[k] = p_init[k] + max_angular_change
    if max_shift is not None and max_shift >= 0:
        lo[3] = lo[4] = -max_shift
        hi[3] = hi[4] = max_shift
    # weighting masks of the ORIGINAL continuous assign (reference
    # angular_continuous_assign.cpp:104-112: Gaussian weights in Fourier
    # and real space + a zero-frequency weight)
    spec_w = real_w = None
    if gaussian_fourier is not None or zerofreq_weight is not None:
        fy = np.fft.fftfreq(N)[:, None]
        fx = np.fft.rfftfreq(N)[None, :]
        f2 = fy * fy + fx * fx
        sF = gaussian_fourier if gaussian_fourier is not None else 0.5
        w = np.exp(-f2 / (2 * sF * sF))
        if zerofreq_weight is not None:
            w[0, 0] = zerofreq_weight
        spec_w = jnp.asarray(w.astype(np.float32))
    if gaussian_real is not None:
        yy, xx = np.mgrid[0:N, 0:N].astype(np.float32) - N // 2
        sR = gaussian_real * N
        real_w = jnp.asarray(np.exp(-(yy * yy + xx * xx)
                                    / (2 * sR * sR)).astype(np.float32))
    # the whole Adam refinement is ONE lax.scan dispatch (a host step
    # loop pays dozens of link round-trips per step for the eager
    # moment updates)
    p, ncc = _adam_scan_pose(jnp.asarray(np.stack(p_init)), vf, imgs, lrs,
                             N, float(max_freq), int(n_steps), domain,
                             jnp.asarray(lo), jnp.asarray(hi),
                             spec_w, real_w)
    if verbose:
        print(f"  continuous refine ({n_steps} steps): mean wNCC "
              f"{float(np.asarray(ncc).mean()):.4f}")
    rot, tilt, psi, sx, sy = (np.asarray(q) for q in p)
    return dict(rot=rot, tilt=tilt, psi=psi, sx=-sx, sy=-sy,
                cost=np.asarray(ncc))
