"""ML2D: multi-reference 2-D maximum-likelihood refinement.

Rebuilds the reference ml_align2d (ml2d.h / ml_align2d.cpp:700-926
expectationSingleImage: per-image integration of the Gaussian likelihood
over (class, in-plane rotation, translation) with significant-weight
truncation; maximization re-estimates class averages, fractions, the noise
sigma and the translation prior sigma_offset) and mlf_align2d
(mlf_align2d.h:70: Fourier-space ML with a per-resolution noise model).

TPU design: the exact residual decomposes on the ring-weighted polar
annulus as  ||X - R(psi,t)||^2 = ||X_t||^2 + ||R||^2 - 2 <X_t, R(psi)>,
and rotations are circular shifts per ring, so ALL psi values of the cross
term come from one batched ring-FFT correlation and rotations preserve
||R||. The E-step is therefore a single einsum pipeline producing the
full (image, shift-trial, class, psi) log-posterior — no warps — and the
M-step materializes only the device-selected top-K poses per image (the
reference's significant-weight truncation) as one batched warp + one
class scatter-add. sigma^2 and sigma_offset^2 update from posterior
moments of the SAME energy terms (no extra device work).

MLF2D (fourier_noise_model=True) estimates per-ring noise spectra
sigma_r^2 from the best-pose residual each iteration and weights every
ring by 1/sigma_r^2 in the likelihood — the per-resolution noise model.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.fourier import fourier_shift_2d
from xmipp3_tpu.ops.geo import alignment_to_md_pose, apply_md_geometry
from xmipp3_tpu.ops.match import _trial_shift_grid
from xmipp3_tpu.ops.polar import cartesian_to_polar, ring_ffts


def _dup(k, A):
    """rfft bin multiplicities (interior bins count twice)."""
    d = (2.0 * jnp.ones(k)).at[0].set(1.0)
    if A % 2 == 0:
        d = d.at[-1].set(1.0)
    return d


@partial(jax.jit, static_argnames=("rmin", "rmax"))
def _energy_terms(refs, imgs, trials, ring_w, rmin: int, rmax: int):
    """Raw weighted polar-annulus energy terms.

    Returns cross (B,T,R,A) = <X_t, R(psi)>, e_img (B,T) = ||X_t||^2,
    e_ref (R,) = ||R||^2, all under ring weights w_r = r * ring_w (annulus
    area measure times the optional noise-spectrum weighting)."""
    f_refs = ring_ffts(cartesian_to_polar(refs, rmin, rmax))   # (R,nr,k)
    R, nr, k = f_refs.shape
    A = 2 * (k - 1)
    radii = jnp.arange(rmin, rmin + nr, dtype=jnp.float32)
    w = radii / A * ring_w                     # per-sample area weight
    dup = _dup(k, A)
    e_ref = jnp.einsum("Rrk,r,k->R", jnp.abs(f_refs) ** 2, w, dup) / A

    def one_trial(t):
        shifted = fourier_shift_2d(imgs, t[0], t[1])
        f_im = ring_ffts(cartesian_to_polar(shifted, rmin, rmax))
        e_im = jnp.einsum("brk,r,k->b", jnp.abs(f_im) ** 2, w, dup) / A
        cross = jnp.einsum("brk,Rrk,r->bRk", f_im, jnp.conj(f_refs), w)
        cross = jnp.fft.irfft(cross, n=A, axis=-1)   # (B,R,A), /A folded in
        return e_im, cross

    e_img, cross = jax.lax.map(one_trial, jnp.asarray(trials))
    # e_img (T,B) -> (B,T); cross (T,B,R,A) -> (B,T,R,A)
    return (jnp.transpose(cross, (1, 0, 2, 3)), e_img.T, e_ref)


@partial(jax.jit, static_argnames=("top_k",))
def _e_step(cross, e_img, e_ref, trials, log_alpha, sigma2, sigma_off2,
            d_eff, top_k: int, valid=None):
    """Exact Gaussian E-step over (trial, class, psi).

    Returns posterior top-K (weights + indices) and SUMMED class stats /
    posterior moments (callers divide by the valid count — this makes the
    function shard_map-able with one psum; `valid` (B,) zeroes padded
    rows)."""
    B, T, R, A = cross.shape
    if valid is None:
        valid = jnp.ones((B,), cross.dtype)
    resid2 = (e_img[:, :, None, None] + e_ref[None, None, :, None]
              - 2.0 * cross)                      # (B,T,R,A)
    resid2 = jnp.maximum(resid2, 0.0)
    log_pt = -(trials[:, 0] ** 2 + trials[:, 1] ** 2) / \
        (2.0 * jnp.maximum(sigma_off2, 1e-8))     # (T,)
    loge = (-resid2 / (2.0 * jnp.maximum(sigma2, 1e-12))
            + log_pt[None, :, None, None]
            + log_alpha[None, None, :, None])
    flat = loge.reshape(B, -1)
    m = flat.max(axis=1, keepdims=True)
    p = jnp.exp(flat - m)
    Z = p.sum(axis=1, keepdims=True)
    post = p / Z * valid[:, None]
    # data log-likelihood (with the Gaussian normalization constant)
    ll_sum = ((m[:, 0] + jnp.log(Z[:, 0])
               - 0.5 * d_eff * jnp.log(2 * jnp.pi * sigma2))
              * valid).sum()
    # posterior moments (sums over valid rows)
    post4 = post.reshape(B, T, R, A)
    resid2_sum = jnp.einsum("btra,btra->", post4, resid2)
    t2 = trials[:, 0] ** 2 + trials[:, 1] ** 2
    t2_sum = jnp.einsum("btra,t->", post4, t2)
    frac_sum = post4.sum(axis=(0, 1, 3))
    wk, ik = jax.lax.top_k(post, top_k)
    wk = wk / jnp.maximum(wk.sum(axis=1, keepdims=True), 1e-12)
    wk = wk * valid[:, None]
    return wk, ik, frac_sum, resid2_sum, t2_sum, ll_sum


@partial(jax.jit, static_argnames=("n_refs", "A"))
def _m_step(imgs, wk, ik, trials, n_refs: int, A: int):
    """Batched top-K warp + class scatter (the weighted class averages)."""
    B, K = wk.shape
    T = trials.shape[0]
    t_idx = ik // (n_refs * A)
    r_idx = (ik // A) % n_refs
    a_idx = ik % A
    psi = a_idx.astype(jnp.float32) * (360.0 / A)
    psi = jnp.where(psi > 180.0, psi - 360.0, psi)
    t = trials[t_idx.reshape(-1)]                 # (B*K, 2)
    rad = jnp.deg2rad(psi.reshape(-1))
    c, s = jnp.cos(rad), jnp.sin(rad)
    sx = c * t[:, 0] + s * t[:, 1]
    sy = -s * t[:, 0] + c * t[:, 1]
    psi_md, sx_md, sy_md, _ = alignment_to_md_pose(psi.reshape(-1), sx, sy)
    rep = jnp.repeat(imgs, K, axis=0)             # (B*K, H, W)
    reg = apply_md_geometry(rep, psi_md, sx_md, sy_md)
    wflat = wk.reshape(-1)
    acc = jnp.zeros((n_refs,) + imgs.shape[1:], jnp.float32)
    acc = acc.at[r_idx.reshape(-1)].add(reg * wflat[:, None, None])
    cnt = jnp.zeros((n_refs,), jnp.float32).at[r_idx.reshape(-1)].add(wflat)
    return (acc, cnt, r_idx[:, 0], psi_md.reshape(B, K)[:, 0],
            sx_md.reshape(B, K)[:, 0], sy_md.reshape(B, K)[:, 0])


@partial(jax.jit, static_argnames=("rmin", "rmax"))
def _ring_noise_spectra(refs, imgs, best_ref, psi_md, sx_md, sy_md,
                        rmin: int, rmax: int):
    """Per-ring residual noise spectra at the best pose (MLF2D,
    mlf_align2d.h:70): sigma_r^2 = mean ring power of (X_aligned - R)."""
    reg = apply_md_geometry(imgs, psi_md, sx_md, sy_md)
    resid = reg - refs[best_ref]
    f = ring_ffts(cartesian_to_polar(resid, rmin, rmax))      # (B,nr,k)
    k = f.shape[-1]
    A = 2 * (k - 1)
    dup = _dup(k, A)
    return jnp.einsum("brk,k->r", jnp.abs(f) ** 2, dup) / (A * f.shape[0])


def ml2d(imgs: np.ndarray, n_refs: int, n_iters: int = 15,
         max_shift: int = 4, sigma_init: float | None = None, seed: int = 0,
         top_k: int = 8, verbose: int = 0, fourier_noise_model: bool = False,
         mesh=None):
    """Returns dict(refs, fractions, sigma, assignments, loglike).

    The reported loglike is the TRUE data log-likelihood of the Gaussian
    mixture over (class, psi, trial) in the ring-weighted polar domain
    (monotone under EM up to the top-K M-step truncation)."""
    from xmipp3_tpu.models.cl2d import initial_references
    imgs = np.asarray(imgs, np.float32)
    B, H, W = imgs.shape
    rmin, rmax = 2, H // 2 - 2
    refs = jnp.asarray(initial_references(imgs, n_refs, seed))
    alpha = np.full(n_refs, 1.0 / n_refs)
    trials = jnp.asarray(_trial_shift_grid(max_shift,
                                           step=max(max_shift / 2, 1.0)))
    imgs_j = jnp.asarray(imgs)
    nr = rmax - rmin + 1        # polar_grid rings are inclusive of rmax
    # effective sample count of the weighted annulus (for the LL constant)
    radii = np.arange(rmin, rmax + 1, dtype=np.float64)
    A_ang = None
    ring_w = jnp.ones((nr,), jnp.float32)
    d_eff = float(radii.sum())     # = sum_r w_r*A with w_r = r/A
    sigma2 = None
    sigma_off2 = max((max_shift / 2.0) ** 2, 1.0)
    ll_hist = []
    out_pose = None

    # mesh mode: shard the particle axis; every per-iteration reduction is
    # a psum (the TPU analog of the reference's MPI ML2D,
    # parallel/mpi_ml_align2d); padded rows carry valid=0 and contribute
    # nothing to any statistic.
    n_dev = 0
    if mesh is not None:
        from jax.sharding import PartitionSpec as P
        axis = mesh.axis_names[0]
        n_dev = int(np.prod(mesh.devices.shape))
        pad = (-B) % n_dev
        imgs_p = np.concatenate([imgs, np.zeros((pad, H, W), np.float32)]) \
            if pad else imgs
        valid_p = np.concatenate([np.ones(B, np.float32),
                                  np.zeros(pad, np.float32)])
        imgs_j = jnp.asarray(imgs_p)
        valid_j = jnp.asarray(valid_p)

        def _shard_iter(imgs_l, valid_l, refs, trials, ring_w, log_alpha,
                        sigma2, sigma_off2, d_eff, n_refs_, A_hint):
            cross, e_img, e_ref = _energy_terms(refs, imgs_l, trials,
                                                ring_w, rmin, rmax)
            wk, ik, frac_s, r2_s, t2_s, ll_s = _e_step(
                cross, e_img, e_ref, trials, log_alpha, sigma2,
                sigma_off2, d_eff, top_k, valid=valid_l)
            A = cross.shape[-1]
            acc, cnt, br, bp, bx, by = _m_step(imgs_l, wk, ik, trials,
                                               n_refs_, A)
            stats = jax.tree.map(
                lambda x: jax.lax.psum(x, axis),
                (frac_s, r2_s, t2_s, ll_s, acc, cnt))
            return stats + (br, bp, bx, by)

    for it in range(n_iters):
        if sigma2 is None or A_ang is None:
            cross0, e_img0, _ = _energy_terms(refs, imgs_j[:B], trials,
                                              ring_w, rmin, rmax)
            A_ang = cross0.shape[-1]
            if sigma2 is None:
                sigma2 = float(np.asarray(e_img0).mean() / d_eff) \
                    if sigma_init is None else float(sigma_init ** 2)
        d_eff = float(np.sum(radii * np.asarray(ring_w)))
        log_alpha = jnp.asarray(np.log(np.maximum(alpha, 1e-8)), jnp.float32)
        A = A_ang
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            axis = mesh.axis_names[0]
            sharded = jax.shard_map(
                lambda im, va: _shard_iter(im, va, refs, trials, ring_w,
                                           log_alpha, sigma2, sigma_off2,
                                           d_eff, n_refs, A),
                mesh=mesh, in_specs=(P(axis), P(axis)),
                out_specs=(P(), P(), P(), P(), P(), P(),
                           P(axis), P(axis), P(axis), P(axis)))
            (frac, exp_resid2, exp_t2, ll_sum, acc, cnt,
             best_ref, best_psi_md, best_sx_md, best_sy_md) = sharded(
                imgs_j, valid_j)
            best_ref = best_ref[:B]
            best_psi_md = best_psi_md[:B]
            best_sx_md = best_sx_md[:B]
            best_sy_md = best_sy_md[:B]
        else:
            cross, e_img, e_ref = _energy_terms(refs, imgs_j, trials,
                                                ring_w, rmin, rmax)
            wk, ik, frac, exp_resid2, exp_t2, ll_sum = _e_step(
                cross, e_img, e_ref, trials, log_alpha,
                sigma2, sigma_off2, d_eff, top_k)
            acc, cnt, best_ref, best_psi_md, best_sx_md, best_sy_md = \
                _m_step(imgs_j, wk, ik, trials, n_refs, cross.shape[-1])
        ll = float(ll_sum) / B
        ll_hist.append(ll)
        cnt_n = np.asarray(cnt)
        new_refs = np.array(acc)
        old = np.asarray(refs)
        for r in range(n_refs):
            if cnt_n[r] > 1e-6:
                new_refs[r] /= cnt_n[r]
            else:
                new_refs[r] = old[r]
        refs = jnp.asarray(new_refs)
        alpha = np.maximum(np.asarray(frac) / B, 1e-6)
        alpha /= alpha.sum()
        # ML updates of the noise and offset priors (reference maximization)
        sigma2 = float(exp_resid2) / (B * d_eff)
        sigma_off2 = max(float(exp_t2) / (2.0 * B), 0.01)
        if fourier_noise_model:
            sig_r = np.asarray(_ring_noise_spectra(
                refs, imgs_j[:B], jnp.asarray(best_ref),
                jnp.asarray(best_psi_md), jnp.asarray(best_sx_md),
                jnp.asarray(best_sy_md), rmin, rmax))
            w = 1.0 / np.maximum(sig_r, 1e-8 * sig_r.max())
            ring_w = jnp.asarray((w / w.mean()).astype(np.float32))
        out_pose = (best_ref, best_psi_md, best_sx_md, best_sy_md)
        if verbose:
            print(f"  ML2D iter {it + 1}: LL {ll_hist[-1]:.4f} "
                  f"sigma {np.sqrt(sigma2):.5f} "
                  f"fractions {np.round(alpha, 3)}")
        if it > 1 and abs(ll_hist[-1] - ll_hist[-2]) < \
                1e-6 * abs(ll_hist[-2]):
            break

    best_ref, psi_md, sx_md, sy_md = out_pose
    return dict(refs=np.asarray(refs), fractions=alpha,
                sigma=float(np.sqrt(sigma2)),
                assignments=np.asarray(best_ref),
                psi=np.asarray(psi_md), sx=np.asarray(sx_md),
                sy=np.asarray(sy_md), loglike=ll_hist)
