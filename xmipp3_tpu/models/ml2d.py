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

Reference option surface implemented here (ml2d.cpp:226-302):
- --mirror: the class axis is doubled with x-mirrored references
  (metadata flip column set; M-step registers through the stored
  M_x^f pose so mirrored picks accumulate into the base class).
- --psi_step / --search_rot: a static log-mask over the psi axis.
- --student <df>: multivariate-t likelihood; sigma^2 re-estimated with
  the t-EM u-weights u = (df+d)/(df + r^2/sigma^2).
- -C: significance truncation of the posterior (ml_align2d.cpp fast
  significance criterion) on top of the top-K M-step truncation.
- --iem <blocks>: incremental EM with per-block cached sufficient
  statistics (serial path).
- --norm: per-particle gray (a, b) refinement at the best pose.
- --ref / --frac / --noise / --offset / --eps / --fix_* / --random_seed:
  initialization and update-freezing controls.

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
from xmipp3_tpu.ops.geo import (alignment_to_md_pose, apply_md_geometry,
                                centered_flip)
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


@partial(jax.jit, static_argnames=("top_k", "student_df"))
def _e_step(cross, e_img, e_ref, trials, log_alpha, sigma2, sigma_off2,
            d_eff, top_k: int, valid=None, log_psi_mask=None, c_sig=0.0,
            student_df: float | None = None):
    """Exact E-step over (trial, class, psi); Gaussian or student-t.

    Returns posterior top-K (weights + indices) and SUMMED class stats /
    posterior moments (callers divide by the valid count — this makes the
    function shard_map-able with one psum; `valid` (B,) zeroes padded
    rows). `log_psi_mask` (A,) restricts the in-plane search (--psi_step /
    --search_rot); `c_sig` zeroes posterior cells below c_sig * per-image
    max (the reference -C significance criterion); resid2_sum carries the
    t-EM u-weights when student_df is set."""
    B, T, R, A = cross.shape
    if valid is None:
        valid = jnp.ones((B,), cross.dtype)
    resid2 = (e_img[:, :, None, None] + e_ref[None, None, :, None]
              - 2.0 * cross)                      # (B,T,R,A)
    resid2 = jnp.maximum(resid2, 0.0)
    log_pt = -(trials[:, 0] ** 2 + trials[:, 1] ** 2) / \
        (2.0 * jnp.maximum(sigma_off2, 1e-8))     # (T,)
    s2 = jnp.maximum(sigma2, 1e-12)
    if student_df is None:
        loge_data = -resid2 / (2.0 * s2)
        log_const = -0.5 * d_eff * jnp.log(2 * jnp.pi * s2)
        u = jnp.ones_like(resid2)
    else:
        df = float(student_df)
        loge_data = -0.5 * (df + d_eff) * jnp.log1p(resid2 / (df * s2))
        log_const = (jax.scipy.special.gammaln(0.5 * (df + d_eff))
                     - jax.scipy.special.gammaln(0.5 * df)
                     - 0.5 * d_eff * jnp.log(df * jnp.pi * s2))
        u = (df + d_eff) / (df + resid2 / s2)
    loge = (loge_data + log_pt[None, :, None, None]
            + log_alpha[None, None, :, None])
    if log_psi_mask is not None:
        loge = loge + log_psi_mask[None, None, None, :]
    flat = loge.reshape(B, -1)
    m = flat.max(axis=1, keepdims=True)
    p = jnp.exp(flat - m)
    # significance truncation (-C): drop cells below c_sig * per-image max
    # (p's max is exactly 1 by construction)
    p = jnp.where(p >= c_sig, p, 0.0)
    Z = p.sum(axis=1, keepdims=True)
    post = p / Z * valid[:, None]
    # data log-likelihood (with the model normalization constant)
    ll_sum = ((m[:, 0] + jnp.log(Z[:, 0]) + log_const) * valid).sum()
    # posterior moments (sums over valid rows)
    post4 = post.reshape(B, T, R, A)
    resid2_sum = jnp.einsum("btra,btra->", post4, u * resid2)
    t2 = trials[:, 0] ** 2 + trials[:, 1] ** 2
    t2_sum = jnp.einsum("btra,t->", post4, t2)
    frac_sum = post4.sum(axis=(0, 1, 3))
    wk, ik = jax.lax.top_k(post, top_k)
    wk = wk / jnp.maximum(wk.sum(axis=1, keepdims=True), 1e-12)
    wk = wk * valid[:, None]
    return wk, ik, frac_sum, resid2_sum, t2_sum, ll_sum


@partial(jax.jit, static_argnames=("n_refs", "A", "mirror"))
def _m_step(imgs, wk, ik, trials, n_refs: int, A: int, mirror: bool = False):
    """Batched top-K warp + class scatter (the weighted class averages).

    With mirror=True the class axis is 2*n_refs wide: classes >= n_refs
    matched the x-mirrored reference, so the stored pose carries flip=1
    (registration matrix M_x·R(-psi)·T(s) — see
    ops.geo.metadata_alignment_matrices) and the registered image lands
    in the BASE class accumulator."""
    B, K = wk.shape
    n_cls = 2 * n_refs if mirror else n_refs
    t_idx = ik // (n_cls * A)
    c_idx = (ik // A) % n_cls
    a_idx = ik % A
    r_idx = c_idx % n_refs
    flip = c_idx >= n_refs
    psi = a_idx.astype(jnp.float32) * (360.0 / A)
    psi = jnp.where(psi > 180.0, psi - 360.0, psi)
    t = trials[t_idx.reshape(-1)]                 # (B*K, 2)
    rad = jnp.deg2rad(psi.reshape(-1))
    c, s = jnp.cos(rad), jnp.sin(rad)
    sx = c * t[:, 0] + s * t[:, 1]
    sy = -s * t[:, 0] + c * t[:, 1]
    psi_md, sx_md, sy_md, _ = alignment_to_md_pose(psi.reshape(-1), sx, sy)
    rep = jnp.repeat(imgs, K, axis=0)             # (B*K, H, W)
    fl = flip.reshape(-1)
    reg = apply_md_geometry(rep, psi_md, sx_md, sy_md,
                            fl if mirror else None)
    wflat = wk.reshape(-1)
    acc = jnp.zeros((n_refs,) + imgs.shape[1:], jnp.float32)
    acc = acc.at[r_idx.reshape(-1)].add(reg * wflat[:, None, None])
    cnt = jnp.zeros((n_refs,), jnp.float32).at[r_idx.reshape(-1)].add(wflat)
    return (acc, cnt, r_idx[:, 0], psi_md.reshape(B, K)[:, 0],
            sx_md.reshape(B, K)[:, 0], sy_md.reshape(B, K)[:, 0],
            flip[:, 0])


@partial(jax.jit, static_argnames=("rmin", "rmax"))
def _ring_noise_spectra(refs, imgs, best_ref, psi_md, sx_md, sy_md, flip,
                        rmin: int, rmax: int):
    """Per-ring residual noise spectra at the best pose (MLF2D,
    mlf_align2d.h:70): sigma_r^2 = mean ring power of (X_aligned - R)."""
    reg = apply_md_geometry(imgs, psi_md, sx_md, sy_md, flip)
    resid = reg - refs[best_ref]
    f = ring_ffts(cartesian_to_polar(resid, rmin, rmax))      # (B,nr,k)
    k = f.shape[-1]
    A = 2 * (k - 1)
    dup = _dup(k, A)
    return jnp.einsum("brk,k->r", jnp.abs(f) ** 2, dup) / (A * f.shape[0])


@jax.jit
def _fit_gray(imgs, refs, best_ref, psi_md, sx_md, sy_md, flip):
    """Per-particle (a, b) gray fit at the best pose (--norm,
    ml_align2d.cpp refinement of per-image normalization): least squares
    of registered raw image against its class average."""
    reg = apply_md_geometry(imgs, psi_md, sx_md, sy_md, flip)
    ref = refs[best_ref]
    my = reg.mean(axis=(1, 2))
    mr = ref.mean(axis=(1, 2))
    cov = ((reg - my[:, None, None]) * (ref - mr[:, None, None])
           ).mean(axis=(1, 2))
    var = ((ref - mr[:, None, None]) ** 2).mean(axis=(1, 2))
    a = jnp.clip(cov / jnp.maximum(var, 1e-12), 0.1, 10.0)
    b = my - a * mr
    return a, b


def _psi_log_mask(A: int, psi_step: float | None, search_rot: float | None):
    """Static (A,) log-mask over sampled psi angles: keep every
    round(psi_step/(360/A))-th angle and |psi| <= search_rot."""
    if psi_step is None and (search_rot is None or search_rot >= 180.0):
        return None
    keep = np.ones(A, bool)
    if psi_step is not None:
        stride = max(int(round(psi_step / (360.0 / A))), 1)
        keep &= (np.arange(A) % stride) == 0
    if search_rot is not None and search_rot < 180.0:
        psi = np.arange(A) * (360.0 / A)
        psi = np.where(psi > 180.0, psi - 360.0, psi)
        keep &= np.abs(psi) <= search_rot + 1e-6
    if not keep.any():
        keep[0] = True
    return jnp.asarray(np.where(keep, 0.0, -np.inf).astype(np.float32))


def ml2d(imgs: np.ndarray, n_refs: int, n_iters: int = 15,
         max_shift: int = 4, sigma_init: float | None = None, seed: int = 0,
         top_k: int = 8, verbose: int = 0, fourier_noise_model: bool = False,
         mesh=None, refs_init: np.ndarray | None = None,
         mirror: bool = False, psi_step: float | None = None,
         search_rot: float | None = None, eps: float = 5e-5,
         offset_sigma: float | None = None,
         fractions_init: np.ndarray | None = None,
         fix_sigma_noise: bool = False, fix_sigma_offset: bool = False,
         fix_fractions: bool = False, student_df: float | None = None,
         norm: bool = False, c_significance: float = 0.0,
         iem_blocks: int = 1, kstest: bool = False):
    """Returns dict(refs, fractions, sigma, assignments, loglike, ...).

    The reported loglike is the TRUE data log-likelihood of the mixture
    over (class, psi, trial) in the ring-weighted polar domain
    (monotone under EM up to the top-K M-step truncation)."""
    from xmipp3_tpu.models.cl2d import initial_references
    imgs = np.asarray(imgs, np.float32)
    B, H, W = imgs.shape
    rmin, rmax = 2, H // 2 - 2
    if refs_init is not None:
        refs_np = np.asarray(refs_init, np.float32)
        if refs_np.ndim == 2:
            refs_np = refs_np[None]
        n_refs = len(refs_np)
        refs = jnp.asarray(refs_np)
    else:
        refs = jnp.asarray(initial_references(imgs, n_refs, seed))
    if fractions_init is not None:
        alpha = np.asarray(fractions_init, np.float64)
        alpha = np.maximum(alpha, 1e-8)
        alpha = alpha / alpha.sum()
        if len(alpha) != n_refs:
            raise ValueError(
                f"--frac has {len(alpha)} fractions for {n_refs} refs")
    else:
        alpha = np.full(n_refs, 1.0 / n_refs)
    trials = jnp.asarray(_trial_shift_grid(max_shift,
                                           step=max(max_shift / 2, 1.0)))
    imgs_j = jnp.asarray(imgs)
    nr = rmax - rmin + 1        # polar_grid rings are inclusive of rmax
    # effective sample count of the weighted annulus (for the LL constant)
    radii = np.arange(rmin, rmax + 1, dtype=np.float64)
    A_ang = None
    psi_mask = None
    ring_w = jnp.ones((nr,), jnp.float32)
    d_eff = float(radii.sum())     # = sum_r w_r*A with w_r = r/A
    sigma2 = None
    sigma_off2 = float(offset_sigma) ** 2 if offset_sigma is not None \
        else max((max_shift / 2.0) ** 2, 1.0)
    ll_hist = []
    ks_hist = []
    out_pose = None
    gray_a = np.ones(B, np.float32)
    gray_b = np.zeros(B, np.float32)
    if iem_blocks > 1 and mesh is not None:
        raise ValueError("--iem blocks and --mesh are mutually exclusive "
                         "(the mesh already shards the particle axis)")
    n_blocks = max(int(iem_blocks), 1)
    block_slices = [s for s in
                    np.array_split(np.arange(B), n_blocks) if len(s)]
    n_blocks = len(block_slices)
    block_stats = [None] * n_blocks

    def _class_log_alpha():
        """log-prior per E-step class cell (mirror halves the mass)."""
        la = np.log(np.maximum(alpha, 1e-8))
        if mirror:
            la = np.concatenate([la, la]) - np.log(2.0)
        return jnp.asarray(la, jnp.float32)

    def _aug_refs(r):
        return jnp.concatenate([r, centered_flip(r, axis=-1)]) \
            if mirror else r

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

        def _shard_iter(imgs_l, valid_l, refs_aug, trials, ring_w,
                        log_alpha, sigma2, sigma_off2, d_eff, psi_mask,
                        c_sig, n_refs_, A_hint):
            cross, e_img, e_ref = _energy_terms(refs_aug, imgs_l, trials,
                                                ring_w, rmin, rmax)
            wk, ik, frac_s, r2_s, t2_s, ll_s = _e_step(
                cross, e_img, e_ref, trials, log_alpha, sigma2,
                sigma_off2, d_eff, top_k, valid=valid_l,
                log_psi_mask=psi_mask, c_sig=c_sig, student_df=student_df)
            A = cross.shape[-1]
            acc, cnt, br, bp, bx, by, bf = _m_step(imgs_l, wk, ik, trials,
                                                   n_refs_, A, mirror)
            stats = jax.tree.map(
                lambda x: jax.lax.psum(x, axis),
                (frac_s, r2_s, t2_s, ll_s, acc, cnt))
            return stats + (br, bp, bx, by, bf)

    def _serial_stats(img_block, la, s2, so2, de, pm):
        cross, e_img, e_ref = _energy_terms(_aug_refs(refs), img_block,
                                            trials, ring_w, rmin, rmax)
        wk, ik, frac_s, r2_s, t2_s, ll_s = _e_step(
            cross, e_img, e_ref, trials, la, s2, so2, de, top_k,
            log_psi_mask=pm, c_sig=c_significance, student_df=student_df)
        acc, cnt, br, bp, bx, by, bf = _m_step(
            img_block, wk, ik, trials, n_refs, cross.shape[-1], mirror)
        return (frac_s, r2_s, t2_s, ll_s, acc, cnt), (br, bp, bx, by, bf)

    best_ref = np.zeros(B, np.int32)
    best_psi_md = np.zeros(B, np.float32)
    best_sx_md = np.zeros(B, np.float32)
    best_sy_md = np.zeros(B, np.float32)
    best_flip = np.zeros(B, bool)

    for it in range(n_iters):
        corr = (imgs_j[:B] - jnp.asarray(gray_b)[:, None, None]) / \
            jnp.asarray(gray_a)[:, None, None] if norm else imgs_j[:B]
        if sigma2 is None or A_ang is None:
            cross0, e_img0, _ = _energy_terms(_aug_refs(refs), corr[:1],
                                              trials, ring_w, rmin, rmax)
            A_ang = cross0.shape[-1]
            psi_mask = _psi_log_mask(A_ang, psi_step, search_rot)
            if sigma2 is None:
                if sigma_init is None:
                    _, e_all, _ = _energy_terms(_aug_refs(refs), corr,
                                                trials, ring_w, rmin, rmax)
                    sigma2 = float(np.asarray(e_all).mean() / d_eff)
                else:
                    sigma2 = float(sigma_init ** 2)
        d_eff = float(np.sum(radii * np.asarray(ring_w)))
        log_alpha = _class_log_alpha()
        A = A_ang
        if mesh is not None:
            from jax.sharding import PartitionSpec as P
            axis = mesh.axis_names[0]
            refs_aug = _aug_refs(refs)
            pm = psi_mask if psi_mask is not None else \
                jnp.zeros((A,), jnp.float32)
            sharded = jax.shard_map(
                lambda im, va: _shard_iter(im, va, refs_aug, trials,
                                           ring_w, log_alpha, sigma2,
                                           sigma_off2, d_eff, pm,
                                           c_significance, n_refs, A),
                mesh=mesh, in_specs=(P(axis), P(axis)),
                out_specs=(P(), P(), P(), P(), P(), P(),
                           P(axis), P(axis), P(axis), P(axis), P(axis)))
            (frac, exp_resid2, exp_t2, ll_sum, acc, cnt,
             br, bp, bx, by, bf) = sharded(imgs_j, valid_j)
            best_ref = np.asarray(br[:B])
            best_psi_md = np.asarray(bp[:B])
            best_sx_md = np.asarray(bx[:B])
            best_sy_md = np.asarray(by[:B])
            best_flip = np.asarray(bf[:B])
            frac = np.asarray(frac)
            exp_resid2 = float(exp_resid2)
            exp_t2 = float(exp_t2)
            ll = float(ll_sum) / B
            stats_total = (frac, exp_resid2, exp_t2, float(ll_sum),
                           np.asarray(acc), np.asarray(cnt))
            updates = [stats_total]
        else:
            updates = []
            if n_blocks == 1:
                stats, pose = _serial_stats(corr, log_alpha, sigma2,
                                            sigma_off2, d_eff, psi_mask)
                block_stats[0] = jax.tree.map(np.asarray, stats)
                (best_ref, best_psi_md, best_sx_md, best_sy_md,
                 best_flip) = [np.asarray(x) for x in pose]
                updates = [block_stats[0]]
            else:
                # incremental EM: refresh one block's sufficient
                # statistics at a time, updating the model after each
                # block from the sum of all cached block stats
                # (ml2d.cpp --iem).
                for bi, sl in enumerate(block_slices):
                    stats, pose = _serial_stats(
                        corr[sl], log_alpha, sigma2, sigma_off2, d_eff,
                        psi_mask)
                    block_stats[bi] = jax.tree.map(np.asarray, stats)
                    br, bp, bx, by, bf = [np.asarray(x) for x in pose]
                    best_ref[sl] = br
                    best_psi_md[sl] = bp
                    best_sx_md[sl] = bx
                    best_sy_md[sl] = by
                    best_flip[sl] = bf
                    have = [s for s in block_stats if s is not None]
                    total = have[0]
                    for s in have[1:]:
                        total = jax.tree.map(np.add, total, s)
                    updates.append(total)
                    log_alpha = _class_log_alpha()

        for frac, exp_resid2, exp_t2, ll_sum, acc, cnt in updates:
            ll = float(ll_sum) / B
            cnt_n = np.asarray(cnt)
            new_refs = np.array(acc)
            old = np.asarray(refs)
            for r in range(n_refs):
                if cnt_n[r] > 1e-6:
                    new_refs[r] /= cnt_n[r]
                else:
                    new_refs[r] = old[r]
            refs = jnp.asarray(new_refs)
            if not fix_fractions:
                frac = np.asarray(frac)
                if mirror:      # fold mirrored-class mass into base class
                    frac = frac[:n_refs] + frac[n_refs:]
                alpha = np.maximum(frac / B, 1e-6)
                alpha /= alpha.sum()
            # ML updates of the noise and offset priors (maximization)
            if not fix_sigma_noise:
                sigma2 = float(exp_resid2) / (B * d_eff)
            if not fix_sigma_offset:
                sigma_off2 = max(float(exp_t2) / (2.0 * B), 0.01)
        ll_hist.append(ll)
        pose_j = (jnp.asarray(best_ref), jnp.asarray(best_psi_md),
                  jnp.asarray(best_sx_md), jnp.asarray(best_sy_md),
                  jnp.asarray(best_flip))
        if norm:
            a, b = _fit_gray(imgs_j[:B], refs, *pose_j)
            gray_a = np.asarray(a)
            gray_b = np.asarray(b)
        if fourier_noise_model:
            src = (imgs_j[:B] - jnp.asarray(gray_b)[:, None, None]) / \
                jnp.asarray(gray_a)[:, None, None] if norm else imgs_j[:B]
            sig_r = np.asarray(_ring_noise_spectra(
                refs, src, *pose_j, rmin, rmax))
            w = 1.0 / np.maximum(sig_r, 1e-8 * sig_r.max())
            ring_w = jnp.asarray((w / w.mean()).astype(np.float32))
        if kstest:
            # KS statistic of the whitened best-pose residuals vs N(0,1)
            # (mlf_align2d --kstest)
            reg = np.asarray(apply_md_geometry(imgs_j[:B], *pose_j[1:]))
            resid = (reg - np.asarray(refs)[best_ref]).ravel()
            resid = resid / max(resid.std(), 1e-12)
            from scipy import stats as sps
            ks_hist.append(float(sps.kstest(
                resid[:: max(len(resid) // 20000, 1)], "norm").statistic))
        out_pose = (best_ref, best_psi_md, best_sx_md, best_sy_md,
                    best_flip)
        if verbose:
            print(f"  ML2D iter {it + 1}: LL {ll_hist[-1]:.4f} "
                  f"sigma {np.sqrt(sigma2):.5f} "
                  f"fractions {np.round(alpha, 3)}")
        if it > 1 and abs(ll_hist[-1] - ll_hist[-2]) < \
                eps * max(abs(ll_hist[-2]), 1.0):
            break

    best_ref, psi_md, sx_md, sy_md, flip = out_pose
    return dict(refs=np.asarray(refs), fractions=alpha,
                sigma=float(np.sqrt(sigma2)),
                sigma_offset=float(np.sqrt(sigma_off2)),
                assignments=np.asarray(best_ref),
                psi=np.asarray(psi_md), sx=np.asarray(sx_md),
                sy=np.asarray(sy_md), flip=np.asarray(flip).astype(int),
                gray_a=gray_a, gray_b=gray_b,
                loglike=ll_hist, kstest=ks_hist)
