"""ML2D: multi-reference 2-D maximum-likelihood refinement.

Rebuilds the reference ml_align2d (ml2d.h/ml_align2d.cpp:700-926
expectationSingleImage: per-image integration of the likelihood over
(class, in-plane rotation, translation); maximization re-estimates class
averages, fractions and noise sigma).

TPU design: the rotational integral comes free from ring-FFT correlation
CURVES (every psi at once, ops.match.rotational_corr_matrix); translations
from the same trial grid as matching. The E-step keeps the full soft
posterior over (ref, trial, psi) implicitly but materializes only the top-K
poses per image for the weighted M-step (top-K soft assignment — the
reference's significant-weight truncation plays the same role).

Model: X_i = T(R(ref_k)) + N(0, sigma^2 I);
log p(X|k,pose) = const - ||X - R||^2 / (2 sigma^2)
               = const' + (X·R_pose - ||R||^2/2) / sigma^2.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from xmipp3_tpu.ops.fourier import fourier_shift_2d
from xmipp3_tpu.ops.geo import apply_md_geometry, alignment_to_md_pose
from xmipp3_tpu.ops.match import rotational_corr_matrix, _trial_shift_grid
from xmipp3_tpu.ops.polar import cartesian_to_polar, ring_ffts


def _pose_scores(refs, imgs, trials, radius_min, radius_max,
                 ring_weights=None):
    """Correlation-coefficient curves for every (image, trial, ref, psi)."""
    f_refs = ring_ffts(cartesian_to_polar(refs, radius_min, radius_max))
    scores = []
    rw = None if ring_weights is None else jnp.asarray(ring_weights,
                                                       jnp.float32)
    for t in np.asarray(trials):
        shifted = fourier_shift_2d(imgs, float(t[0]), float(t[1]))
        f_im = ring_ffts(cartesian_to_polar(shifted, radius_min, radius_max))
        corr = rotational_corr_matrix(f_refs, f_im, radius_min, rw)  # (B,R,A)
        scores.append(np.asarray(corr))
    return np.stack(scores, axis=1)  # (B, T, R, A)


def _ring_snr_weights(refs, imgs, radius_min, radius_max):
    """MLF2D noise model: per-ring SNR = class-average ring power over
    residual ring power, used to weight the scoring rings."""
    p_ref = np.asarray(jnp.abs(ring_ffts(cartesian_to_polar(
        jnp.asarray(refs), radius_min, radius_max))) ** 2).mean(axis=(0, 2))
    p_img = np.asarray(jnp.abs(ring_ffts(cartesian_to_polar(
        jnp.asarray(imgs), radius_min, radius_max))) ** 2).mean(axis=(0, 2))
    noise = np.maximum(p_img - p_ref, 1e-8 * p_img.max())
    snr = p_ref / noise
    return np.clip(snr / max(snr.max(), 1e-12), 0.02, 1.0)


def ml2d(imgs: np.ndarray, n_refs: int, n_iters: int = 15,
         max_shift: int = 4, sigma_init: float = 1.0, seed: int = 0,
         top_k: int = 8, verbose: int = 0, fourier_noise_model: bool = False):
    """Returns dict(refs, fractions, sigma, assignments, loglike_history).

    fourier_noise_model=True is the MLF2D variant (mlf_align2d.h:70): the
    per-ring SNR of the current model weights the angular-frequency terms of
    the scoring correlation, down-weighting noise-dominated rings."""
    from xmipp3_tpu.models.cl2d import initial_references
    imgs = np.asarray(imgs, np.float32)
    B, H, W = imgs.shape
    radius_min, radius_max = 2, H // 2 - 2
    refs = initial_references(imgs, n_refs, seed)
    alpha = np.full(n_refs, 1.0 / n_refs)
    sigma = sigma_init
    trials = _trial_shift_grid(max_shift, step=max(max_shift / 2, 1.0))
    ll_hist = []

    for it in range(n_iters):
        rw = (_ring_snr_weights(refs, imgs, radius_min, radius_max)
              if fourier_noise_model else None)
        S = _pose_scores(jnp.asarray(refs), jnp.asarray(imgs),
                         trials, radius_min, radius_max, rw)   # (B,T,R,A)
        Bn, T, R, A = S.shape
        # scale correlation coefficient -> approx X·R/sigma^2 energy units:
        # use a temperature so the posterior sharpens as sigma decreases
        energy = S / max(sigma, 1e-3) * 10.0
        energy = energy + np.log(np.maximum(alpha, 1e-8))[None, None, :, None]
        flat = energy.reshape(B, -1)
        flat_max = flat.max(axis=1, keepdims=True)
        post = np.exp(flat - flat_max)
        post /= post.sum(axis=1, keepdims=True)
        ll = float((flat_max[:, 0] + np.log(
            np.exp(flat - flat_max).sum(axis=1))).mean())
        ll_hist.append(ll)

        # top-K poses per image
        topk_idx = np.argpartition(flat, -top_k, axis=1)[:, -top_k:]
        w = np.take_along_axis(post, topk_idx, axis=1)
        w /= w.sum(axis=1, keepdims=True)

        t_idx = topk_idx // (R * A)
        r_idx = (topk_idx // A) % R
        a_idx = topk_idx % A

        # M-step: weighted class averages from registered images
        new_refs = np.zeros_like(refs)
        new_counts = np.zeros(n_refs)
        resid_acc = 0.0
        for k in range(top_k):
            psi_align = a_idx[:, k].astype(np.float32) * (360.0 / A)
            psi_align = np.where(psi_align > 180, psi_align - 360, psi_align)
            t = trials[t_idx[:, k]]
            # pose applied during scoring: rotational corr of T(t)img vs ref
            # at lag psi -> aligned = R(psi)·T(t)·img
            rad = np.deg2rad(psi_align)
            c, s = np.cos(rad), np.sin(rad)
            sx = c * t[:, 0] + s * t[:, 1]
            sy = -s * t[:, 0] + c * t[:, 1]
            psi_md, sx_md, sy_md, _ = (np.asarray(v) for v in
                                       alignment_to_md_pose(
                                           psi_align.astype(np.float32),
                                           sx.astype(np.float32),
                                           sy.astype(np.float32)))
            reg = np.asarray(apply_md_geometry(
                imgs, psi_md.astype(np.float32), sx_md.astype(np.float32),
                sy_md.astype(np.float32)))
            for r in range(n_refs):
                sel = r_idx[:, k] == r
                if sel.any():
                    ww = w[sel, k]
                    new_refs[r] += (reg[sel] * ww[:, None, None]).sum(axis=0)
                    new_counts[r] += ww.sum()
        for r in range(n_refs):
            if new_counts[r] > 1e-6:
                new_refs[r] /= new_counts[r]
            else:
                new_refs[r] = refs[r]
        alpha = np.maximum(new_counts, 1e-6)
        alpha /= alpha.sum()
        refs = new_refs

        # sigma update from best-pose residuals
        best = flat.argmax(axis=1)
        bt, br, ba = best // (R * A), (best // A) % R, best % A
        psi_align = ba.astype(np.float32) * (360.0 / A)
        psi_align = np.where(psi_align > 180, psi_align - 360, psi_align)
        t = trials[bt]
        rad = np.deg2rad(psi_align)
        c, s = np.cos(rad), np.sin(rad)
        sx = c * t[:, 0] + s * t[:, 1]
        sy = -s * t[:, 0] + c * t[:, 1]
        psi_md, sx_md, sy_md, _ = (np.asarray(v) for v in alignment_to_md_pose(
            psi_align.astype(np.float32), sx.astype(np.float32),
            sy.astype(np.float32)))
        reg = np.asarray(apply_md_geometry(imgs, psi_md.astype(np.float32),
                                           sx_md.astype(np.float32),
                                           sy_md.astype(np.float32)))
        resid = reg - refs[br]
        sigma = float(np.sqrt((resid ** 2).mean()))
        if verbose:
            print(f"  ML2D iter {it + 1}: LL {ll:.4f} sigma {sigma:.4f} "
                  f"fractions {np.round(alpha, 3)}")
        if it > 1 and abs(ll_hist[-1] - ll_hist[-2]) < 1e-5 * abs(ll_hist[-2]):
            break

    return dict(refs=refs, fractions=alpha, sigma=sigma,
                assignments=br, psi=psi_md, sx=sx_md, sy=sy_md,
                loglike=ll_hist)
