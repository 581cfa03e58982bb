"""Gallery matching: batched multireference rotational correlation + shift
refinement — the projection-matching inner loop.

Replaces the reference's per-image pthread loop with LRU reference cache
(angular_projection_matching.cpp:530-770, HOT LOOP) and the CUDA exhaustive
correlation (cuda_gpu_correlation): gallery ring-FFTs are computed once; each
particle batch correlates against ALL references as one einsum over
(rings x angular-frequencies) — an MXU-shaped contraction — followed by a
batched irfft and argmax. Mirrors come free as conjugate ring-FFTs. Shift is
then refined only for the winning reference (as the reference does:
rotational alignment over neighbors, translational on the winner,
angular_projection_matching.cpp:776-860).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.polar import (cartesian_to_polar, polar_at_static_offsets,
                                  ring_ffts)
from xmipp3_tpu.ops.shear_rotate import (_shear_tables, rotate_shift_fourier,
                                         translate_fourier)
from xmipp3_tpu.ops.shift import _parabola_peak_1d, best_shift, correlation_index


@partial(jax.jit, static_argnames=("radius_min",))
def rotational_corr_matrix(f_refs, f_imgs, radius_min: int = 2,
                           ring_weights=None):
    """All-pairs angular correlation curves.

    f_refs (R, nr, k), f_imgs (B, nr, k) complex ring FFTs ->
    (B, R, A) correlation curves (A = 2*(k-1)). Optional ring_weights (nr,)
    multiply the default radius weighting (the MLF2D per-resolution noise
    model hook)."""
    R, nr, k = f_refs.shape
    A = 2 * (k - 1)
    radii = jnp.arange(radius_min, radius_min + nr, dtype=jnp.float32)
    w = radii / radii.sum()
    if ring_weights is not None:
        w = w * ring_weights
        w = w / jnp.maximum(w.sum(), 1e-12)
    # drop k=0 (per-ring mean) so flat background doesn't dominate, and
    # normalize by per-image/per-ref ring energies -> correlation coefficient
    mask = jnp.ones(k, jnp.float32).at[0].set(0.0)
    fi = f_imgs * mask[None, None, :]
    fr = f_refs * mask[None, None, :]
    # rfft energy: interior bins count twice (conjugate half)
    dup = (2.0 * jnp.ones(k)).at[0].set(1.0).at[-1].set(1.0 if A % 2 == 0 else 2.0)
    e_img = jnp.einsum("brk,r,k->b", jnp.abs(fi) ** 2, w, dup)
    e_ref = jnp.einsum("Rrk,r,k->R", jnp.abs(fr) ** 2, w, dup)
    cross = jnp.einsum("brk,Rrk->bRk", fi * w[None, :, None], jnp.conj(fr))
    corr = jnp.fft.irfft(cross, n=A, axis=-1) * A
    norm = jnp.sqrt(jnp.maximum(e_img[:, None] * e_ref[None, :], 1e-20))
    return corr / norm[:, :, None]


@partial(jax.jit, static_argnames=("radius_min",))
def best_rotation_matrix(f_refs, f_imgs, radius_min: int = 2,
                         psi_allow=None):
    """Best psi + peak for every (image, ref) pair, straight and mirrored.

    Mirroring an image about x reverses its polar angle axis; the ring FFT of
    the mirrored image is the conjugate of the original's (up to angle
    reversal), so mirror correlations reuse the same gallery FFTs. Moreover
    with fi = a+bi, fr = c+di the straight cross fi·conj(fr) and the mirror
    cross conj(fi)·conj(fr) share the SAME four real products (ac, bd, bc,
    ad) — both spectra come from one set of four real contractions instead
    of two complex einsums (half the matmul work of the scan).

    psi_allow (B, A) optionally restricts the searched in-plane angles
    per image (reference --max_psi_change / --psi_step,
    angular_discrete_assign.cpp grammar): masked angles score -inf.

    Returns (psi (B,R), peak (B,R), psi_m (B,R), peak_m (B,R))."""
    R, nr, k = f_refs.shape
    A = 2 * (k - 1)
    radii = jnp.arange(radius_min, radius_min + nr, dtype=jnp.float32)
    w = radii / radii.sum()
    mask = jnp.ones(k, jnp.float32).at[0].set(0.0)
    fi = f_imgs * mask[None, None, :]
    fr = f_refs * (mask * 1.0)[None, None, :]
    dup = (2.0 * jnp.ones(k)).at[0].set(1.0).at[-1].set(
        1.0 if A % 2 == 0 else 2.0)
    e_img = jnp.einsum("brk,r,k->b", jnp.abs(fi) ** 2, w, dup)
    e_ref = jnp.einsum("Rrk,r,k->R", jnp.abs(fr) ** 2, w, dup)
    norm = jnp.sqrt(jnp.maximum(e_img[:, None] * e_ref[None, :], 1e-20))

    a, b = jnp.real(fi) * w[None, :, None], jnp.imag(fi) * w[None, :, None]
    c, d = jnp.real(fr), jnp.imag(fr)
    ac = jnp.einsum("brk,Rrk->bRk", a, c)
    bd = jnp.einsum("brk,Rrk->bRk", b, d)
    bc = jnp.einsum("brk,Rrk->bRk", b, c)
    ad = jnp.einsum("brk,Rrk->bRk", a, d)
    # fi·conj(fr) = (ac+bd) + i(bc-ad); conj(fi)·conj(fr) = (ac-bd) - i(bc+ad)
    cross = (ac + bd, bc - ad)
    cross_m = (ac - bd, -(bc + ad))

    # irfft-by-MXU-matmul: (B, R) batched length-A inverse rFFTs are
    # LATENCY-bound on TPU (131k tiny FFTs cost ~9 ms regardless of A —
    # measured r4 on v5e; size 254 vs 256 makes no difference), while the
    # same transform as an (B·R, k) x (k, A) dot rides the MXU. Exact:
    # irfft(X, A)·A = Re(X)·w @ cos - Im(X)·w @ sin with w = [1,2,…,2,1]
    # (validated to 6e-5 against jnp.fft.irfft on device).
    kk = np.arange(k)
    aa = np.arange(A)
    dft_ang = 2 * np.pi * np.outer(kk, aa) / A
    wrow = np.ones(k, np.float32)
    wrow[1:k - 1] = 2.0
    Wcos = jnp.asarray(np.cos(dft_ang).astype(np.float32)
                       * wrow[:, None])
    Wsin = jnp.asarray(np.sin(dft_ang).astype(np.float32)
                       * wrow[:, None])
    _mm = lambda X, W: jax.lax.dot_general(
        X, W, (((2,), (0,)), ((), ())),
        precision=jax.lax.Precision.HIGHEST)

    if psi_allow is not None and psi_allow.shape[-1] != A:
        # callers build the psi mask on their own angular grid; resample
        # it (nearest angle) onto this kernel's A = 2*(k-1) grid
        src = np.round(np.arange(A) * (psi_allow.shape[-1] / A)) \
            .astype(np.int32) % psi_allow.shape[-1]
        psi_allow = psi_allow[:, jnp.asarray(src)]

    def peaks(cross):
        cr, ci = cross
        corr = (_mm(cr, Wcos) - _mm(ci, Wsin)) / norm[:, :, None]
        if psi_allow is not None:
            # large finite negative (not -inf): the winner's parabola
            # neighbors may be masked and -inf arithmetic would NaN psi
            corr = jnp.where(psi_allow[:, None, :] > 0, corr, -1e30)
        idx = jnp.argmax(corr, axis=-1)
        # peak + parabola neighbors WITHOUT per-(B,R) dynamic gathers:
        # corr[...,idx±1] as one-hot masked reductions (XLA fuses these
        # into vector passes over corr). The fancy-index form costs ~10 M
        # data-dependent gathers per batch = ~125 ms on v5e (measured r4,
        # the scan's dominant term); this form is pure VPU.
        hot = jax.nn.one_hot(idx, A, dtype=corr.dtype)        # (B,R,A)
        y0 = jnp.max(corr, axis=-1)
        ym1 = jnp.sum(corr * jnp.roll(hot, -1, axis=-1), axis=-1)
        yp1 = jnp.sum(corr * jnp.roll(hot, 1, axis=-1), axis=-1)
        off = _parabola_peak_1d(ym1, y0, yp1)
        ang = (idx.astype(jnp.float32) + off) * (360.0 / A)
        ang = jnp.where(ang > 180.0, ang - 360.0, ang)
        return ang, y0

    psi, peak = peaks(cross)
    psi_m, peak_m = peaks(cross_m)
    return psi, peak, psi_m, peak_m


def _trial_shift_grid(max_shift: int, step: float | None = None):
    """Coarse translation search grid (reference search5d itrans loop,
    angular_projection_matching.cpp:570-584)."""
    if max_shift <= 0:
        return np.zeros((1, 2), np.float32)
    if step is None:
        step = max(max_shift / 2.0, 1.0)
    v = np.arange(-max_shift, max_shift + 1e-6, step, dtype=np.float32)
    tx, ty = np.meshgrid(v, v)
    pts = np.stack([tx.ravel(), ty.ravel()], axis=1)
    keep = np.linalg.norm(pts, axis=1) <= max_shift + 1e-6
    return pts[keep].astype(np.float32)


@partial(jax.jit, static_argnames=("trials", "radius_min", "radius_max",
                                   "check_mirror", "stride", "n_harmonics"))
def _scan_trials(refs, imgs, trials, radius_min: int, radius_max: int,
                 check_mirror: bool, stride: int = 2, n_harmonics: int = 64,
                 psi_allow=None):
    """Rotational matching over a STATIC trial-translation grid.

    TPU shape of the 5-D search: every (trial, ring, angle) sample of every
    image comes from ONE constant-index gather (the trial shifts are baked
    into the polar grids — no per-trial Fourier shifts), every stride-th
    ring, angular sampling at the Nyquist rate of the kept n_harmonics
    (~2.9 deg coarse psi at the default 64 — measured true-match parity
    with 128 on shifted fixtures, r4; the winner refinement restores
    full psi precision). Returns per-image best (ref, psi, trial_idx, flip, peak)."""
    B = imgs.shape[0]
    n_ang = 2 * n_harmonics
    f_refs = ring_ffts(cartesian_to_polar(refs, radius_min, radius_max,
                                          n_angles=n_ang,
                                          stride=stride))[..., :n_harmonics]
    pol = polar_at_static_offsets(imgs, trials, radius_min, radius_max,
                                  n_angles=n_ang, stride=stride)  # (B,T,R,A)
    f_all = ring_ffts(pol)[..., :n_harmonics]                     # (B,T,R,k)
    f_all = jnp.moveaxis(f_all, 1, 0)                             # (T,B,R,k)

    def body(carry, f_im):
        best_peak, best_psi, best_ref, best_trial, best_flip, ti = carry
        psi, peak, psi_m, peak_m = best_rotation_matrix(f_refs, f_im,
                                                        radius_min,
                                                        psi_allow)
        if check_mirror:
            use_m = peak_m > peak
            peak_t = jnp.where(use_m, peak_m, peak)
            psi_t = jnp.where(use_m, psi_m, psi)
        else:
            use_m = jnp.zeros_like(peak, dtype=bool)
            peak_t = peak
            psi_t = psi
        ref_t = jnp.argmax(peak_t, axis=1)
        bi = jnp.arange(B)
        pk = peak_t[bi, ref_t]
        better = pk > best_peak
        carry = (jnp.where(better, pk, best_peak),
                 jnp.where(better, psi_t[bi, ref_t], best_psi),
                 jnp.where(better, ref_t, best_ref),
                 jnp.where(better, ti, best_trial),
                 jnp.where(better, use_m[bi, ref_t], best_flip),
                 ti + 1)
        return carry, None

    init = (jnp.full(B, -jnp.inf), jnp.zeros(B), jnp.zeros(B, jnp.int32),
            jnp.zeros(B, jnp.int32), jnp.zeros(B, bool),
            jnp.asarray(0, jnp.int32))
    (peak, psi, ref, trial, flip, _), _ = jax.lax.scan(body, init, f_all)
    return peak, psi, ref, trial, flip


@partial(jax.jit, static_argnames=("trials", "radius_min", "radius_max",
                                   "check_mirror", "stride", "n_harmonics"))
def _scan_trials_full(refs, imgs, trials, radius_min: int, radius_max: int,
                      check_mirror: bool, stride: int = 2,
                      n_harmonics: int = 64, psi_allow=None):
    """Like _scan_trials but keeps the FULL (B, R) best-over-trials score
    matrix (per-pair best psi/trial/flip) — the basis of top-N orientation
    tracking (reference angular_projection_matching.cpp:717-740) and of
    align_significant's significance weights (aalign_significant.h:46-77)."""
    B = imgs.shape[0]
    R = refs.shape[0]
    n_ang = 2 * n_harmonics
    f_refs = ring_ffts(cartesian_to_polar(refs, radius_min, radius_max,
                                          n_angles=n_ang,
                                          stride=stride))[..., :n_harmonics]
    pol = polar_at_static_offsets(imgs, trials, radius_min, radius_max,
                                  n_angles=n_ang, stride=stride)
    f_all = jnp.moveaxis(ring_ffts(pol)[..., :n_harmonics], 1, 0)

    def body(carry, f_im):
        bpeak, bpsi, btrial, bflip, ti = carry
        psi, peak, psi_m, peak_m = best_rotation_matrix(f_refs, f_im,
                                                        radius_min,
                                                        psi_allow)
        if check_mirror:
            use_m = peak_m > peak
            peak_t = jnp.where(use_m, peak_m, peak)
            psi_t = jnp.where(use_m, psi_m, psi)
        else:
            use_m = jnp.zeros_like(peak, dtype=bool)
            peak_t = peak
            psi_t = psi
        better = peak_t > bpeak
        carry = (jnp.where(better, peak_t, bpeak),
                 jnp.where(better, psi_t, bpsi),
                 jnp.where(better, ti, btrial),
                 jnp.where(better, use_m, bflip),
                 ti + 1)
        return carry, None

    init = (jnp.full((B, R), -jnp.inf), jnp.zeros((B, R)),
            jnp.zeros((B, R), jnp.int32), jnp.zeros((B, R), bool),
            jnp.asarray(0, jnp.int32))
    (peak, psi, trial, flip, _), _ = jax.lax.scan(body, init, f_all)
    return peak, psi, trial, flip


@partial(jax.jit, static_argnames=("max_shift", "radius_min", "radius_max",
                                   "refine_iters"))
def refine_winners(refs, imgs, best_ref, psi0, t, flip, max_shift: int,
                   radius_min: int, radius_max: int, refine_iters: int = 2):
    """Refine the coarse winners (shift + psi) and convert to the metadata
    pose convention. Shared tail of the serial, dp and tp (gallery-sharded)
    match paths. t: (B,2) coarse trial translations."""
    B, H, W = imgs.shape
    chosen_refs = refs[best_ref]                             # (B,H,W)

    # Mirror convention: conj ring-FFT correlation corresponds to the
    # y-flipped image (polar angle reversal θ -> -θ); y-flipping T(t)·img
    # gives T(tx,-ty)·yflip(img). The flip must be about the exact center
    # (ops.geo.centered_flip) or a 1 px ghost shift leaks into the pose.
    from xmipp3_tpu.ops.geo import centered_flip
    work = jnp.where(flip[:, None, None], centered_flip(imgs, 1), imgs)
    tx = t[:, 0]
    ty = jnp.where(flip, -t[:, 1], t[:, 1])

    # initial pose: R(psi)·T(t) == T(R(psi) t)·R(psi)
    rad = jnp.deg2rad(psi0)
    c, s = jnp.cos(rad), jnp.sin(rad)
    sx = c * tx + s * ty
    sy = -s * tx + c * ty
    psi_cur = psi0

    # refinement ring FFTs also use the stride-2 fast path: the gather is
    # the dominant device cost and the parabolic peak keeps sub-degree psi
    f_refs = ring_ffts(cartesian_to_polar(refs, radius_min, radius_max,
                                          stride=2))
    f_chosen = f_refs[best_ref]                               # (B,nr,k)
    nr = f_chosen.shape[1]
    A = 2 * (f_chosen.shape[2] - 1)
    radii = jnp.arange(radius_min, radius_min + nr, dtype=jnp.float32)
    rw = radii / radii.sum()

    # the chosen-reference shift spectrum is fixed across iterations — hoist
    # its rfft2 out of the scan (best_shift would retransform it every call)
    from xmipp3_tpu.ops.shift import best_shift_from_spectra, rfft2_any
    F_chosen = rfft2_any(chosen_refs)

    def body(carry, _):
        psi_cur, sx, sy = carry
        # gather-free warp: per-image dynamic-index gathers run ~35x slower
        # than FFT work on TPU (ops/shear_rotate.py), so the refinement warps
        # use the three-shear Fourier rotation instead of apply_affine_2d
        aligned = rotate_shift_fourier(work, psi_cur, sx, sy)
        # Jacobi update (r5, same trick as ops/align._iterative_align_refine):
        # dpsi and (dsx, dsy) are both measured on this SAME warp, so the
        # per-iteration translate_fourier FFT pass is gone; the final
        # half-step below restores the Gauss-Seidel-quality last shift.
        # Measured on v5e at config-4 shapes (1024x128², 128 refs): perf-
        # NEUTRAL (72.9 -> 73.3 ms/batch) with identical true-ref accuracy
        # (0.9688) and registered cc (0.9584) — the refine scan is bound by
        # the rotation+polar work, not these FFT passes. Kept for the
        # hoisted reference spectrum (matters at >256 px where rfft2 is a
        # real FFT dispatch) and structural parity with ops/align.
        dsx, dsy, _ = best_shift_from_spectra(F_chosen, rfft2_any(aligned),
                                              max_shift=max_shift, W=W)
        f_al = ring_ffts(cartesian_to_polar(aligned, radius_min, radius_max,
                                            stride=2))
        # pairwise angular correlation vs the chosen reference
        cross = (f_al * jnp.conj(f_chosen) * rw[None, :, None]).sum(axis=1)
        # irfft as a dense (B,k)x(k,A) dot (batched tiny FFTs are
        # latency-bound on TPU; see ops/shear_rotate._shear_tables)
        Ci, Si = (jnp.asarray(t) for t in _shear_tables(A)[2:])
        curve = (jnp.dot(jnp.real(cross), Ci,
                         precision=jax.lax.Precision.HIGHEST)
                 - jnp.dot(jnp.imag(cross), Si,
                           precision=jax.lax.Precision.HIGHEST))  # (B,A)
        idx = jnp.argmax(curve, axis=-1)
        bi = jnp.arange(B)
        off = _parabola_peak_1d(curve[bi, (idx - 1) % A], curve[bi, idx],
                                curve[bi, (idx + 1) % A])
        dpsi = (idx.astype(jnp.float32) + off) * (360.0 / A)
        dpsi = jnp.where(dpsi > 180.0, dpsi - 360.0, dpsi)
        rad = jnp.deg2rad(dpsi)
        c, s = jnp.cos(rad), jnp.sin(rad)
        psi_cur = psi_cur + dpsi
        # first-order composite T(ds)·R(dpsi)·T(s)·R(psi)
        #   = T(ds + R(dpsi)s)·R(psi+dpsi)
        sx, sy = c * sx + s * sy + dsx, -s * sx + c * sy + dsy
        return (psi_cur, sx, sy), None

    (psi_cur, sx, sy), _ = jax.lax.scan(body, (psi_cur, sx, sy), None,
                                        length=refine_iters)

    aligned = rotate_shift_fourier(work, psi_cur, sx, sy)
    # final shift half-step at the converged rotation (the scan's last ds
    # was measured before its last dpsi); exact compose via sinc translate
    dsx, dsy, _ = best_shift_from_spectra(F_chosen, rfft2_any(aligned),
                                          max_shift=max_shift, W=W)
    sx = sx + dsx
    sy = sy + dsy
    aligned = translate_fourier(aligned, dsx, dsy)
    corr = correlation_index(chosen_refs, aligned)

    # Convert to the framework-wide metadata pose convention
    # (ops.geo: shift(img, s_md) ≈ M_x^flip proj(A(rot, tilt, psi_md))).
    # The matcher's mirror candidates are Y-flips (polar angle reversal);
    # alignment_to_md_pose takes the X-mirror convention (xmipp MDL_FLIP),
    # and F_y = F_x·R(180), so flipped rows carry psi+180.
    from xmipp3_tpu.ops.geo import alignment_to_md_pose
    psi_x = jnp.where(flip, psi_cur + 180.0, psi_cur)
    psi_md, sx_md, sy_md, _ = alignment_to_md_pose(psi_x, sx, sy, flip)
    return dict(ref_idx=best_ref, psi=psi_md, sx=sx_md, sy=sy_md, corr=corr,
                flip=flip, aligned=aligned)


@partial(jax.jit, static_argnames=("trials", "max_shift", "radius_min",
                                   "radius_max", "refine_iters",
                                   "check_mirror"))
def _match_jit(refs, imgs, trials, max_shift: int, radius_min: int,
               radius_max: int, refine_iters: int, check_mirror: bool,
               psi_allow=None):
    """Single-compilation gallery match (scan + winner refinement).

    One end-to-end jit: repeated calls with the same static config reuse the
    compiled program — essential under remote compilation, where every
    retrace costs seconds. `trials` is a static tuple of (tx, ty) so the
    scan's gather indices are compile-time constants."""
    peak0, psi0, best_ref, trial_idx, flip = _scan_trials(
        refs, imgs, trials, radius_min, radius_max, check_mirror,
        psi_allow=psi_allow)
    t = jnp.asarray(np.asarray(trials, np.float32))[trial_idx]  # (B,2)
    out = refine_winners(refs, imgs, best_ref, psi0, t, flip, max_shift,
                         radius_min, radius_max, refine_iters)
    out["peak"] = peak0
    return out


@partial(jax.jit, static_argnames=("trials", "max_shift", "radius_min",
                                   "radius_max", "refine_iters",
                                   "check_mirror", "n_orientations"))
def _match_topn_jit(refs, imgs, trials, allowed, max_shift: int,
                    radius_min: int, radius_max: int, refine_iters: int,
                    check_mirror: bool, n_orientations: int,
                    psi_allow=None):
    """Top-N orientations per image over a (possibly) restricted gallery.

    allowed: (B, R) float mask (1 = candidate, 0 = excluded) — the static
    per-image neighborhood restriction (reference Sampling neighbor lists,
    data/sampling.h:203, consumed as a score mask: on TPU the dense einsum
    over the full gallery + masking beats gather-based candidate lists)."""
    peak, psi, trial, flip = _scan_trials_full(refs, imgs, trials,
                                               radius_min, radius_max,
                                               check_mirror,
                                               psi_allow=psi_allow)
    peak = jnp.where(allowed > 0, peak, -jnp.inf)
    topv, topi = jax.lax.top_k(peak, n_orientations)      # (B, N)
    tgrid = jnp.asarray(np.asarray(trials, np.float32))
    bi = jnp.arange(imgs.shape[0])
    outs = []
    for k in range(n_orientations):
        rk = topi[:, k]
        out = refine_winners(refs, imgs, rk, psi[bi, rk],
                             tgrid[trial[bi, rk]], flip[bi, rk],
                             max_shift, radius_min, radius_max, refine_iters)
        out.pop("aligned", None)
        out["peak"] = topv[:, k]
        outs.append(out)
    return jax.tree.map(lambda *xs: jnp.stack(xs, axis=1), *outs)


N_ANGLES = 254   # coarse-scan psi curve length: 2 * (n_harmonics - 1)


def match_to_gallery(refs, imgs, max_shift: int = 8, radius_min: int = 2,
                     radius_max: int | None = None, refine_iters: int = 2,
                     check_mirror: bool = True, trial_step: float | None = None,
                     n_orientations: int = 1, allowed=None, psi_allow=None):
    """Match each image to its best gallery reference + in-plane pose.

    5-D search: rotational ring correlation against all references at each
    trial translation of a coarse grid, then shift+rotation refinement of the
    winner. Returns dict(ref_idx, psi, sx, sy, corr, flip) — each (B,).

    n_orientations > 1 keeps the top-N orientations per image (outputs get
    a trailing axis of size N; reference numOrientations,
    angular_projection_matching.cpp:717-740). allowed (B, R) restricts the
    candidate references per image (neighborhood restriction)."""
    refs = jnp.asarray(refs, jnp.float32)
    imgs = jnp.asarray(imgs, jnp.float32)
    if imgs.ndim == 2:
        imgs = imgs[None]
    H = imgs.shape[-2]
    if radius_max is None:
        radius_max = H // 2 - 2
    trials = tuple(map(tuple, _trial_shift_grid(max_shift, trial_step)
                       .astype(float).tolist()))
    if psi_allow is not None:
        psi_allow = jnp.asarray(psi_allow, jnp.float32)
    if n_orientations == 1 and allowed is None:
        return _match_jit(refs, imgs, trials, max_shift, radius_min,
                          radius_max, refine_iters, check_mirror,
                          psi_allow=psi_allow)
    if allowed is None:
        allowed = jnp.ones((imgs.shape[0], refs.shape[0]), jnp.float32)
    else:
        allowed = jnp.asarray(allowed, jnp.float32)
    out = _match_topn_jit(refs, imgs, trials, allowed, max_shift, radius_min,
                          radius_max, refine_iters, check_mirror,
                          n_orientations, psi_allow=psi_allow)
    if n_orientations == 1:
        out = jax.tree.map(lambda x: x[:, 0], out)
    return out


def match_score_matrix(refs, imgs, max_shift: int = 8, radius_min: int = 2,
                       radius_max: int | None = None,
                       check_mirror: bool = True,
                       trial_step: float | None = None):
    """Full (B, R) best-over-(psi, trial) correlation matrix + per-pair
    pose — the align_significant front end (aalign_significant.h:46-77)."""
    refs = jnp.asarray(refs, jnp.float32)
    imgs = jnp.asarray(imgs, jnp.float32)
    if imgs.ndim == 2:
        imgs = imgs[None]
    H = imgs.shape[-2]
    if radius_max is None:
        radius_max = H // 2 - 2
    trials = tuple(map(tuple, _trial_shift_grid(max_shift, trial_step)
                       .astype(float).tolist()))
    peak, psi, trial, flip = _scan_trials_full(refs, imgs, trials,
                                               radius_min, radius_max,
                                               check_mirror)
    return dict(peak=peak, psi=psi, trial=trial, flip=flip,
                trials=np.asarray(trials, np.float32))
