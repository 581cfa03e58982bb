"""Iterative algebraic reconstruction (ART/SIRT family) and WBP.

Replaces the reference reconstruct_art/basic_art (parallel modes enum
basic_art.h:92: ART, pSART, pSIRT, ...) and reconstruct_wbp
(reconstruct_wbp.h:47). TPU design: the forward operator is the batched
Fourier central-slice extractor and the adjoint is its matched scatter
(ops.project / ops.reconstruct), so SIRT iterations are whole-stack
project/backproject passes — the block-parallel update of pSIRT is the
natural form here (every image's correction is computed in one batch).
POCS constraints (positivity) are a clip between iterations.
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.ops.project import (extract_central_slices,
                                    prepare_fourier_volume,
                                    slices_to_projections)
from xmipp3_tpu.ops.reconstruct import reconstruct_fourier


def _forward(vol, mats, N, pad_factor=2.0):
    vf, pad_n = prepare_fourier_volume(jnp.asarray(vol), pad_factor)
    slices = extract_central_slices(vf, mats, N)
    return slices_to_projections(slices, N)


def sirt_reconstruct(imgs, rot, tilt, psi, n_iters: int = 10,
                     lam: float = 1.0, positivity: bool = False,
                     pad_factor: float = 2.0, verbose: int = 0,
                     sx=None, sy=None, ridge: float = 0.0,
                     tv: float = 0.0, l1: float = 0.0,
                     soft_threshold: float = 0.0, vol_mask=None,
                     iter_callback=None):
    """SIRT: vol <- vol + lam * R^T(b - R vol) with R normalized per pass.

    Initialization = the weighted direct Fourier reconstruction (a very good
    starting point; the iterations then correct interpolation/coverage bias).
    Optional per-iteration regularizers (the cuda11_forward_art_zernike3d
    family, forward_art_zernike3d_gpu.cpp:145-148): ridge = Tikhonov
    shrinkage (--ltk), tv = smoothed total-variation subgradient step
    (--ltv), l1 = L1 subgradient (--ll1), soft_threshold = proximal soft
    threshold (--lst); vol_mask multiplies the volume each iteration
    (--maskb), positivity clamps negatives (--onlyPositive);
    iter_callback(it, vol) fires after each iteration (--save_iter /
    --debug_iter). Returns (volume, residual_history)."""
    imgs = np.asarray(imgs, np.float32)
    B, N, _ = imgs.shape
    mats = jnp.asarray(np.asarray(euler_matrix(
        np.asarray(rot, np.float32), np.asarray(tilt, np.float32),
        np.asarray(psi, np.float32)), np.float32))
    if sx is not None or sy is not None:
        from xmipp3_tpu.ops.fourier import fourier_shift_2d
        imgs = np.asarray(fourier_shift_2d(
            imgs, np.asarray(sx, np.float32) if sx is not None else 0.0,
            np.asarray(sy, np.float32) if sy is not None else 0.0))
    vol = np.asarray(reconstruct_fourier(imgs, rot, tilt, psi,
                                         pad_factor=pad_factor,
                                         batch=max(B, 1)))
    hist = []
    imgs_j = jnp.asarray(imgs)
    for it in range(n_iters):
        proj = _forward(jnp.asarray(vol), mats, N, pad_factor)
        resid = imgs_j - proj
        rms = float(jnp.sqrt((resid ** 2).mean()))
        hist.append(rms)
        # adjoint of the projector: reconstruct the residuals (normalized
        # scatter) and add
        corr = np.asarray(reconstruct_fourier(
            np.asarray(resid), rot, tilt, psi, pad_factor=pad_factor,
            batch=max(B, 1)))
        vol = vol + lam * corr
        if ridge > 0:
            vol = vol * (1.0 - ridge)
        if tv > 0:
            gz, gy, gx = np.gradient(vol)
            mag = np.sqrt(gz * gz + gy * gy + gx * gx + 1e-8)
            div = (np.gradient(gz / mag, axis=0)
                   + np.gradient(gy / mag, axis=1)
                   + np.gradient(gx / mag, axis=2))
            vol = vol + tv * div
        if l1 > 0:
            vol = vol - l1 * np.sign(vol)
        if soft_threshold > 0:
            vol = np.sign(vol) * np.maximum(np.abs(vol) - soft_threshold,
                                            0.0)
        if vol_mask is not None:
            vol = vol * vol_mask
        if positivity:
            vol = np.maximum(vol, 0.0)
        if iter_callback is not None:
            iter_callback(it + 1, vol)
        if verbose:
            print(f"  SIRT iter {it + 1}: residual rms {rms:.5f}")
        if it > 1 and hist[-2] - hist[-1] < 1e-6 * hist[0]:
            break
    return vol.astype(np.float32), hist


ART_MODES = ("ART", "pCAV", "pAVSP", "pSART", "pBiCAV", "pSIRT", "pfSIRT",
             "SIRT")


def _orthogonal_order(rot, tilt, psi, sort_last: int = 2):
    """Greedy most-orthogonal ordering: next projection minimizes the
    summed |dot| of its direction with the last `sort_last` chosen ones
    (reference sortPerpendicular / --sort_last, basic_art.cpp; -1 = use
    all previous)."""
    A = np.asarray(euler_matrix(np.asarray(rot, np.float32),
                                np.asarray(tilt, np.float32),
                                np.asarray(psi, np.float32)))
    dirs = A[:, 2, :]
    B = len(dirs)
    order = [0]
    remaining = set(range(1, B))
    while remaining:
        last = order if sort_last < 0 else order[-sort_last:]
        rem = np.fromiter(remaining, int)
        cost = np.abs(dirs[rem] @ dirs[last].T).sum(axis=1)
        pick = int(rem[np.argmin(cost)])
        order.append(pick)
        remaining.discard(pick)
    return np.asarray(order)


def _pocs_extras(v, known_volume: float = -1, sparse_eps: float = -1,
                 diffusion_eps: float = -1, sphere_mask=None,
                 sym_mats=None):
    """Extra POCS projections (reference basic_art.cpp POCS chain):
    --known_volume top-mass cut, --sparse soft support, --diffusion
    smoothing, -R interest sphere, volume symmetrization."""
    if known_volume > 0:
        k = int(min(known_volume, v.size))
        thr = np.partition(v.ravel(), -k)[-k]
        v = np.where(v >= thr, v, 0.0)
    if sparse_eps > 0:
        v = np.where(np.abs(v) >= sparse_eps * max(np.abs(v).max(), 1e-12),
                     v, 0.0)
    if diffusion_eps > 0:
        lap = (-6.0 * v
               + np.roll(v, 1, 0) + np.roll(v, -1, 0)
               + np.roll(v, 1, 1) + np.roll(v, -1, 1)
               + np.roll(v, 1, 2) + np.roll(v, -1, 2))
        v = v + diffusion_eps * lap
    if sphere_mask is not None:
        v = np.where(sphere_mask, v, 0.0)
    if sym_mats is not None and len(sym_mats) > 1:
        from xmipp3_tpu.ops.geo import apply_affine_3d
        v = np.asarray(apply_affine_3d(v, sym_mats)).mean(axis=0)
    return v


def art_reconstruct(imgs, rot, tilt, psi, mode: str = "SIRT",
                    n_iters: int = 5, lambda_list=(0.5,),
                    block_size: int | None = None,
                    positivity: bool = False, surface_mask=None,
                    pocs_freq: int = 1, random_sort: bool = False,
                    pad_factor: float = 2.0, verbose: int = 0,
                    sx=None, sy=None, seed: int = 0, mesh=None,
                    init_vol=None, stop_at: int = 0, sort_last: int = 0,
                    no_sort: bool = True, known_volume: float = -1,
                    sparse_eps: float = -1, diffusion_eps: float = -1,
                    sphere_R: float = -1, sym_mats=None, sym_each: int = 0,
                    force_sym: int = 0, wls: bool = False,
                    kappa_list=(0.5,), pixel_masks=None, ctf=None,
                    refine: bool = False, ref_trans_after: int = -1,
                    ref_trans_step: float = -1.0, show_error: bool = False,
                    save_intermediate=None):
    """Algebraic reconstruction with the reference's parallel-mode family
    (basic_art.h:92 ARTParallelMode {ART, pCAV, pAVSP, pSART, pBiCAV,
    pSIRT, pfSIRT, SIRT}) and POCS constraints (:373-376).

    TPU mapping of the block structure (every block is ONE batched
    project/backproject pass; the reference's MPI block distribution
    becomes the batch axis):
      ART        sequential Kaczmarz: block_size=1, update per projection;
      pAVSP      average of sequential passes: like ART but corrections of
                 a sweep are averaged into one update at sweep end;
      pSART      update after each block, correction normalized by the
                 block's density (the D/W compensation of the adjoint);
      pBiCAV     block-iterative CAV: like pSART with component-averaging
                 normalization (per-voxel equation counts = the weight
                 cube, which the density-compensated adjoint already
                 divides by);
      pCAV       CAV: one simultaneous update, CAV normalization;
      pSIRT/SIRT simultaneous update from all projections;
      pfSIRT     SIRT with the correction rescaled to unit max (the
                 'false' SIRT variant's aggressive normalization).

    POCS constraints: positivity clip and an optional surface mask
    (volume forced to 0 where mask==1), applied every pocs_freq block
    updates. lambda_list gives per-iteration relaxation (reference
    lambda_list, basic_art.h:438; last value repeats).

    Returns (volume, residual_history)."""
    imgs = np.asarray(imgs, np.float32)
    if refine or ref_trans_after > 0 or wls:
        imgs = imgs.copy()          # refined in place below
    B, N, _ = imgs.shape
    rot = np.asarray(rot, np.float32)
    tilt = np.asarray(tilt, np.float32)
    psi = np.asarray(psi, np.float32)
    if sx is not None or sy is not None:
        from xmipp3_tpu.ops.fourier import fourier_shift_2d
        imgs = np.asarray(fourier_shift_2d(
            imgs, np.asarray(sx, np.float32) if sx is not None else 0.0,
            np.asarray(sy, np.float32) if sy is not None else 0.0))
    mats_all = np.asarray(euler_matrix(rot, tilt, psi), np.float32)
    if mode not in ART_MODES:
        raise ValueError(f"unknown ART mode {mode!r} (valid: {ART_MODES})")
    if block_size is None:
        block_size = {"ART": 1, "pAVSP": 1}.get(mode, max(B // 8, 1))
    if mode in ("SIRT", "pSIRT", "pfSIRT", "pCAV"):
        block_size = B
    lambda_list = list(np.atleast_1d(lambda_list).astype(np.float64))

    rng = np.random.default_rng(seed)
    vol = np.zeros((N, N, N), np.float32) if init_vol is None \
        else np.asarray(init_vol, np.float32).copy()
    mask = None if surface_mask is None else \
        np.asarray(surface_mask) > 0.5
    sphere = None
    if sphere_R > 0:
        zz, yy, xx = np.mgrid[0:N, 0:N, 0:N].astype(np.float32) - N // 2
        sphere = (zz * zz + yy * yy + xx * xx) <= sphere_R * sphere_R
    if pixel_masks is not None:
        pixel_masks = np.asarray(pixel_masks, np.float32)
    kappa_list = list(np.atleast_1d(kappa_list).astype(np.float64))
    resid_store = np.zeros_like(imgs) if wls else None
    ortho = None
    if not random_sort and (not no_sort or sort_last != 0):
        ortho = _orthogonal_order(rot, tilt, psi,
                                  sort_last if sort_last != 0 else 2)
    hist = []
    upd_count = 0
    stopped = False

    def pocs(v):
        if positivity:
            v = np.maximum(v, 0.0)
        if mask is not None:
            v = np.where(mask, 0.0, v)
        v = _pocs_extras(v, known_volume, sparse_eps, diffusion_eps,
                         sphere,
                         sym_mats if force_sym > 0 else None)
        return v

    for it in range(n_iters):
        lam = lambda_list[min(it, len(lambda_list) - 1)]
        kappa = kappa_list[min(it, len(kappa_list) - 1)]
        if random_sort:
            order = rng.permutation(B)
        elif ortho is not None:
            order = ortho
        else:
            order = np.arange(B)
        sweep_resid = 0.0
        sweep_corr = np.zeros_like(vol) if mode == "pAVSP" else None
        nblk = 0
        for s in range(0, B, block_size):
            sel = order[s:s + block_size]
            if mesh is not None:
                # data-parallel block update: project + residual +
                # backproject sharded over the mesh, ONE psum fusing the
                # partial cubes (parallel/reconstruct.py — the reference
                # distributes ART blocks across MPI workers the same way,
                # basic_art.h:92-116)
                from xmipp3_tpu.parallel.reconstruct import \
                    parallel_art_correction
                corr, ss, rmax = parallel_art_correction(
                    mesh, vol, imgs[sel], rot[sel], tilt[sel], psi[sel],
                    pad_factor=pad_factor, interp="tri")
                sweep_resid += ss
            else:
                mats = jnp.asarray(mats_all[sel])
                proj = np.asarray(_forward(jnp.asarray(vol), mats, N,
                                           pad_factor))
                if ctf is not None:
                    # theoretical projections see the same CTF as the data
                    # (reference --ctf, basic_art.cpp)
                    from xmipp3_tpu.ops.ctf import apply_ctf
                    proj = np.asarray(apply_ctf(proj, ctf))
                if refine or (ref_trans_after > 0
                              and upd_count >= ref_trans_after):
                    # translational re-alignment of the experimental
                    # projections against the theoretical ones
                    # (reference --refine / --ref_trans_after/_step)
                    from xmipp3_tpu.ops.geo import shift_2d_real
                    from xmipp3_tpu.ops.shift import best_shift
                    sx_r, sy_r, _ = best_shift(proj, imgs[sel])
                    sx_r, sy_r = np.asarray(sx_r), np.asarray(sy_r)
                    if ref_trans_step > 0:
                        sx_r = np.clip(sx_r, -ref_trans_step, ref_trans_step)
                        sy_r = np.clip(sy_r, -ref_trans_step, ref_trans_step)
                    imgs[sel] = np.asarray(shift_2d_real(
                        imgs[sel], -sx_r, -sy_r))
                resid = imgs[sel] - proj
                if pixel_masks is not None:
                    resid = resid * pixel_masks[sel]
                if wls:
                    # weighted-least-squares ART: the backprojected
                    # residual is the kappa-relaxed running residual
                    # (reference --WLS / -k kappa list)
                    resid_store[sel] = (1.0 - kappa) * resid_store[sel] \
                        + kappa * resid
                    resid = resid_store[sel]
                sweep_resid += float((resid ** 2).sum())
                rmax = float(np.abs(resid).max())
                if show_error:
                    print(f"    block {nblk}: |resid|_rms "
                          f"{np.sqrt((resid ** 2).mean()):.5f}")
                corr = np.asarray(reconstruct_fourier(
                    resid, rot[sel], tilt[sel], psi[sel],
                    pad_factor=pad_factor, batch=max(len(sel), 1),
                    interp="tri"))
            if mode == "pfSIRT":
                m = np.abs(corr).max()
                if m > 1e-12:
                    corr = corr * (rmax / m)
            if mode == "pAVSP":
                sweep_corr += corr
            else:
                vol = vol + lam * corr
                upd_count += 1
                if pocs_freq > 0 and upd_count % pocs_freq == 0:
                    vol = pocs(vol)
                if sym_mats is not None and sym_each > 0 \
                        and (upd_count * block_size) % sym_each < block_size:
                    from xmipp3_tpu.ops.geo import apply_affine_3d
                    vol = np.asarray(apply_affine_3d(vol, sym_mats)) \
                        .mean(axis=0)
            nblk += 1
            if stop_at > 0 and (it * B + s + len(sel)) >= stop_at:
                stopped = True
                break
        if mode == "pAVSP":
            vol = pocs(vol + lam * sweep_corr / max(nblk, 1))
        else:
            vol = pocs(vol)
        rms = np.sqrt(sweep_resid / (B * N * N))
        hist.append(float(rms))
        if verbose:
            print(f"  {mode} iter {it + 1}: residual rms {rms:.5f} "
                  f"(lambda {lam})")
        if save_intermediate is not None:
            save_intermediate(it, vol)
        if stopped:
            break
        if it > 1 and hist[-2] - hist[-1] < 1e-6 * hist[0]:
            break
    return vol.astype(np.float32), hist


def wbp_direction_set(rot, tilt, psi=None, weights=None, filsam: float = 5.0,
                      sym: str = "c1", use_each_image: bool = False):
    """The mat_g table of the Radermacher arbitrary-geometry filter
    (reconstruct_wbp.cpp:231-358, getSampledMatrices / getAllMatrices):
    beam-direction rows (z-row of Euler(rot, -tilt, psi)) with per-direction
    image counts — one per symmetry-expanded image (--use_each_image), or
    binned onto an even distribution sampled every `filsam` degrees.
    Returns (g_rows (K,3), counts (K,))."""
    from xmipp3_tpu.core.sym import SymList
    from xmipp3_tpu.core import sampling as smp
    rot = np.asarray(rot, np.float64)
    tilt = np.asarray(tilt, np.float64)
    psi_arr = (np.zeros_like(rot) if psi is None
               else np.asarray(psi, np.float64))
    w = (np.ones(len(rot)) if weights is None
         else np.asarray(weights, np.float64))
    sl = SymList(sym if sym else "c1")
    if use_each_image:
        base = np.stack([rot, tilt, psi_arr, w], axis=1)
    else:
        pts = smp.remove_redundant_points(
            smp.compute_sampling_points(filsam), sl)
        d_ref = smp.directions_from_angles(pts)
        d_img = smp.directions_from_angles(np.stack([rot, tilt], axis=1))
        mats = sl.sym_matrices().astype(np.float64)
        orb = np.einsum("sij,nj->nsi", mats, d_img)          # (N,S,3)
        idx = np.argmax(
            np.einsum("nsi,mi->nsm", orb, d_ref).max(axis=1), axis=1)
        counts = np.zeros(len(pts))
        np.add.at(counts, idx, w)
        # the reference floors each bin count to int (reconstruct_wbp.cpp:276)
        counts = np.floor(counts)
        keep = counts > 0
        base = np.stack([pts[keep, 0], pts[keep, 1],
                         np.zeros(int(keep.sum())), counts[keep]], axis=1)
    rows, cnts = [], []
    for r, t, p, c in base:
        triplets = ([(r, t, p)] if len(sl) == 1
                    else sl.expand_euler(r, t, p))
        for er, et, ep in triplets:
            rows.append((er, et, ep))
            cnts.append(c)
    ang = np.array(rows, np.float64)
    A = np.asarray(euler_matrix(ang[:, 0].astype(np.float32),
                                (-ang[:, 1]).astype(np.float32),
                                ang[:, 2].astype(np.float32)))
    return A[:, 2, :].astype(np.float32), np.asarray(cnts, np.float32)


@jax.jit
def _wbp_filter_one(img, f2, counts, K, thr_abs, diameter):
    """Divide one centered spectrum by the direction-summed sinc weighting
    (filterOneImage, reconstruct_wbp.cpp:437-492)."""
    N = img.shape[0]
    coords = K * (jnp.arange(N) - N // 2).astype(jnp.float32)
    args = (coords[None, :, None] * f2[:, 0] +
            coords[:, None, None] * f2[:, 1])                # (N,N,K)
    w = jnp.sum(jnp.sinc(args) * counts, axis=-1)
    sgn = jnp.where(w < 0, -1.0, 1.0)
    denom = jnp.where(jnp.abs(w) < thr_abs, sgn * thr_abs, w) * diameter
    spec = jnp.fft.fftshift(jnp.fft.fft2(img))
    out = jnp.fft.ifft2(jnp.fft.ifftshift(spec / denom))
    return jnp.real(out)


def wbp_arbitrary_filter(imgs, rot, tilt, psi, g_rows, counts,
                         diameter: float | None = None,
                         threshold: float = 0.005):
    """Radermacher arbitrary-geometry weighting of a projection batch.

    For image matrix A = Euler(-rot, tilt, -psi), each direction's in-plane
    frequency footprint is f_k = (A^T g_k)_{xy}; the 2-D weight at centered
    frequency index (j, i) is sum_k count_k * sinc(K*(j*f_x + i*f_y)) with
    K = diameter/dim, clamped at threshold*totimgs (the reference's relative
    threshold, reconstruct_wbp.cpp:304/461-472)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    B, N = imgs.shape[0], imgs.shape[1]
    if diameter is None or diameter <= 0:
        diameter = float(N)
    A = jnp.asarray(euler_matrix(-jnp.asarray(rot, jnp.float32),
                                 jnp.asarray(tilt, jnp.float32),
                                 -jnp.asarray(psi, jnp.float32)))
    g = jnp.asarray(g_rows, jnp.float32)
    f2 = jnp.einsum("kc,bcd->bkd", g, A)[..., :2]            # (B,K,2)
    thr_abs = jnp.float32(threshold * float(np.sum(counts)))
    K = jnp.float32(diameter / N)
    cj = jnp.asarray(counts, jnp.float32)
    dia = jnp.float32(diameter)
    out = jax.lax.map(lambda t: _wbp_filter_one(t[0], t[1], cj, K,
                                                thr_abs, dia),
                      (imgs, f2))
    return out


def wbp_reconstruct(imgs, rot, tilt, psi, pad_factor: float = 2.0,
                    filter_diameter: float | None = None,
                    mode: str = "ramp", weights=None, filsam: float = 5.0,
                    sym: str = "c1", use_each_image: bool = False,
                    threshold: float = 0.005):
    """Weighted back-projection (reconstruct_wbp.cpp).

    mode="arbitrary" applies the reference's Radermacher arbitrary-geometry
    filter (sampled every `filsam` degrees, or per-image with
    use_each_image; optional per-image weights, symmetry expansion, relative
    threshold). mode="ramp" is the classic |k| ramp pre-filter — a
    documented simplification kept as the fast default for isolated use.
    Both paths back-project with the same Fourier adjoint scatter used by
    direct inversion (TPU-native replacement for the reference's real-space
    voxel loop, simpleBackprojection :362-435)."""
    imgs = np.asarray(imgs, np.float32)
    B, N, _ = imgs.shape
    if filter_diameter is None or filter_diameter <= 0:
        filter_diameter = N
    if mode == "arbitrary":
        if weights is not None:
            imgs = imgs * np.asarray(weights, np.float32)[:, None, None]
        g_rows, counts = wbp_direction_set(
            rot, tilt, psi=psi, weights=weights, filsam=filsam, sym=sym,
            use_each_image=use_each_image)
        filtered = np.asarray(wbp_arbitrary_filter(
            imgs, rot, tilt, psi, g_rows, counts,
            diameter=filter_diameter, threshold=threshold), np.float32)
    else:
        fy = np.fft.fftfreq(N).astype(np.float32)[:, None]
        fx = np.fft.rfftfreq(N).astype(np.float32)[None, :]
        r = np.sqrt(fx * fx + fy * fy)
        # ramp with flat region below 1/diameter (avoid DC null blowup)
        f0 = 1.0 / filter_diameter
        ramp = np.where(r < f0, r / f0 * f0, r).astype(np.float32)
        ramp[0, 0] = f0
        spec = np.fft.rfft2(imgs)
        filtered = np.fft.irfft2(spec * ramp[None],
                                 s=(N, N)).astype(np.float32)
    # adjoint scatter: reuse reconstruct_fourier — the accumulated weights
    # normalize interpolation while the pre-filter provides the angular
    # weighting.
    vol = np.asarray(reconstruct_fourier(filtered, rot, tilt, psi,
                                         pad_factor=pad_factor,
                                         batch=max(B, 1)))
    return vol.astype(np.float32)


def wedge_aware_average(subs, rot, tilt, psi, t1: float = -60.0,
                        t2: float = 60.0, apply_alignment: bool = True):
    """Missing-wedge-compensated subtomogram average (the
    forward_art_zernike3d_subtomos / tomo_average_subtomos data model):
    each subtomogram is rotated into the reference frame by its row pose,
    its wedge pass-band (tilt range t1..t2 about y) rotates analytically
    with it, and the Fourier sum is normalized by the accumulated
    per-voxel wedge coverage — voxels seen by more subtomos get full
    weight, never-seen wedge regions stay zero instead of averaging in
    noise."""
    from xmipp3_tpu.ops.fourier_filter import wedge_mask_3d
    from xmipp3_tpu.ops.geo import apply_affine_3d
    subs = np.asarray(subs, np.float32)
    B, n = subs.shape[0], subs.shape[-1]
    Fsum = np.zeros((n, n, n // 2 + 1), np.complex128)
    Wsum = np.zeros((n, n, n // 2 + 1), np.float64)
    A = np.asarray(euler_matrix(np.asarray(rot, np.float32),
                                np.asarray(tilt, np.float32),
                                np.asarray(psi, np.float32)))
    for k in range(B):
        if apply_alignment:
            aligned = np.asarray(apply_affine_3d(
                jnp.asarray(subs[k]), jnp.asarray(A[k].T))[0])
            w = wedge_mask_3d(n, n, n, t1, t2,
                              rot=float(np.asarray(rot)[k]),
                              tilt=float(np.asarray(tilt)[k]),
                              psi=float(np.asarray(psi)[k]))
        else:
            aligned = subs[k]
            w = wedge_mask_3d(n, n, n, t1, t2)
        Fsum += np.fft.rfftn(aligned) * w
        Wsum += w
    # clamp coverage at 1: never AMPLIFY a barely-covered voxel (the
    # analytic wedge only approximates the pass-band of the interpolated
    # rotation; dividing by <1 coverage blows up interpolation leakage)
    avg = np.fft.irfftn(Fsum / np.maximum(Wsum, 1.0), (n, n, n),
                        axes=(0, 1, 2))
    return avg.astype(np.float32)
