"""Mesh-parallel movie alignment: patch axis sharded over devices.

The reference FlexAlign GPU pipeline runs local (patch) alignment on a
stream pool (movie_alignment_correlation_gpu.cpp:649 std::vector<GPU>);
here the patch axis is the mesh axis: every device computes the pairwise
correlation shifts of its patch shard in one batched FFT pipeline, and
only the tiny per-patch trajectory least-squares runs on the host.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import PartitionSpec as P

from xmipp3_tpu.ops.fourier import phase_ramp_1d
from xmipp3_tpu.ops.movie import (frame_ffts_scaled, pairwise_shifts,
                                  patch_grid, shift_sum_frames_keep,
                                  solve_frame_trajectory)


def local_align_mesh(mesh, frames, global_pos, patches=(5, 5),
                     patch_size: int = 256, max_shift_px: int = 8,
                     axis_name: str = "data", patches_avg: int = 1):
    """Patch-sharded local alignment; same contract as ops.movie.local_align
    (returns (ny, nx, F, 2) field + patch centers). Mirrors the serial fast
    path exactly (patches_avg == 1: integer global shift as a periodic roll
    + fractional residual folded into each patch's spectrum) so the
    serial==mesh parity tests compare the SAME algorithm."""
    frames = np.asarray(frames, np.float32)
    F, H, W = frames.shape
    patch_size = min(patch_size, H // 2, W // 2)
    patch_size -= patch_size % 2
    ny, nx = patches
    gx = -np.asarray(global_pos)[:, 0]
    gy = -np.asarray(global_pos)[:, 1]
    resid = None
    if patches_avg <= 1:
        gxi = np.round(gx).astype(np.int64)
        gyi = np.round(gy).astype(np.int64)
        corrected = np.stack([np.roll(frames[f], (gyi[f], gxi[f]),
                                      axis=(0, 1)) for f in range(F)])
        # numpy residuals, phases built INSIDE the traced shard fn (eager
        # complex construction is an axon platform hazard)
        resid = ((gx - gxi).astype(np.float32),
                 (gy - gyi).astype(np.float32))
    else:
        corrected = np.asarray(shift_sum_frames_keep(
            jnp.asarray(frames), gx, gy))
        # temporal box window [t-(avg-1)//2, t+avg//2] per patch frame
        lo = np.maximum(0, np.arange(F) - (patches_avg - 1) // 2)
        hi = np.minimum(F - 1, np.arange(F) + patches_avg // 2)
        cs = np.concatenate([np.zeros_like(corrected[:1]),
                             np.cumsum(corrected, axis=0)])
        corrected = ((cs[hi + 1] - cs[lo])
                     / (hi - lo + 1)[:, None, None].astype(np.float32))
    cys, cxs = patch_grid(H, W, ny, nx, patch_size)
    tiles = np.stack([
        corrected[:, cy - patch_size // 2: cy + patch_size // 2,
                  cx - patch_size // 2: cx + patch_size // 2]
        for cy in cys for cx in cxs])                      # (Pn,F,ps,ps)
    Pn = tiles.shape[0]
    n_dev = int(np.prod(mesh.devices.shape))
    pad = (-Pn) % n_dev
    if pad:
        tiles = np.concatenate([tiles, np.zeros((pad,) + tiles.shape[1:],
                                                np.float32)])

    @partial(jax.shard_map, mesh=mesh, in_specs=(P(axis_name),),
             out_specs=(P(axis_name), P(axis_name)))
    def shard_pairwise(tiles_l):
        if resid is not None:
            fxr, fyr = resid
            fxg = jnp.fft.rfftfreq(patch_size).astype(jnp.float32)
            fyg = jnp.fft.fftfreq(patch_size).astype(jnp.float32)
            pxr = phase_ramp_1d(fxg, jnp.asarray(fxr))    # (F, K)
            pyr = phase_ramp_1d(fyg, jnp.asarray(fyr))    # (F, patch)

        def one(tile):
            specs = frame_ffts_scaled(tile, patch_size)
            if resid is not None:
                specs = specs * pyr[:, :, None] * pxr[:, None, :]
            shifts, _, peaks = pairwise_shifts(specs, patch_size,
                                               max_shift_px)
            return shifts, peaks
        return jax.lax.map(one, tiles_l)

    shifts_all, peaks_all = shard_pairwise(jnp.asarray(tiles))
    shifts_all = np.asarray(shifts_all)[:Pn]
    peaks_all = np.asarray(peaks_all)[:Pn]
    _, pairs, _ = pairwise_shifts(
        frame_ffts_scaled(jnp.asarray(tiles[0]), patch_size), patch_size,
        max_shift_px)
    field = np.zeros((ny, nx, F, 2), np.float32)
    for p in range(Pn):
        field[p // nx, p % nx] = solve_frame_trajectory(
            shifts_all[p], pairs, F,
            weights=np.maximum(peaks_all[p], 0))
    return field, cys, cxs
