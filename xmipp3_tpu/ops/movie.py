"""Movie (dose-fractionated stack) alignment — the FlexAlign pipeline.

Replaces the reference CUDA FlexAlign suite (cuda_flexalign_scale /
cuda_flexalign_correlate + kernels, SURVEY.md §2.5; host choreography in
movie_alignment_correlation_base.cpp:530-570 and
movie_alignment_correlation_gpu.cpp:633-) with batched device ops:

  global:  frames -> (crop/bin in Fourier + LPF) -> ALL-PAIRS cross-power
           correlations in one batched irfft2 -> subpixel peaks -> host
           least-squares solve of per-frame trajectory
  local:   overlapped patches; per-patch the same correlation pipeline gives
           per-(patch, frame) shifts; a control-point shift field is fit and
           frames are warped with its interpolation before summing
  dose:    Grant & Grigorieff critical-exposure weighting applied as a
           frequency filter during the weighted sum (movie_filter_dose.h:72)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.fourier import freq_grid_2d, phase_ramp_1d as _phase_1d
from xmipp3_tpu.ops.shift import correlation_peaks_2d, windowed_cross_peaks


# ---------------------------------------------------------------------------
# global alignment
# ---------------------------------------------------------------------------

@partial(jax.jit, static_argnames=("corr_n",))
def frame_ffts_scaled(frames, corr_n: int, lpf_cutoff: float = 0.5):
    """Per-frame rfft, Fourier-cropped to corr_n and low-pass filtered
    (the CUDAFlexAlignScale stage)."""
    frames = jnp.asarray(frames, jnp.float32)
    F, H, W = frames.shape
    spec = jnp.fft.rfft2(frames - frames.mean(axis=(-2, -1), keepdims=True))
    # crop to corr_n x corr_n//2+1 (take low frequencies)
    h2 = corr_n // 2
    top = spec[:, :h2, : corr_n // 2 + 1]
    bot = spec[:, H - h2:, : corr_n // 2 + 1]
    small = jnp.concatenate([top, bot], axis=1)
    fy, fx = freq_grid_2d(corr_n, corr_n)
    r = jnp.sqrt(fy * fy + fx * fx)
    lpf = jnp.exp(-0.5 * (r / (lpf_cutoff / 2.355)) ** 2)  # gaussian LPF
    return small * lpf[None]


@partial(jax.jit, static_argnames=("corr_n", "max_shift_px"))
def pairwise_shifts(specs, corr_n: int, max_shift_px: int):
    """Relative shifts between ALL frame pairs (i<j).

    Returns (n_pairs, 2) shifts in the cropped-grid pixels and the pair
    index arrays (i_idx, j_idx)."""
    F = specs.shape[0]
    ii, jj = np.triu_indices(F, k=1)
    cross = specs[jj] * jnp.conj(specs[ii])
    if 2 * max_shift_px + 3 <= corr_n // 2:
        # direct window evaluation: the full irfft2 computes corr_n^2
        # values per pair and uses (2·ms+1)^2 of them (ops/shift.py
        # windowed_cross_peaks; at 512^2/ms=8 that is ~1000x waste plus
        # a latency-bound batched 2-D FFT)
        sx, sy, peak = windowed_cross_peaks(cross, corr_n, corr_n,
                                            int(max_shift_px))
    else:
        corr = jnp.fft.fftshift(jnp.fft.irfft2(cross, s=(corr_n, corr_n)),
                                axes=(-2, -1))
        sx, sy, peak = correlation_peaks_2d(corr, max_shift_px)
    # correlation peak at +s means frame j content sits at +s relative to i
    return jnp.stack([sx, sy], axis=1), np.stack([ii, jj], axis=1), peak


def solve_frame_trajectory(pair_shifts, pairs, n_frames: int,
                           weights=None) -> np.ndarray:
    """Least-squares per-frame positions from pairwise measurements
    (the reference's host LSQ after FlexAlign correlations).

    pair_shifts (P,2): measured x_j - x_i. Gauge: mean position = 0.
    Returns (F,2) frame positions."""
    P = len(pairs)
    A = np.zeros((P + 1, n_frames))
    b = np.zeros((P + 1, 2))
    w = np.ones(P) if weights is None else np.asarray(weights)
    for k, (i, j) in enumerate(pairs):
        A[k, i] = -w[k]
        A[k, j] = w[k]
        b[k] = w[k] * np.asarray(pair_shifts)[k]
    A[P, :] = 1.0  # gauge fixing
    sol, *_ = np.linalg.lstsq(A, b, rcond=None)
    return sol


@partial(jax.jit, static_argnames=())
def shift_sum_frames(frames, shifts_x, shifts_y, dose_filter=None):
    """Shift every frame by its correction (undo motion) and sum — in one
    Fourier pass; optional per-frame frequency weights (dose filter)."""
    frames = jnp.asarray(frames, jnp.float32)
    F, H, W = frames.shape
    spec = jnp.fft.rfft2(frames)
    px = _phase_1d(jnp.fft.rfftfreq(W).astype(jnp.float32),
                   jnp.asarray(shifts_x, jnp.float32))      # (F, K)
    py = _phase_1d(jnp.fft.fftfreq(H).astype(jnp.float32),
                   jnp.asarray(shifts_y, jnp.float32))      # (F, H)
    spec = spec * py[:, :, None] * px[:, None, :]
    if dose_filter is not None:
        spec = spec * dose_filter
        spec_sum = spec.sum(axis=0)
        norm = jnp.maximum(dose_filter.sum(axis=0), 1e-6)
        return jnp.fft.irfft2(spec_sum * (F / norm), s=(H, W)) / F
    return jnp.fft.irfft2(spec.sum(axis=0), s=(H, W))


@partial(jax.jit, static_argnames=("corr_n", "ms"))
def _global_pairwise_jit(frames, corr_n: int, ms: int):
    """Fused scale+correlate device pass (ONE dispatch — under the axon
    relay every eager op pays round-trip latency)."""
    specs = frame_ffts_scaled(frames, corr_n)
    sh, _, pk = pairwise_shifts(specs, corr_n, ms)
    return sh, pk


def global_align(frames, max_shift_px: int = 40, corr_n: int | None = None):
    """Global movie alignment. Returns per-frame positions (F,2) in FULL
    resolution pixels (x, y).

    `frames` may live on device — it is NEVER pulled to host here (a
    2 GB production movie must stay resident; only the (P,2) shift and
    peak tensors come back for the host LSQ solve)."""
    F, H, W = frames.shape
    if corr_n is None:
        corr_n = min(512, H, W)
        corr_n -= corr_n % 2
    scale = H / corr_n
    ms = max(int(max_shift_px / scale), 2)
    shifts, peaks = _global_pairwise_jit(jnp.asarray(frames), corr_n, ms)
    ii, jj = np.triu_indices(F, k=1)
    pairs = np.stack([ii, jj], axis=1)
    pos = solve_frame_trajectory(np.asarray(shifts) * scale, pairs, F,
                                 weights=np.maximum(np.asarray(peaks), 0))
    return pos


# ---------------------------------------------------------------------------
# local (patch) alignment
# ---------------------------------------------------------------------------

def patch_grid(H, W, ny: int, nx: int, patch: int):
    """Centers + slices of an ny x nx patch grid."""
    cys = np.linspace(patch // 2, H - patch // 2 - 1, ny).astype(int)
    cxs = np.linspace(patch // 2, W - patch // 2 - 1, nx).astype(int)
    return cys, cxs


@partial(jax.jit, static_argnames=("cys", "cxs", "patch_size",
                                   "max_shift_px", "patches_avg"))
def _local_shifts_device(frames, gx, gy, cys, cxs, patch_size: int,
                         max_shift_px: int, patches_avg: int = 1):
    """Whole local-alignment measurement in ONE dispatch: global
    correction, on-device patch extraction, pairwise correlations per
    patch via lax.map. Only the tiny (npatch, npairs, 2) shift tensors
    leave the device — the 2 GB corrected stack never touches the host
    (critical both for the relay and for HBM-bound production movies).

    patches_avg: each patch frame t is the mean of globally-corrected
    frames [t-(avg-1)//2, t+avg//2] (GPU reference
    movie_alignment_correlation_gpu.cpp:179 frame windowing) — boosts the
    per-patch SNR before the pairwise correlations.  Implemented as a
    static cumulative-sum window, still one dispatch.

    Fast path (patches_avg == 1): the global correction is NOT applied as
    a full-frame Fourier shift — on a 32×4096² movie that costs ~360 ms
    on v5e (r5 ablation) only to feed 25 patch crops. Instead the INTEGER
    part of each frame's shift becomes one periodic jnp.roll (pure data
    movement, same wrap semantics as the Fourier shift) and the
    FRACTIONAL residual folds into each patch's spectrum as a separable
    phase — the same Fourier-shifted crop to sub-pixel sinc terms at the
    patch border, with no full-frame FFT round trip."""
    F = frames.shape[0]
    h = patch_size // 2
    if patches_avg <= 1:
        gxi = jnp.round(gx).astype(jnp.int32)
        gyi = jnp.round(gy).astype(jnp.int32)
        fxr = gx - gxi.astype(jnp.float32)       # fractional residual
        fyr = gy - gyi.astype(jnp.float32)
        fxg = jnp.fft.rfftfreq(patch_size).astype(jnp.float32)
        fyg = jnp.fft.fftfreq(patch_size).astype(jnp.float32)
        pxr = _phase_1d(fxg, fxr)                 # (F, K)
        pyr = _phase_1d(fyg, fyr)                 # (F, patch)
        rolled = jax.vmap(lambda img, dy, dx: jnp.roll(img, (dy, dx),
                                                       axis=(0, 1)))(
            frames, gyi, gxi)
        tiles = jnp.stack([rolled[:, cy - h: cy + h, cx - h: cx + h]
                           for cy in cys for cx in cxs])

        def one(tile):
            specs = frame_ffts_scaled(tile, patch_size)
            specs = specs * pyr[:, :, None] * pxr[:, None, :]
            shifts, _, peaks = pairwise_shifts(specs, patch_size,
                                               max_shift_px)
            return shifts, peaks

        return jax.lax.map(one, tiles)

    corrected = shift_sum_frames_keep(frames, gx, gy)
    lo = np.maximum(0, np.arange(F) - (patches_avg - 1) // 2)
    hi = np.minimum(F - 1, np.arange(F) + patches_avg // 2)
    cs = jnp.concatenate([jnp.zeros_like(corrected[:1]),
                          jnp.cumsum(corrected, axis=0)])
    corrected = ((cs[hi + 1] - cs[lo])
                 / (hi - lo + 1)[:, None, None].astype(jnp.float32))
    tiles = jnp.stack([corrected[:, cy - h: cy + h, cx - h: cx + h]
                       for cy in cys for cx in cxs])

    def one(tile):
        specs = frame_ffts_scaled(tile, patch_size)
        shifts, _, peaks = pairwise_shifts(specs, patch_size, max_shift_px)
        return shifts, peaks

    return jax.lax.map(one, tiles)


def local_align(frames, global_pos, patches=(5, 5), patch_size: int = 256,
                max_shift_px: int = 8, patches_avg: int = 1):
    """Per-patch residual shifts after global correction.

    Returns (ny, nx, F, 2) local shift field + patch centers."""
    frames = jnp.asarray(frames, jnp.float32)
    F, H, W = frames.shape
    patch_size = min(patch_size, H // 2, W // 2)
    patch_size -= patch_size % 2
    ny, nx = patches
    cys, cxs = patch_grid(H, W, ny, nx, patch_size)
    global_pos = np.asarray(global_pos, np.float32)
    shifts_all, peaks_all = _local_shifts_device(
        frames, jnp.asarray(-global_pos[:, 0]),
        jnp.asarray(-global_pos[:, 1]), tuple(int(c) for c in cys),
        tuple(int(c) for c in cxs), patch_size, max_shift_px,
        int(patches_avg))
    shifts_all = np.asarray(shifts_all)
    peaks_all = np.asarray(peaks_all)
    ii, jj = np.triu_indices(F, k=1)
    pairs = np.stack([ii, jj], axis=1)
    field = np.zeros((ny, nx, F, 2), np.float32)
    for p in range(ny * nx):
        field[p // nx, p % nx] = solve_frame_trajectory(
            shifts_all[p], pairs, F,
            weights=np.maximum(peaks_all[p], 0))
    return field, cys, cxs


@jax.jit
def shift_sum_frames_keep(frames, shifts_x, shifts_y):
    """Shift frames (no sum) — for patch extraction after global align."""
    frames = jnp.asarray(frames, jnp.float32)
    F, H, W = frames.shape
    spec = jnp.fft.rfft2(frames)
    px = _phase_1d(jnp.fft.rfftfreq(W).astype(jnp.float32),
                   jnp.asarray(shifts_x, jnp.float32))      # (F, K)
    py = _phase_1d(jnp.fft.fftfreq(H).astype(jnp.float32),
                   jnp.asarray(shifts_y, jnp.float32))      # (F, H)
    return jnp.fft.irfft2(spec * py[:, :, None] * px[:, None, :],
                          s=(H, W))


def interpolate_shift_field(field, cys, cxs, H, W):
    """Bilinear interpolation of the (ny,nx,F,2) patch field to per-pixel
    shift maps (F,H,W,2) — the B-spline control grid role
    (localAlignmentControlPoints)."""
    from scipy.interpolate import RegularGridInterpolator
    ny, nx, F, _ = field.shape
    out = np.zeros((F, H, W, 2), np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    pts = np.stack([yy.ravel(), xx.ravel()], axis=1)
    for f in range(F):
        for c in range(2):
            interp = RegularGridInterpolator(
                (cys, cxs), field[:, :, f, c], bounds_error=False,
                fill_value=None)
            out[f, :, :, c] = interp(pts).reshape(H, W)
    return out


@partial(jax.jit, static_argnames=("tile", "offs"))
def _warp_passes_jit(frames, win, tshift_grids, offs, tile: int):
    """Reshape-batched warp: each pass covers a (cropped) plane with
    NON-overlapping tiles, so the whole pass is one batched FFT op — no
    per-tile dynamic slices (the lax.scan tile loop measured 9.6 s for
    225 tiles on a 32x4096^2 movie; the 4-pass form is pure batched FFT
    work). tshift_grids: tuple of (ny, nx, F, 2) per pass."""
    F, H, W = frames.shape
    fyg = jnp.fft.fftfreq(tile).astype(jnp.float32)
    fxg = jnp.fft.rfftfreq(tile).astype(jnp.float32)
    out = jnp.zeros((H, W), jnp.float32)
    wsum = jnp.zeros((H, W), jnp.float32)
    for (y0, x0), grid in zip(offs, tshift_grids):
        ny, nx = grid.shape[0], grid.shape[1]
        sub = jax.lax.dynamic_slice(frames, (0, y0, x0),
                                    (F, ny * tile, nx * tile))
        t = sub.reshape(F, ny, tile, nx, tile).transpose(1, 3, 0, 2, 4)

        def row(args):
            tiles_r, s_r = args          # (nx,F,tile,tile), (nx,F,2)
            # s_r is the measured content POSITION at this tile; undoing
            # the motion shifts by -s (same convention as the
            # shift_sum_frames(-pos) global path)
            px = _phase_1d(fxg, -s_r[..., 0])    # (nx,F,K)
            py = _phase_1d(fyg, -s_r[..., 1])    # (nx,F,tile)
            # sum the spectra over frames BEFORE the inverse transform —
            # irfft2 is linear, so this computes the same tile sum with
            # ONE inverse FFT per tile instead of F (the inverse side was
            # half the pass's FFT work; measured r5)
            spec = (jnp.fft.rfft2(tiles_r * win) * py[..., :, None]
                    * px[..., None, :]).sum(axis=1)
            return jnp.fft.irfft2(spec, s=(tile, tile))  # (nx,tile,tile)

        rows = jax.lax.map(row, (t, grid))          # (ny,nx,tile,tile)
        plane = rows.transpose(0, 2, 1, 3).reshape(ny * tile, nx * tile)
        wplane = jnp.tile(win, (ny, nx)) * F
        out = jax.lax.dynamic_update_slice(
            out, jax.lax.dynamic_slice(out, (y0, x0),
                                       (ny * tile, nx * tile)) + plane,
            (y0, x0))
        wsum = jax.lax.dynamic_update_slice(
            wsum, jax.lax.dynamic_slice(wsum, (y0, x0),
                                        (ny * tile, nx * tile)) + wplane,
            (y0, x0))
    return out / jnp.maximum(wsum, 1e-6) * F


def warp_sum_frames_tiled(frames, field, cys, cxs, tile: int = 512,
                          overlap: float = 0.5):
    """Gather-free local-motion correction: overlapping Hann-windowed tiles,
    each Fourier-shifted by the (bilinearly interpolated) local shift at its
    center, blended and summed over frames. The MotionCor2-style warp —
    per-pixel dynamic gathers are ~35x slower than FFT work on TPU, and the
    shift field is smooth at the tile scale by construction (it comes from
    a coarse patch grid)."""
    frames = jnp.asarray(frames, jnp.float32)
    F, H, W = frames.shape
    tile = int(min(tile, H, W))
    step = max(int(tile * (1 - overlap)), 1)
    y0s = list(range(0, max(H - tile, 0) + 1, step))
    x0s = list(range(0, max(W - tile, 0) + 1, step))
    if y0s[-1] != H - tile:
        y0s.append(H - tile)
    if x0s[-1] != W - tile:
        x0s.append(W - tile)
    if len(y0s) == 1 and len(x0s) == 1:
        # one tile covers the whole frame: no seams to blend — a Hann
        # window here would only amplify border noise when divided back out
        win1 = np.ones(tile, np.float32)
    else:
        win1 = np.hanning(tile).astype(np.float32) + 1e-3
    win = jnp.asarray(win1[:, None] * win1[None, :])
    field = np.asarray(field, np.float32)          # (ny, nx, F, 2)
    cys = np.asarray(cys, np.float64)
    cxs = np.asarray(cxs, np.float64)

    def field_at(cy, cx):
        """Bilinear interp of the patch field at one point -> (F, 2)."""
        iy = np.clip(np.searchsorted(cys, cy) - 1, 0, len(cys) - 2)
        ix = np.clip(np.searchsorted(cxs, cx) - 1, 0, len(cxs) - 2)
        ty = np.clip((cy - cys[iy]) / max(cys[iy + 1] - cys[iy], 1e-9), 0, 1)
        tx = np.clip((cx - cxs[ix]) / max(cxs[ix + 1] - cxs[ix], 1e-9), 0, 1)
        f00, f01 = field[iy, ix], field[iy, ix + 1]
        f10, f11 = field[iy + 1, ix], field[iy + 1, ix + 1]
        return ((1 - ty) * ((1 - tx) * f00 + tx * f01)
                + ty * ((1 - tx) * f10 + tx * f11))

    half = tile // 2
    if (overlap == 0.5 and H % tile == 0 and W % tile == 0
            and H > tile and W > tile):
        # 4-pass reshape-batched fast path: identical tile set to the
        # general scan below (offsets {0, tile/2} x {0, tile/2}), each
        # pass one batched FFT op
        offs, grids = [], []
        for y0 in (0, half):
            for x0 in (0, half):
                ny = (H - 2 * y0) // tile
                nx = (W - 2 * x0) // tile
                g = np.stack([[field_at(y0 + i * tile + tile / 2,
                                        x0 + j * tile + tile / 2)
                               for j in range(nx)] for i in range(ny)])
                offs.append((y0, x0))
                grids.append(jnp.asarray(g, jnp.float32))
        return _warp_passes_jit(frames, win, tuple(grids),
                                tuple(offs), tile)

    # gather the per-tile shifts host-side (tiny), run ONE jitted scan over
    # tiles on device (a Python tile loop costs a dispatch round trip per
    # tile through the remote relay)
    origins = np.array([(y0, x0) for y0 in y0s for x0 in x0s], np.int32)
    tshifts = np.stack([field_at(y0 + tile / 2, x0 + tile / 2)
                        for (y0, x0) in origins])          # (T, F, 2)

    @partial(jax.jit, static_argnames=("tile_n",))
    def run(frames, origins, tshifts, tile_n):
        fyg = jnp.fft.fftfreq(tile_n).astype(jnp.float32)
        fxg = jnp.fft.rfftfreq(tile_n).astype(jnp.float32)

        def body(carry, inp):
            out, wsum = carry
            (y0, x0), s = inp
            tiles = jax.lax.dynamic_slice(
                frames, (0, y0, x0), (F, tile_n, tile_n)) * win[None]
            px = _phase_1d(fxg, -s[:, 0])      # (F, K): correct = -position
            py = _phase_1d(fyg, -s[:, 1])      # (F, tile)
            # frame-sum the spectra before the single inverse FFT
            spec = (jnp.fft.rfft2(tiles) * py[:, :, None]
                    * px[:, None, :]).sum(axis=0)
            shifted = jnp.fft.irfft2(spec, s=(tile_n, tile_n))
            cur = jax.lax.dynamic_slice(out, (y0, x0), (tile_n, tile_n))
            out = jax.lax.dynamic_update_slice(out, cur + shifted, (y0, x0))
            curw = jax.lax.dynamic_slice(wsum, (y0, x0), (tile_n, tile_n))
            wsum = jax.lax.dynamic_update_slice(wsum, curw + win * F,
                                                (y0, x0))
            return (out, wsum), None

        init = (jnp.zeros((H, W), jnp.float32),
                jnp.zeros((H, W), jnp.float32))
        (out, wsum), _ = jax.lax.scan(body, init, (origins, tshifts))
        return out / jnp.maximum(wsum, 1e-6) * F

    return run(frames, jnp.asarray(origins), jnp.asarray(tshifts), tile)


@jax.jit
def warp_sum_frames(frames, shift_maps):
    """Warp each frame by its per-pixel shift map (undo local motion), sum.

    shift_maps carry measured content POSITIONS (x, y); the warp samples
    at x + s so content returns to its reference position — the same
    convention as warp_sum_frames_tiled / shift_sum_frames(-pos)."""
    frames = jnp.asarray(frames, jnp.float32)
    F, H, W = frames.shape
    yy = jnp.arange(H, dtype=jnp.float32)[:, None]
    xx = jnp.arange(W, dtype=jnp.float32)[None, :]

    def one(img, smap):
        ys = yy + smap[:, :, 1]
        xs = xx + smap[:, :, 0]
        y0 = jnp.floor(ys).astype(jnp.int32)
        x0 = jnp.floor(xs).astype(jnp.int32)
        fy = ys - y0
        fx = xs - x0

        def tap(dy, dx):
            return img[jnp.clip(y0 + dy, 0, H - 1), jnp.clip(x0 + dx, 0, W - 1)]

        return (tap(0, 0) * (1 - fy) * (1 - fx) + tap(0, 1) * (1 - fy) * fx +
                tap(1, 0) * fy * (1 - fx) + tap(1, 1) * fy * fx)

    return jax.vmap(one)(frames, shift_maps).sum(axis=0)


# ---------------------------------------------------------------------------
# dose weighting (Grant & Grigorieff)
# ---------------------------------------------------------------------------

def dose_filter(n: int, n_frames: int, dose_per_frame: float,
                sampling: float, pre_dose: float = 0.0,
                voltage: float = 300.0):
    """(F, n, n//2+1) frequency weights q = exp(-d / (2 Nc(k))) with the
    published critical-exposure fit Nc(k) = a k^b + c
    (a=0.24499, b=-1.6649, c=2.8141) — reference movie_filter_dose.h:72."""
    fy, fx = freq_grid_2d(n, n)
    k = np.sqrt(fy * fy + fx * fx) / sampling          # 1/Å
    k = np.maximum(k, 1e-6)
    Nc = 0.24499 * k ** (-1.6649) + 2.8141
    if abs(voltage - 200.0) < 50.0:
        Nc = Nc * 0.8       # 200 kV correction factor (Grant & Grigorieff)
    doses = pre_dose + dose_per_frame * (np.arange(n_frames) + 1)
    q = np.exp(-doses[:, None, None] / (2.0 * Nc[None]))
    return jnp.asarray(q, jnp.float32)


# ---------------------------------------------------------------------------
# gain estimation (movie_estimate_gain role, simplified)
# ---------------------------------------------------------------------------

def estimate_gain(frames) -> np.ndarray:
    """Per-pixel inverse gain from temporal statistics: mean frame
    normalized to unit average (reference ProgMovieEstimateGain idea)."""
    mean = np.asarray(frames, np.float32).mean(axis=0)
    m = mean.mean()
    gain = np.where(mean > 1e-6 * m, m / np.maximum(mean, 1e-12), 1.0)
    return gain.astype(np.float32)


def _rank_indices(vals, axis):
    """upper_bound(sorted(vals along axis), v) - 1 for each element v of
    its own row/column (movie_estimate_gain.cpp transformGrayValues*)."""
    s = np.sort(vals, axis=axis)
    if axis == 0:
        idx = np.empty(vals.shape, np.int64)
        for j in range(vals.shape[1]):
            idx[:, j] = np.searchsorted(s[:, j], vals[:, j],
                                        side="right") - 1
    else:
        idx = np.empty(vals.shape, np.int64)
        for i in range(vals.shape[0]):
            idx[i] = np.searchsorted(s[i], vals[i], side="right") - 1
    return s, idx


def _smooth_hist(sorted_h, weights, width, axis, single_ref):
    """Gaussian-smooth the per-row/column sorted histograms across
    neighbouring rows/columns (constructSmoothHistogramsBy*)."""
    out = np.zeros_like(sorted_h)
    wsum = np.zeros(sorted_h.shape[1 - axis], np.float64)
    n = sorted_h.shape[1 - axis]
    for k in range(-width, width + 1):
        w = weights[abs(k)]
        if axis == 0:  # column histograms smoothed across columns j
            src = np.arange(n) + k
            ok = (src >= 0) & (src < n)
            out[:, ok] += w * sorted_h[:, src[ok]]
            wsum[ok] += w
        else:  # row histograms smoothed across rows i
            src = np.arange(n) + k
            ok = (src >= 0) & (src < n)
            out[ok] += w * sorted_h[src[ok]]
            wsum[ok] += w
    out /= wsum[None, :] if axis == 0 else wsum[:, None]
    if single_ref:
        if axis == 0:
            out[:] = out.mean(axis=1, keepdims=True)
        else:
            out[:] = out.mean(axis=0, keepdims=True)
    return out


def estimate_gain_histogram(frames, n_iter: int = 3, sigma: float = -1.0,
                            max_sigma: float = 3.0, sigma_step: float = 0.5,
                            frame_step: int = 1, single_ref: bool = False,
                            gain0=None, verbose: int = 0) -> np.ndarray:
    """Reference ProgMovieEstimateGain::run
    (movie_estimate_gain.cpp:67-530): iterative rank-histogram gain.
    Each frame's per-column/per-row sorted histograms are smoothed across
    neighbouring columns/rows (sigma chosen by minimal total variation if
    sigma<0) and the frame is replaced by the smoothed value at each
    pixel's own rank; the gain is sumIdeal/sumObs, mean-normalized.
    Returns IGain (Observed = Ideal * Gain)."""
    frames = np.asarray(frames, np.float64)
    used = frames[::max(frame_step, 1)]
    igain = np.ones(frames.shape[1:], np.float64) if gain0 is None \
        else np.asarray(gain0, np.float64).copy()
    sum_obs = 2.0 * used.sum(axis=0)
    sigmas = [i * sigma_step
              for i in range(int(max_sigma / sigma_step) + 1)]
    widths = [int(np.ceil(3 * s)) for s in sigmas]
    weights = [np.exp((-0.5 / (s * s) if s > 0 else 0.0)
                      * np.arange(w + 1) ** 2) if s > 0
               else np.ones(w + 1) for s, w in zip(sigmas, widths)]

    def tv(img, axis):
        return np.abs(np.diff(img, axis=axis)).mean()

    for it in range(n_iter):
        sum_ideal = np.zeros_like(sum_obs)
        for f in used:
            ideal = f / igain
            colH, idxC = _rank_indices(ideal, axis=0)
            rowH, idxR = _rank_indices(ideal, axis=1)
            cols = np.arange(ideal.shape[1])[None, :]
            rows = np.arange(ideal.shape[0])[:, None]
            if sigma >= 0:
                s_best = int(np.argmin([abs(s - sigma) for s in sigmas]))
                sC = sR = s_best
            else:
                # TV-minimizing sigma; the rank indices are reused so only
                # the smoothing changes per candidate
                tvC, tvR = [], []
                for s in range(len(sigmas)):
                    sm = _smooth_hist(colH, weights[s], widths[s], 0,
                                      single_ref)
                    tvC.append(tv(sm[idxC, cols], 1))
                    sm = _smooth_hist(rowH, weights[s], widths[s], 1,
                                      single_ref)
                    tvR.append(tv(sm[rows, idxR], 0))
                sC, sR = int(np.argmin(tvC)), int(np.argmin(tvR))
            smR = _smooth_hist(rowH, weights[sR], widths[sR], 1, single_ref)
            sum_ideal += smR[rows, idxR]
            smC = _smooth_hist(colH, weights[sC], widths[sC], 0, single_ref)
            sum_ideal += smC[idxC, cols]
        igain = np.where(np.abs(sum_obs) < 1e-6, 1.0, sum_ideal /
                         np.where(np.abs(sum_obs) < 1e-6, 1.0, sum_obs))
        igain /= igain.mean()
        if verbose:
            print(f"Gain iteration {it}: spread {igain.std():.5f}")
    return igain.astype(np.float32)


# scalar dose-model API (reference ProgMovieFilterDose::doseFilter/
# criticalDose/optimalDoseGivenCriticalDose/initVoltage,
# movie_filter_dose.cpp:85-122; embedded expected values transliterated in
# tests/test_golden_movie_dose.py)

def voltage_scaling_factor(voltage: float) -> float:
    if 299.0 < voltage < 301.0:
        return 1.0
    if 199.0 < voltage < 201.0:
        return 0.8
    raise ValueError("acceleration voltage must be 200 or 300 kV")


def critical_dose(spatial_frequency: float, voltage: float = 300.0) -> float:
    """Nc(k) = (a·k^b + c) · voltage_scale, a=0.24499 b=-1.6649 c=2.8141."""
    return ((0.24499 * spatial_frequency ** (-1.6649) + 2.8141)
            * voltage_scaling_factor(voltage))


def dose_filter_value(dose_at_end_of_frame: float,
                      critical_dose_: float) -> float:
    return float(np.exp(-0.5 * dose_at_end_of_frame / critical_dose_))


def optimal_dose(critical_dose_: float) -> float:
    return 2.51284 * critical_dose_
