"""Monogenic signal + local resolution (MonoRes family).

Replaces the reference data/monogenic_signal.{h,cpp} (monogenic_signal.h:102-156)
and resolution_monogenic_signal.cpp (MonoRes hypothesis testing per frequency,
:349-460): the Riesz transform is three multiplies in Fourier space, the
per-band loop runs a jitted band kernel, and the significance test compares
voxel amplitudes against the noise-amplitude percentile outside the mask.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.fourier import freq_grid_3d


def _riesz_kernels(D, H, W):
    fz, fy, fx = freq_grid_3d(D, H, W)
    r = np.sqrt(fz * fz + fy * fy + fx * fx)
    r = np.where(r == 0, 1.0, r)
    return (fx / r).astype(np.float32), (fy / r).astype(np.float32), \
        (fz / r).astype(np.float32)


@jax.jit
def monogenic_amplitude_3d(vol):
    """sqrt(f^2 + |R f|^2): local amplitude of the monogenic signal."""
    vol = jnp.asarray(vol, jnp.float32)
    D, H, W = vol.shape
    kx, ky, kz = _riesz_kernels(D, H, W)
    F = jnp.fft.rfftn(vol)
    rx = jnp.fft.irfftn(1j * kx * F, s=(D, H, W))
    ry = jnp.fft.irfftn(1j * ky * F, s=(D, H, W))
    rz = jnp.fft.irfftn(1j * kz * F, s=(D, H, W))
    return jnp.sqrt(vol * vol + rx * rx + ry * ry + rz * rz)


@partial(jax.jit, static_argnames=("n_scale",))
def phase_cong_mono(im, n_scale: int = 2, min_wavelength: float = 80.0,
                    mult: float = 1.25, sigma_onf: float = 2.0):
    """2-D monogenic phase congruency (Kovesi-style log-Gabor scales +
    Riesz transform). Reference: data/wavelet.cpp:850-1025 phaseCongMono,
    exercised by test_wavelets_main.cpp on filters/KLH.tif with
    (nScale=2, minWaveLength=80, mult=1.25, sigmaOnf=2).

    Same parameterization and accumulation formulas as the reference
    (butterworth lowpass cutoff .4 order 10, DC radius substituted to 1,
    Or=atan2(h1,h2), Ph=atan2(F,|h|), Energy=sqrt(F^2+h1^2+h2^2)+1e-4),
    but with the Riesz kernel applied in the SAME fft layout as the
    spectrum — the reference multiplies a centered H against an
    uncentered spectrum (wavelet.cpp:965-966), a layout mismatch we do
    not reproduce. Everything stays in fft order: no shifts on device.

    Returns (Ph, Or, Energy) float32 arrays shaped like `im`.
    """
    im = jnp.asarray(im, jnp.float32)
    H, W = im.shape
    wy = jnp.fft.fftfreq(H).astype(jnp.float32)[:, None]
    wx = jnp.fft.fftfreq(W).astype(jnp.float32)[None, :]
    r = jnp.sqrt(wy * wy + wx * wx)
    r0 = jnp.where(r < 1e-10, 1.0, r)            # DC substitution (ref :901)
    lowpass = 1.0 / (1.0 + (r0 / 0.4) ** 10)
    spec = jnp.fft.fft2(im)
    riesz = (wy + 1j * wx) / r0                   # complex built inside jit
    log_so2 = 2.0 * jnp.log(sigma_onf) ** 2
    F = jnp.zeros((H, W), jnp.float32)
    h1 = jnp.zeros((H, W), jnp.float32)
    h2 = jnp.zeros((H, W), jnp.float32)
    for s in range(n_scale):                      # static unroll, tiny
        fo = 1.0 / (min_wavelength * mult ** s)
        lg = jnp.exp(-jnp.log(r0 / fo) ** 2 / log_so2) * lowpass
        bp = spec * lg
        f = jnp.fft.ifft2(bp)
        h = jnp.fft.ifft2(bp * riesz)
        F = F + jnp.real(f)
        h1 = h1 + jnp.real(h)
        h2 = h2 + jnp.imag(h)
    ph = jnp.arctan2(F, jnp.sqrt(h1 * h1 + h2 * h2))
    orient = jnp.arctan2(h1, h2)
    energy = jnp.sqrt(F * F + h1 * h1 + h2 * h2) + 1e-4
    return ph, orient, energy


@partial(jax.jit, static_argnames=())
def bandpass_3d(vol, w1, w2):
    """Raised-cosine bandpass in digital frequency (traced cutoffs)."""
    vol = jnp.asarray(vol, jnp.float32)
    D, H, W = vol.shape
    fz, fy, fx = freq_grid_3d(D, H, W)
    r = jnp.sqrt(fz * fz + fy * fy + fx * fx)
    rw = 0.02
    lo = jnp.clip((r - (w1 - rw)) / rw, 0.0, 1.0)
    hi = jnp.clip(((w2 + rw) - r) / rw, 0.0, 1.0)
    mask = 0.5 * (1 - jnp.cos(jnp.pi * lo)) * 0.5 * (1 - jnp.cos(jnp.pi * hi))
    return jnp.fft.irfftn(jnp.fft.rfftn(vol) * mask, s=(D, H, W))


@partial(jax.jit, static_argnames=("significance", "has_noise_vol",
                                   "noise_in_mask", "gaussian"))
def _monores_bands(vol_j, noise_j, mask_j, noise_region_j, freqs_j,
                   significance, has_noise_vol, noise_in_mask, gaussian):
    """Per-band monogenic hypothesis test, fully on device: band mask from
    the frequency radius grid, amplitude via 4 inverse FFTs
    (resolution_monogenic_signal.cpp:349-460).

    Noise model (reference flags):
    - default: noise = signal amplitudes in ``noise_region_j`` (outside the
      mask minus any ``--maskExcl`` region);
    - ``has_noise_vol`` (two half maps): noise = amplitudes of the
      half-difference map, over the same region — or inside the mask when
      ``noise_in_mask`` (``--noiseonlyinhalves``);
    - threshold = significance percentile of the noise (exact empirical
      distribution) or mean + z_crit*std when ``gaussian``."""
    D, H, W = vol_j.shape
    fz = jnp.fft.fftfreq(D).astype(jnp.float32)[:, None, None]
    fy = jnp.fft.fftfreq(H).astype(jnp.float32)[None, :, None]
    fx = jnp.fft.rfftfreq(W).astype(jnp.float32)[None, None, :]
    r = jnp.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
    rr = jnp.maximum(r, 1e-12)
    uz, uy, ux = fz / rr, fy / rr, fx / rr
    F = jnp.fft.rfftn(vol_j)
    FN = jnp.fft.rfftn(noise_j) if has_noise_vol else None
    nvox = D * H * W
    region = mask_j if (has_noise_vol and noise_in_mask) else noise_region_j
    n_noise = region.sum()
    # ascending sort puts non-region (-inf) voxels first; the noise block
    # is the trailing n_noise entries
    k_idx = (nvox - n_noise
             + (significance * (n_noise - 1)).astype(jnp.int32))
    # one-sided critical z for the gaussian noise model (norm.ppf via
    # erfinv; reference icdf_gauss)
    z_crit = jnp.sqrt(2.0) * jax.scipy.special.erfinv(
        2.0 * significance - 1.0)

    def amplitude(Fv, bmask):
        Fb = Fv * bmask
        band = jnp.fft.irfftn(Fb, s=(D, H, W))
        rx = jnp.fft.irfftn(1j * ux * Fb, s=(D, H, W))
        ry = jnp.fft.irfftn(1j * uy * Fb, s=(D, H, W))
        rz = jnp.fft.irfftn(1j * uz * Fb, s=(D, H, W))
        return jnp.sqrt(band ** 2 + rx ** 2 + ry ** 2 + rz ** 2)

    def one(f):
        bmask = ((r >= jnp.maximum(f - 0.02, 0.001))
                 & (r <= jnp.minimum(f + 0.02, 0.5))).astype(jnp.float32)
        amp = amplitude(F, bmask)
        amp_n = amplitude(FN, bmask) if has_noise_vol else amp
        noise = jnp.where(region, amp_n, -jnp.inf).ravel()
        if gaussian:
            cnt = jnp.maximum(n_noise, 1)
            mean_n = jnp.sum(jnp.where(region, amp_n, 0.0)) / cnt
            var_n = jnp.sum(jnp.where(region,
                                      (amp_n - mean_n) ** 2, 0.0)) / cnt
            thresh = mean_n + z_crit * jnp.sqrt(var_n)
        else:
            thresh = jnp.sort(noise)[jnp.clip(k_idx, 0, nvox - 1)]
        return mask_j & (amp > thresh)

    resolved = jax.lax.map(one, freqs_j)              # (K, D, H, W) bool
    mono = jnp.cumprod(resolved.astype(jnp.int32), axis=0)
    count = mono.sum(axis=0)                          # bands resolved
    frac = mono.sum(axis=(1, 2, 3)) / jnp.maximum(mask_j.sum(), 1)
    return count, frac


def local_resolution_monores(vol, mask, sampling: float,
                             min_res: float | None = None,
                             max_res: float | None = None,
                             n_freqs: int = 30,
                             significance: float = 0.95,
                             noise_vol=None,
                             mask_excl=None,
                             noise_only_in_halves: bool = False,
                             gaussian: bool = False,
                             step: float | None = None):
    """MonoRes local resolution map.

    For each tested frequency band, voxels whose monogenic amplitude exceeds
    the `significance` percentile of the noise amplitude (outside the mask)
    are deemed resolved at that frequency. Returns (res_map Å, freqs, frac
    resolved per freq)."""
    vol = np.asarray(vol, np.float32)
    mask = np.asarray(mask) > 0.5
    D, H, W = vol.shape
    if min_res is None:
        min_res = D * sampling / 3
    if max_res is None:
        max_res = 2.2 * sampling
    f_lo = sampling / min_res
    f_hi = min(sampling / max_res, 0.45)
    if step is not None and step > 0:
        # reference semantics: resolutions swept from minRes down to
        # maxRes in steps of `step` Angstroms (--step)
        res_list = np.arange(min_res, max(max_res, sampling / 0.45),
                             -step, dtype=np.float32)
        freqs = np.clip(sampling / res_list, f_lo, f_hi).astype(np.float32)
        freqs = np.unique(freqs)
    else:
        freqs = np.linspace(f_lo, f_hi, n_freqs).astype(np.float32)

    # ONE forward FFT; every band is a mask-multiply + batched inverse
    # FFTs (the round-1 loop recomputed rfftn(vol) and three Riesz FFT
    # pairs per band — 30x redundant transforms), and the monotonic
    # resolution assignment runs on-device as a cumulative product.
    # Band masks and the noise percentile are built ON DEVICE inside one
    # module-level jit: the former per-call closure retraced every call
    # and shipped a dense (K, D, H, Wh) band stack (54 MB at 96^3) plus a
    # noise-index vector through the host->device link each invocation.
    noise_region = ~mask
    if mask_excl is not None:
        noise_region = noise_region & ~(np.asarray(mask_excl) > 0.5)
    has_noise = noise_vol is not None
    noise_j = jnp.asarray(np.asarray(noise_vol, np.float32)) if has_noise \
        else jnp.asarray(vol)
    count, frac = _monores_bands(jnp.asarray(vol), noise_j,
                                 jnp.asarray(mask),
                                 jnp.asarray(noise_region),
                                 jnp.asarray(freqs), float(significance),
                                 has_noise, bool(noise_only_in_halves),
                                 bool(gaussian))
    count = np.asarray(count)
    res_map = np.full(vol.shape, min_res, np.float32)
    sel = count > 0
    res_map[sel] = sampling / freqs[count[sel] - 1]
    return res_map, freqs, np.asarray(frac)


def fso_directional(vol1, vol2, sampling: float, n_dirs: int = 60,
                    cone_deg: float = 20.0, threshold: float = 0.143,
                    compute_3dfsc: bool = False):
    """Fourier Shell Occupancy: fraction of directions whose conical FSC
    stays above threshold, per shell (reference resolution_fso.h:38).

    With ``compute_3dfsc`` also returns the 3DFSC volume (per-voxel mean
    of the directional FSC over all cones containing the voxel, rfftn
    layout) and the anisotropically filtered map
    irfftn(mean(F1,F2) * 3DFSC) — reference --threedfsc_filter."""
    from xmipp3_tpu.core.sampling import compute_sampling_points, \
        directions_from_angles
    vol1 = jnp.asarray(vol1, jnp.float32)
    vol2 = jnp.asarray(vol2, jnp.float32)
    D, H, W = vol1.shape
    nbins = D // 2
    F1 = jnp.fft.rfftn(vol1)
    F2 = jnp.fft.rfftn(vol2)
    fz, fy, fx = freq_grid_3d(D, H, W)
    r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
    bins = np.minimum((r / 0.5 * nbins).astype(np.int32), nbins - 1)
    rr = np.where(r == 0, 1.0, r)
    un = np.stack([(fx / rr), (fy / rr), (fz / rr)], axis=-1)  # (D,H,Wh,3)

    angles = compute_sampling_points(180.0 / np.sqrt(n_dirs))
    dirs = directions_from_angles(angles)
    # half sphere (FSC cones symmetric)
    dirs = dirs[dirs[:, 2] >= 0][:n_dirs]
    cos_cone = np.cos(np.deg2rad(cone_deg))

    cross = np.asarray(jnp.real(F1 * jnp.conj(F2)))
    p1 = np.asarray(jnp.abs(F1) ** 2)
    p2 = np.asarray(jnp.abs(F2) ** 2)

    bins_flat = bins.ravel()
    above = np.zeros((len(dirs), nbins), bool)
    if compute_3dfsc:
        w_sum = np.zeros(bins_flat.shape, np.float64)
        w_cnt = np.zeros(bins_flat.shape, np.float64)
    for i, d in enumerate(dirs):
        cosang = np.abs(un @ d)
        sel = (cosang >= cos_cone).ravel()
        b = bins_flat[sel]
        num = np.bincount(b, cross.ravel()[sel], minlength=nbins)
        d1 = np.bincount(b, p1.ravel()[sel], minlength=nbins)
        d2 = np.bincount(b, p2.ravel()[sel], minlength=nbins)
        fsc_d = num / np.maximum(np.sqrt(d1 * d2), 1e-12)
        above[i] = fsc_d > threshold
        if compute_3dfsc:
            w_sum[sel] += np.clip(fsc_d, 0.0, 1.0)[b]
            w_cnt[sel] += 1.0
    fso = above.mean(axis=0)
    freqs = (np.arange(nbins) + 0.5) * (0.5 / nbins)
    if not compute_3dfsc:
        return freqs, fso
    fsc3d = (w_sum / np.maximum(w_cnt, 1.0)).reshape(bins.shape)
    fsc3d[r == 0] = 1.0
    fmean = 0.5 * (np.asarray(F1) + np.asarray(F2))
    filtered = np.fft.irfftn(fmean * fsc3d, s=(D, H, W)).astype(np.float32)
    return freqs, fso, fsc3d.astype(np.float32), filtered


def local_filter_by_resolution(vol, res_map, sampling: float,
                               n_bands: int = 12):
    """Locally low-pass filter a map according to a local-resolution map
    (reference resolution_localfilter / LocalDeblur application step):
    each voxel takes its value from the band-limited version matching its
    local resolution (piecewise over n_bands)."""
    vol = np.asarray(vol, np.float32)
    res_map = np.asarray(res_map, np.float32)
    lo, hi = np.percentile(res_map, [2, 98])
    lo = max(lo, 2.0 * sampling)
    bands = np.linspace(lo, max(hi, lo + 1e-3), n_bands)
    out = np.zeros_like(vol)
    assigned = np.zeros(vol.shape, bool)
    for res in bands:
        f = sampling / res
        filtered = np.asarray(bandpass_3d(vol, 0.0, f))
        sel = (~assigned) & (res_map <= res)
        out[sel] = filtered[sel]
        assigned |= sel
    f_last = sampling / bands[-1]
    filtered = np.asarray(bandpass_3d(vol, 0.0, f_last))
    out[~assigned] = filtered[~assigned]
    return out
