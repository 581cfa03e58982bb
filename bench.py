"""Benchmarks over the BASELINE.md staged configs, with roofline context.

Prints ONE JSON line. The top-level fields keep the round-1 headline metric
(config 4, projection matching) for continuity; the `configs` object carries
every staged BASELINE config with its own value/unit plus model-FLOP
utilization (`mfu`, fraction of the v5e bf16 matmul roofline 197 TFLOP/s —
conservative: f32 work is charged against the bf16 peak) or HBM utilization
(`hbm_util`, fraction of 819 GB/s) for bandwidth-bound stages.

Baselines:
- config 1 compares against `_ref_cpu_align_numpy`, a numpy transliteration
  of the REFERENCE inner loop (per-image FFT bestShift + polar ring-FFT
  rotation search, the structure of data/filters.cpp bestShift +
  polar.cpp rotationalCorrelation) — a reference-representative serial CPU
  implementation, not the same JAX program.
- config 4 keeps the same-pipeline-on-host-CPU ratio (labelled as such).
Baselines are measured once and cached in bench_baseline.json.
"""
from __future__ import annotations

import json
import os
import sys
import time

import numpy as np

PEAK_FLOPS = 197e12          # v5e bf16 MXU roofline (f32 charged against it)
PEAK_HBM = 819e9             # v5e HBM bandwidth

_CACHE = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                      "bench_baseline.json")


def _cache_get(key):
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            return json.load(f).get(key)
    return None


def _cache_put(key, value):
    data = {}
    if os.path.exists(_CACHE):
        with open(_CACHE) as f:
            data = json.load(f)
    data[key] = value
    with open(_CACHE, "w") as f:
        json.dump(data, f, indent=1)


def _sync(x):
    return np.asarray(__import__("jax").numpy.sum(x))


def _cpp_baseline(symbol: str, args=(), repeats: int = 3):
    """Measured compiled-C++ reference-loop baseline (VERDICT r4 #2).

    Builds native/libxmipp3_cpubase.so (OpenMP -O3 transliterations of the
    reference's serial hot loops, native/cpu_baselines.cpp) and calls
    `symbol`, taking the MIN over `repeats` runs — this host is a shared
    1-core VM with heavy CPU steal, so the minimum is the closest estimate
    of true hardware capability. Returns (seconds_per_item, n_threads) or
    (None, 0) if the toolchain is unavailable. Results cached in
    bench_baseline.json keyed by symbol+args."""
    import ctypes
    import subprocess
    key = f"cpp_{symbol}_{'_'.join(map(str, args))}"
    cached = _cache_get(key)
    if cached is not None:
        return cached[0], cached[1]
    native = os.path.join(os.path.dirname(os.path.abspath(__file__)),
                          "xmipp3_tpu", "native")
    lib = os.path.join(native, "libxmipp3_cpubase.so")
    if not os.path.exists(lib):
        try:
            subprocess.run(["make", "-C", native, "libxmipp3_cpubase.so"],
                           check=True, capture_output=True)
        except Exception:
            return None, 0
    dll = ctypes.CDLL(lib)
    fn = getattr(dll, symbol)
    fn.restype = ctypes.c_double
    fn.argtypes = [ctypes.c_int] * len(args)
    best = min(fn(*args) for _ in range(repeats))
    threads = int(dll.cpu_baseline_threads())
    _cache_put(key, [best, threads])
    return best, threads


# ---------------------------------------------------------------------------
# config 1: transform_filter + image_align on a 64^2 stack
# ---------------------------------------------------------------------------

def _ref_cpu_align_numpy(refs, imgs, n_meas=24):
    """Reference-representative serial CPU loop: per image, FFT cross-power
    bestShift + polar ring FFT rotation search (structure of the reference
    CPU path: data/filters.cpp bestShift, data/polar.cpp
    rotationalCorrelation), in numpy (C FFT backend, like FFTW)."""
    from scipy.ndimage import map_coordinates
    n = imgs.shape[-1]
    ref = refs[0]
    Fr = np.fft.rfft2(ref)
    rmin, rmax = 2, n // 2 - 2
    nang = 128
    theta = 2 * np.pi * np.arange(nang) / nang
    rr = np.arange(rmin, rmax + 1)
    yy = n // 2 + rr[:, None] * np.sin(theta)[None, :]
    xx = n // 2 + rr[:, None] * np.cos(theta)[None, :]
    pol_ref = map_coordinates(ref, [yy, xx], order=1)
    Fpr = np.fft.rfft(pol_ref, axis=1)
    t0 = time.time()
    for i in range(n_meas):
        img = imgs[i]
        # bestShift: cross-power + argmax
        Fi = np.fft.rfft2(img)
        cc = np.fft.irfft2(Fi * np.conj(Fr), s=img.shape)
        np.unravel_index(np.argmax(cc), cc.shape)
        # rotation: polar rings + per-ring FFT correlation
        pol = map_coordinates(img, [yy, xx], order=1)
        Fp = np.fft.rfft(pol, axis=1)
        curve = np.fft.irfft((Fp * np.conj(Fpr)).sum(axis=0), n=nang)
        int(np.argmax(curve))
    return n_meas / (time.time() - t0)


def bench_filter_align():
    import jax
    import jax.numpy as jnp
    from xmipp3_tpu.ops.align import iterative_align
    from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                               low_pass_mask)
    n, B = 64, 2048
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
    ref = np.exp(-(x ** 2 + y ** 2) / 40) + \
        0.5 * np.exp(-((x - 8) ** 2 + y ** 2) / 12)
    imgs = (ref[None] + 0.5 * rng.standard_normal((B, n, n))) \
        .astype(np.float32)

    lp = jnp.asarray(np.asarray(low_pass_mask(n, n, 0.25)))

    @jax.jit
    def pipeline(imgs):
        filt = apply_fourier_mask_2d(imgs, lp)
        psi, sx, sy, corr, _ = iterative_align(jnp.asarray(ref), filt,
                                               n_iters=2, max_shift=6)
        return psi

    d = jax.device_put(jnp.asarray(imgs))
    out = pipeline(d)
    _sync(out)
    t0 = time.time()
    reps = 4
    for _ in range(reps):
        out = pipeline(d)
    _sync(out)
    dt = (time.time() - t0) / reps
    rate = B / dt
    # FLOP model per image: filter rfft2+mask+irfft2 (~3*5*N^2*log2 N^2) +
    # per align iter: polar gather+ring ffts + corr (~dominated by FFTs).
    # NOTE: these pipelines are FFT/gather-bound — the MXU is mostly idle,
    # so low mfu here is expected; it is reported for honesty, not tuning.
    flops_img = 3 * 5 * n * n * np.log2(n * n) * (1 + 2 * 2)
    mfu = rate * flops_img / PEAK_FLOPS
    base = _cache_get("ref_cpu_align_64")
    if base is None:
        base = _ref_cpu_align_numpy(ref[None], imgs)
        _cache_put("ref_cpu_align_64", base)
    # per-stage bound analysis (VERDICT r4 #9; full tool:
    # tools/ablate_config1.py). Stages re-jitted standalone, so their sum
    # exceeds the fused FULL time — the deltas name the bound.
    from xmipp3_tpu.ops.align import (_iterative_align_refine,
                                      rotation_from_fourier_mag)

    def _stage_ms(fn, *a, reps=4):
        o = fn(*a)
        _sync(o if not isinstance(o, tuple) else o[0])
        t0 = time.time()
        for _ in range(reps):
            o = fn(*a)
        _sync(o if not isinstance(o, tuple) else o[0])
        return round((time.time() - t0) / reps * 1e3, 2)

    zeros = jnp.zeros(B)
    ablation = {
        "filter_ms": _stage_ms(jax.jit(
            lambda im: apply_fourier_mask_2d(im, lp)), d),
        "rotmag_ms": _stage_ms(jax.jit(
            lambda im: rotation_from_fourier_mag(jnp.asarray(ref), im)[0]),
            d),
        "refine2_ms": _stage_ms(jax.jit(
            lambda im: _iterative_align_refine(
                jnp.asarray(ref), im, zeros, zeros, zeros, 2, 6, 2,
                n // 2 - 2, 1)[0]), d),
        "full_ms": round(dt * 1e3, 2),
    }
    out = dict(value=round(rate, 1), unit="images/s/chip",
               mfu=round(mfu, 5),
               vs_baseline=round(rate / base, 1),
               stage_ablation=ablation,
               bound="latency-bound small-FFT pipeline; r5 moved "
                     "filter/best_shift/ring FFTs/logmag to matmul DFTs "
                     "(ops/dft_mm.py) and halved refine rotations "
                     "(Jacobi update): 41.9k -> ~86k img/s on v5e",
               baseline="numpy transliteration of the reference serial "
                        "bestShift+rotationalCorrelation loop")
    cpp_s, thr = _cpp_baseline("cpu_align64_per_image", (512,))
    if cpp_s:
        out["vs_cpp"] = round(rate * cpp_s, 1)
        out["cpp_threads"] = thr
        out["cpp_images_per_s"] = round(1.0 / cpp_s, 1)
    return out


# ---------------------------------------------------------------------------
# config 2: ctf_estimate (periodogram + staged full-model fit)
# ---------------------------------------------------------------------------

def _ref_cpu_ctf_numpy(mic, Ts=1.5):
    """Reference-representative serial CPU CTF pipeline: numpy periodogram
    averaging (the structure of PSDEstimator, psd_estimator.cpp:74) +
    staged scipy Powell fit of the same anisotropic model (the structure
    of ROUT_Adjust_CTF's staged minimizations; iteration counts here are
    CONSERVATIVE — the reference runs more stages/evals, so this
    underestimates the reference's time). Returns seconds/micrograph."""
    import scipy.optimize
    t0 = time.time()
    n, piece = mic.shape[0], 512
    step = piece // 2
    acc = np.zeros((piece, piece // 2 + 1), np.float64)
    cnt = 0
    for y0 in range(0, n - piece + 1, step):
        for x0 in range(0, n - piece + 1, step):
            t = mic[y0:y0 + piece, x0:x0 + piece]
            t = t - t.mean()
            F = np.fft.rfft2(t * np.hanning(piece)[:, None]
                             * np.hanning(piece)[None, :])
            acc += (F.real ** 2 + F.imag ** 2)
            cnt += 1
    psd = (acc / cnt).astype(np.float64)
    fy = np.fft.fftfreq(piece)[:, None] / Ts
    fx = np.fft.rfftfreq(piece)[None, :] / Ts
    f2 = fx * fx + fy * fy
    band = (np.sqrt(f2) * Ts >= 0.03) & (np.sqrt(f2) * Ts <= 0.35)
    lam = 12.2643247 / np.sqrt(300e3 * (1 + 300e3 * 0.978466e-6))
    lp = np.log(np.maximum(psd, 1e-30))

    def fitness(p):
        defU, defV, ang, base, k, sb, ke = p
        a = np.arctan2(fy, np.maximum(fx, 1e-12))
        d = 0.5 * (defU + defV) + 0.5 * (defU - defV) * np.cos(
            2 * (a - np.radians(ang)))
        chi = np.pi * lam * d * f2 - 0.5 * np.pi * 2.7e7 * lam ** 3 * f2 ** 2
        ctf2 = (np.sin(chi + 0.07) ** 2) * np.exp(-ke * f2)
        model = np.log(np.maximum(base + sb * np.exp(-f2 * 40)
                                  + k * ctf2, 1e-30))
        return float(((model - lp) ** 2 * band).sum())

    p = np.array([15000.0, 15000.0, 0.0, np.exp(lp[band]).mean(),
                  np.exp(lp[band]).std(), 1.0, 10.0])
    # staged: defocus grid (coarse, the reference's exhaustive first
    # stage) then two Powell passes
    best = None
    for dU in np.arange(5000, 30000, 1000.0):
        c = fitness([dU, dU, 0, p[3], p[4], p[5], p[6]])
        if best is None or c < best[0]:
            best = (c, dU)
    p[0] = p[1] = best[1]
    for _ in range(2):
        p = scipy.optimize.fmin_powell(fitness, p, maxiter=2, disp=False)
    return time.time() - t0


def bench_ctf_estimate():
    from xmipp3_tpu.models.ctf_estimation import CTFEstimator
    from xmipp3_tpu.ops.ctf import CTFDescription
    rng = np.random.default_rng(1)
    true = CTFDescription(sampling_rate=1.5, voltage=300, Cs=2.7, Q0=0.07,
                          defocusU=17000, defocusV=14000,
                          azimuthal_angle=30.0, K=1.0)
    mic = rng.standard_normal((2048, 2048)).astype(np.float32)
    # shape the noise with the CTF on the HOST (numpy FFT): device eager
    # complex ops are an axon platform quirk and data-gen is not the
    # thing being measured
    n = 2048
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / 1.5
    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / 1.5
    h = np.asarray(true.pure_at(fx, fy))
    mic = np.fft.irfft2(np.fft.rfft2(mic) * h, s=mic.shape) \
        .astype(np.float32)
    from xmipp3_tpu.ops.psd import estimate_psd

    def fit_once():
        t0 = time.time()
        psd = np.asarray(estimate_psd(mic, 512, 0.5))
        est = CTFEstimator(psd, 1.5, 300, 2.7, 0.07)
        return est.estimate(), time.time() - t0

    ctf, dt_cold = fit_once()       # includes compile through the tunnel
    ctf, dt = fit_once()            # warm steady-state (the number that
                                    # matters for an on-the-fly pipeline)
    errU = abs(ctf.defocusU - 17000) / 17000
    errV = abs(ctf.defocusV - 14000) / 14000
    errA = abs((ctf.azimuthal_angle - 30.0 + 90) % 180 - 90)

    # batched-production path: B micrographs through ONE lockstep staged
    # fit (models.ctf_estimation.estimate_ctf_batch) — the per-stage
    # relay/dispatch latency amortizes B ways
    from xmipp3_tpu.models.ctf_estimation import estimate_ctf_batch
    B = 16
    true_defs = [(17000 - 600 * i, 14000 - 450 * i, 30.0 + 8 * i)
                 for i in range(B)]
    psds = []
    for (dU, dV, ang) in true_defs:
        t = CTFDescription(sampling_rate=1.5, voltage=300, Cs=2.7, Q0=0.07,
                           defocusU=dU, defocusV=dV, azimuthal_angle=ang,
                           K=1.0)
        m = rng.standard_normal((2048, 2048)).astype(np.float32)
        h_i = np.asarray(t.pure_at(fx, fy))
        m = np.fft.irfft2(np.fft.rfft2(m) * h_i, s=m.shape) \
            .astype(np.float32)
        psds.append(np.asarray(estimate_psd(m, 512, 0.5)))

    def fit_batch():
        t0 = time.time()
        ctfs = estimate_ctf_batch(psds, 1.5, 300, 2.7, 0.07)
        return ctfs, time.time() - t0

    ctfs, dtb_cold = fit_batch()
    ctfs, dtb = fit_batch()
    errU_b = max(abs(c.defocusU - d[0]) / d[0]
                 for c, d in zip(ctfs, true_defs))
    errA_b = max(abs((c.azimuthal_angle - d[2] + 90) % 180 - 90)
                 for c, d in zip(ctfs, true_defs))
    base = _cache_get("ref_cpu_ctf_2048")
    if base is None:
        base = _ref_cpu_ctf_numpy(mic)
        _cache_put("ref_cpu_ctf_2048", base)
    return dict(value=round(B / dtb, 3), unit="micrographs/s/chip",
                seconds_warm_batch16=round(dtb, 2),
                seconds_warm_single=round(dt, 2),
                seconds_cold=round(dt_cold + dtb_cold, 2),
                defocusU_err=round(max(errU, errU_b), 4),
                defocusV_err=round(errV, 4),
                angle_err_deg=round(max(errA, errA_b), 2),
                vs_baseline=round(B * base / dtb, 1),
                baseline="numpy periodogram + staged scipy-Powell fit of "
                         "the same model (conservative transliteration of "
                         "the reference serial ROUT_Adjust_CTF loop), "
                         "per-micrograph")


# ---------------------------------------------------------------------------
# config 3: reconstruct_fourier 10k -> 128^3
# ---------------------------------------------------------------------------

def _ref_cpu_gridding_numpy(nimg_meas=64, N=128, Pq=256):
    """Reference-representative serial gridding loop in numpy: per image,
    rfft2 + per-sample trilinear scatter into the padded cube with
    np.add.at (the atomic-add structure of the reference's serial
    backprojection, reconstruct_fourier.cpp:474-531). Returns seconds
    per `nimg_meas` images (extrapolate linearly)."""
    from xmipp3_tpu.core.geometry import euler_matrix
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((nimg_meas, N, N)).astype(np.float32)
    rot = rng.uniform(0, 360, nimg_meas)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, nimg_meas)))
    psi = rng.uniform(0, 360, nimg_meas)
    mats = np.asarray(euler_matrix(rot.astype(np.float32),
                                   tilt.astype(np.float32),
                                   psi.astype(np.float32)), np.float64)
    fy = np.fft.fftfreq(N)[:, None]
    fx = np.fft.rfftfreq(N)[None, :]
    keep = np.sqrt(fy * fy + fx * fx) <= 0.5
    ky, kx = np.nonzero(keep)
    fyk, fxk = fy[ky, 0], fx[0, kx]
    cube_r = np.zeros((Pq, Pq, Pq), np.float32)
    cube_w = np.zeros((Pq, Pq, Pq), np.float32)
    t0 = time.time()
    for i in range(nimg_meas):
        spec = np.fft.rfft2(np.fft.ifftshift(imgs[i]))[ky, kx]
        A = mats[i]
        # slice coords in the padded cube
        zc = (A[2, 0] * fxk + A[2, 1] * fyk) * Pq + Pq // 2
        yc = (A[1, 0] * fxk + A[1, 1] * fyk) * Pq + Pq // 2
        xc = (A[0, 0] * fxk + A[0, 1] * fyk) * Pq + Pq // 2
        z0, y0, x0 = np.floor(zc).astype(int), np.floor(yc).astype(int), \
            np.floor(xc).astype(int)
        fz, fyw, fxw = zc - z0, yc - y0, xc - x0
        sr = spec.real.astype(np.float32)
        for dz in (0, 1):
            for dy in (0, 1):
                for dx in (0, 1):
                    w = ((fz if dz else 1 - fz) * (fyw if dy else 1 - fyw)
                         * (fxw if dx else 1 - fxw)).astype(np.float32)
                    zi = np.clip(z0 + dz, 0, Pq - 1)
                    yi = np.clip(y0 + dy, 0, Pq - 1)
                    xi = np.clip(x0 + dx, 0, Pq - 1)
                    np.add.at(cube_r, (zi, yi, xi), w * sr)
                    np.add.at(cube_w, (zi, yi, xi), w)
    return time.time() - t0


def bench_reconstruct(interp="tri+kb", nimg=10000):
    import jax
    import jax.numpy as jnp
    from xmipp3_tpu.core.geometry import euler_matrix
    from xmipp3_tpu.ops.reconstruct import (_taps, backproject_chunk,
                                            backproject_chunk_packed,
                                            finalize_volume)
    from xmipp3_tpu.ops.pallas_scatter_tri import (packed_cube_alloc,
                                                   packed_cube_unpack,
                                                   tri_fastpath_ok)
    N, BATCH, Pq = 128, 256, 256
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((BATCH, N, N)).astype(np.float32)
    rot = rng.uniform(0, 360, nimg).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, nimg))).astype(np.float32)
    psi = rng.uniform(0, 360, nimg).astype(np.float32)
    mats_all = np.asarray(euler_matrix(rot, tilt, psi), np.float32)
    nb = nimg // BATCH
    mats_d = jax.device_put(jnp.asarray(
        mats_all[: nb * BATCH].reshape(nb, BATCH, 3, 3)))
    imgs_d = jax.device_put(jnp.asarray(imgs))
    z = jnp.zeros(BATCH)
    w1 = jnp.ones(BATCH)
    packed_ok = interp in ("tri", "tri+kb") and tri_fastpath_ok(Pq) and \
        jax.default_backend() == "tpu"
    if packed_ok:
        # round-3 packed path: raw-sample sort + packed-channel kernel
        packed = packed_cube_alloc(Pq)
        packed = backproject_chunk_packed(packed, imgs_d, mats_d[0], z, z,
                                          w1, Pq, 0.5)
        _sync(packed)
        packed = packed_cube_alloc(Pq)
        t0 = time.time()
        for b in range(nb):
            packed = backproject_chunk_packed(packed, imgs_d, mats_d[b],
                                              z, z, w1, Pq, 0.5)
        _sync(packed)
        t_bp = time.time() - t0
        dr, di, dw = packed_cube_unpack(packed, Pq)
    else:
        dr = jnp.zeros((Pq, Pq, Pq), jnp.float32)
        di = jnp.zeros_like(dr)
        dw = jnp.zeros_like(dr)
        dr, di, dw = backproject_chunk(dr, di, dw, imgs_d, mats_d[0], z, z,
                                       w1, Pq, 0.5, interp=interp)
        _sync(dw)
        dr = jnp.zeros_like(dr)
        di = jnp.zeros_like(di)
        dw = jnp.zeros_like(dw)
        t0 = time.time()
        for b in range(nb):
            dr, di, dw = backproject_chunk(dr, di, dw, imgs_d, mats_d[b],
                                           z, z, w1, Pq, 0.5, interp=interp)
        _sync(dw)
        t_bp = time.time() - t0
    vol = finalize_volume(dr, di, dw, N, Pq, interp=interp)
    _sync(vol)
    t0 = time.time()
    vol = finalize_volume(dr, di, dw, N, Pq, interp=interp)
    _sync(vol)
    t_fin = time.time() - t0
    tot = t_bp + t_fin
    samples = 6490  # disk samples per image at max_freq 0.5
    taps = len(_taps(interp))
    upd = nb * BATCH * samples * taps * 3          # 3 channels
    # scatter pipeline HBM model: sort (~4 passes of 16B/update) +
    # kernel streams (idx+3vals read + tile write-through)
    bytes_moved = upd / 3 * (4 * 16 + 16 + 16)
    base = _cache_get("ref_cpu_gridding_64img")
    if base is None:
        base = _ref_cpu_gridding_numpy(64)
        _cache_put("ref_cpu_gridding_64img", base)
    ref_total = base * nimg / 64.0
    out = dict(value=round(tot, 2), unit=f"s per 10k->128^3 ({interp})",
               images_per_s=round(nimg / tot, 0),
               updates_per_s=round(upd / t_bp, 0),
               hbm_util=round(bytes_moved / t_bp / PEAK_HBM, 4),
               vs_baseline=round(ref_total / tot, 1),
               baseline="numpy transliteration of the reference serial "
                        "trilinear gridding loop (np.add.at atomics), "
                        "64 images measured, extrapolated linearly",
               note="Pallas raw-sample-sorted packed tri kernel (round 3); "
                    "tri+kb = trilinear scatter + dense blob convolution "
                    "(KB-grade FSC; see tests/test_reconstruct_quality). "
                    "Round-1 XLA scatter path took 19.7 s, round-2 4.44 s",
               stage_ablation={"prep_ms": 7.3, "sort_ms": 12.7,
                               "kernel_ms": 53.6,
                               "bound": "kernel (VPU one-hot construction; "
                                        "73% of the standalone stage sum)",
                               "measured_by": "tools/ablate_config3.py, "
                                              "v5e, 256-img batch; "
                                              "standalone re-jits, sum > "
                                              "fused pipeline (overlap)"})
    cpp_s, thr = _cpp_baseline("cpu_gridding_per_image", (16,))
    if cpp_s:
        out["vs_cpp"] = round(cpp_s * nimg / tot, 1)
        out["cpp_threads"] = thr
        out["cpp_s_total"] = round(cpp_s * nimg, 1)
    if interp == "tri+kb":
        # also record the reference-exact direct-KB mode (fused in-kernel
        # 64-tap expansion, ops/pallas_scatter_kb.py)
        kb = bench_reconstruct(interp="kb", nimg=nimg)
        out["direct_kb_s"] = kb["value"]
    return out


# ---------------------------------------------------------------------------
# config 4: projection matching (round-1 headline, kept verbatim)
# ---------------------------------------------------------------------------

def _ref_cpu_match_numpy(refs, imgs, n_meas=4):
    """Reference-representative serial projection matching in numpy: per
    particle, translational FFT cross-correlation against EVERY gallery
    reference + polar ring-FFT rotational correlation (the structure of
    the reference's CPU projection_matching loop,
    angular_projection_matching.cpp; FFTW-backed there, numpy C FFT here).
    Returns particles/s (measured on n_meas particles)."""
    from scipy.ndimage import map_coordinates
    n = imgs.shape[-1]
    R = len(refs)
    Frefs = np.fft.rfft2(refs)
    rmin, rmax = 2, n // 2 - 2
    nang = 128
    theta = 2 * np.pi * np.arange(nang) / nang
    rr = np.arange(rmin, rmax + 1)
    yy = n // 2 + rr[:, None] * np.sin(theta)[None, :]
    xx = n // 2 + rr[:, None] * np.cos(theta)[None, :]
    Fpol_refs = np.stack([np.fft.rfft(map_coordinates(r, [yy, xx], order=1),
                                      axis=1) for r in refs])
    t0 = time.time()
    for i in range(n_meas):
        img = imgs[i]
        Fi = np.fft.rfft2(img)
        for r in range(R):       # translational search vs every reference
            cc = np.fft.irfft2(Fi * np.conj(Frefs[r]), s=img.shape)
            np.unravel_index(np.argmax(cc), cc.shape)
        pol = map_coordinates(img, [yy, xx], order=1)
        Fp = np.fft.rfft(pol, axis=1)
        # rotational correlation vs every reference (ring-summed)
        curves = np.fft.irfft((Fp[None] * np.conj(Fpol_refs)).sum(axis=1),
                              n=nang, axis=1)
        int(np.argmax(curves))
    return n_meas / (time.time() - t0)


def bench_projection_matching():
    import jax
    import jax.numpy as jnp
    from xmipp3_tpu.core.sampling import compute_sampling_points
    from xmipp3_tpu.ops.match import match_to_gallery
    from xmipp3_tpu.ops.project import FourierProjector
    SIZE, N_REFS, BATCH, N_BATCHES, MAX_SHIFT = 128, 128, 1024, 8, 8
    rng = np.random.default_rng(0)
    z, y, x = np.mgrid[0:SIZE, 0:SIZE, 0:SIZE].astype(np.float32)
    z, y, x = z - SIZE // 2, y - SIZE // 2, x - SIZE // 2
    vol = np.zeros((SIZE, SIZE, SIZE), np.float32)
    for _ in range(12):
        c = rng.uniform(-SIZE // 4, SIZE // 4, 3)
        s = rng.uniform(2, 6)
        a = rng.uniform(0.5, 1.2)
        vol += a * np.exp(-((z - c[0]) ** 2 + (y - c[1]) ** 2 +
                            (x - c[2]) ** 2) / (2 * s ** 2))
    angles = compute_sampling_points(13.0)[:N_REFS]
    proj = FourierProjector(vol, pad_factor=2.0)
    refs = []
    for s0 in range(0, len(angles), 64):
        a = angles[s0:s0 + 64]
        refs.append(np.asarray(proj.project_euler(
            a[:, 0].astype(np.float32), a[:, 1].astype(np.float32),
            np.zeros(len(a), np.float32))))
    refs = np.concatenate(refs)
    pick = rng.integers(0, len(refs), BATCH)
    imgs = refs[pick] + 0.5 * refs.std() * rng.standard_normal(
        (BATCH, SIZE, SIZE)).astype(np.float32)

    refs_d = jax.device_put(jnp.asarray(refs))
    imgs_d = jax.device_put(jnp.asarray(imgs))
    out = match_to_gallery(refs_d, imgs_d, max_shift=MAX_SHIFT)
    _sync(out["corr"])
    t0 = time.time()
    for _ in range(N_BATCHES):
        out = match_to_gallery(refs_d, imgs_d, max_shift=MAX_SHIFT)
    _sync(out["corr"])
    dt = time.time() - t0
    pps = N_BATCHES * BATCH / dt

    # stage ablation (VERDICT r3 #3): where a batch's time goes
    from xmipp3_tpu.ops.match import _scan_trials, _trial_shift_grid
    from xmipp3_tpu.ops.polar import polar_at_static_offsets, ring_ffts
    trials = tuple(map(tuple, _trial_shift_grid(MAX_SHIFT)
                       .astype(float).tolist()))
    Ro = SIZE // 2 - 2

    def _time(f, n=3):
        o = f()
        _sync(o[0] if isinstance(o, tuple) else o)
        t0 = time.time()
        for _ in range(n):
            o = f()
        _sync(o[0] if isinstance(o, tuple) else o)
        return (time.time() - t0) / n

    f_pol = jax.jit(lambda im: polar_at_static_offsets(
        im, trials, 2, Ro, n_angles=128, stride=2))
    t_pol = _time(lambda: f_pol(imgs_d))
    pol = f_pol(imgs_d)
    t_fft = _time(lambda: jnp.abs(ring_ffts(pol)[..., :64]))
    t_scan = _time(lambda: _scan_trials(refs_d, imgs_d, trials, 2, Ro,
                                        True))
    ablation = dict(polar_gather_ms=round(t_pol * 1e3, 1),
                    ring_ffts_ms=round(t_fft * 1e3, 1),
                    scan_total_ms=round(t_scan * 1e3, 1),
                    refine_ms=round(dt / N_BATCHES * 1e3
                                    - t_scan * 1e3, 1))
    # dominant FLOPs: 4 real ring contractions + the irfft-by-matmul DFT
    # per trial per mirror path (n_harmonics = 64 default since r4)
    n_trials, nrings, k = len(trials), 30, 64
    A = 2 * (k - 1)
    flops_img = n_trials * N_REFS * (nrings * k * 8 + 2 * 2 * k * A) * 2
    mfu = pps * flops_img / PEAK_FLOPS
    base = _cache_get("ref_cpu_match_128px_128refs")
    if base is None:
        base = _ref_cpu_match_numpy(refs, imgs)
        _cache_put("ref_cpu_match_128px_128refs", base)
    out = dict(value=round(pps, 2), unit="particles/s/chip",
               mfu=round(mfu, 4), vs_baseline=round(pps / base, 2),
               stage_ablation=ablation,
               note="r4: irfft-by-MXU-matmul + n_harmonics 64 + one-hot "
                    "parabola peaks + matmul-shear rotations + exact "
                    "translate-compose refine (full rationale in "
                    "docs/COVERAGE.md and CLAUDE.md r4 lessons)",
               baseline="numpy transliteration of the reference serial "
                        "per-(particle, reference) FFT shift + polar "
                        "ring correlation loop (4 particles measured)")
    cpp_s, thr = _cpp_baseline("cpu_match_per_particle", (4, 128))
    if cpp_s:
        out["vs_cpp"] = round(pps * cpp_s, 1)
        out["cpp_threads"] = thr
        out["cpp_particles_per_s"] = round(1.0 / cpp_s, 2)
    return out


# ---------------------------------------------------------------------------
# config 5: movie alignment + MonoRes
# ---------------------------------------------------------------------------

def _make_movie(F, H, W, drift=1.5, seed=2):
    """Frames = shifted crops of one noise field (real correlated signal
    for the alignment to find; generation is not timed)."""
    rng = np.random.default_rng(seed)
    pad = int(np.ceil(drift * F)) + 4
    base = rng.standard_normal((H + pad, W + pad)).astype(np.float32)
    frames = np.empty((F, H, W), np.float32)
    for i in range(F):
        dy = int(round(drift * i * 0.7))
        dx = int(round(drift * i * 0.4))
        frames[i] = base[dy:dy + H, dx:dx + W]
    return frames


def _ref_cpu_movie_numpy(frames):
    """Reference-representative serial CPU FlexAlign loop in numpy:
    full-frame FFTs, Fourier-crop to the correlation size, all-pairs
    cross-correlations + LS trajectory (the structure of
    movie_alignment_correlation's CPU path), then ONE local patch
    measured and extrapolated x25 (documented: extrapolated). Returns
    extrapolated seconds for global + 5x5-patch local."""
    F, H, W = frames.shape
    cn = 512
    t0 = time.time()
    specs = []
    for i in range(F):
        Ff = np.fft.rfft2(frames[i])
        # Fourier crop to cn x (cn/2+1)
        crop = np.concatenate([Ff[:cn // 2, :cn // 2 + 1],
                               Ff[-cn // 2:, :cn // 2 + 1]], axis=0)
        specs.append(crop)
    ii, jj = np.triu_indices(F, k=1)
    for a, b in zip(ii, jj):
        cc = np.fft.irfft2(specs[a] * np.conj(specs[b]), s=(cn, cn))
        np.unravel_index(np.argmax(cc), cc.shape)
    t_global = time.time() - t0
    # one 512^2 patch: per-frame FFT + all-pairs correlation
    t0 = time.time()
    pf = [np.fft.rfft2(frames[i][:512, :512]) for i in range(F)]
    for a, b in zip(ii, jj):
        cc = np.fft.irfft2(pf[a] * np.conj(pf[b]), s=(512, 512))
        np.unravel_index(np.argmax(cc), cc.shape)
    t_patch = time.time() - t0
    return t_global + 25 * t_patch


def bench_movie_monores():
    import jax
    import jax.numpy as jnp
    from xmipp3_tpu.ops.movie import (global_align, local_align,
                                      warp_sum_frames_tiled)
    from xmipp3_tpu.ops.monogenic import local_resolution_monores
    F, H, W = 32, 4096, 4096
    frames_host = _make_movie(F, H, W)
    # stage the 2.1 GB stack on device ONCE (production IO is pipelined;
    # the axon relay's ~11 MB/s host->device link is a tunnel artifact and
    # is reported separately, not inside the alignment timings)
    t0 = time.time()
    frames = jax.device_put(frames_host)
    _sync(frames)
    t_upload = time.time() - t0

    def flexalign_once():
        t0 = time.time()
        pos = global_align(frames, max_shift_px=60)
        t_g = time.time() - t0
        t0 = time.time()
        field, cys, cxs = local_align(frames, pos, patches=(5, 5),
                                      patch_size=512, max_shift_px=8)
        t_l = time.time() - t0
        t0 = time.time()
        total = field + pos[None, None]
        avg = warp_sum_frames_tiled(frames, total, cys, cxs)
        _sync(avg)
        t_w = time.time() - t0
        return t_g, t_l, t_w, pos

    flexalign_once()                      # compile (cold)
    t_g, t_l, t_w, pos = flexalign_once()  # warm
    t_movie = t_g + t_l + t_w

    # local-patch stage bound analysis (VERDICT r4 #9): split the one
    # fused local dispatch into its two physical phases. r5: the
    # full-frame Fourier shiftsum (~360 ms) left the local path — the
    # integer global shift is a periodic roll and the fractional residual
    # folds into each patch's spectrum (ops/movie._local_shifts_device).
    from xmipp3_tpu.ops.movie import (frame_ffts_scaled, pairwise_shifts,
                                      shift_sum_frames_keep)
    gx = jnp.asarray(-np.asarray(pos)[:, 0])
    gy = jnp.asarray(-np.asarray(pos)[:, 1])
    corr_fn = jax.jit(shift_sum_frames_keep)
    corrected = corr_fn(frames, gx, gy)
    _sync(corrected)
    t0 = time.time()
    corrected = corr_fn(frames, gx, gy)
    _sync(corrected)
    t_shiftsum = time.time() - t0   # full-frame Fourier shift (for scale;
    #                                 only the patches_avg>1 path pays it)

    @jax.jit
    def one_patch(tile):
        specs = frame_ffts_scaled(tile, 512)
        return pairwise_shifts(specs, 512, 8)[0]
    tile = corrected[:, :512, :512]
    _sync(one_patch(tile))
    t0 = time.time()
    for _ in range(4):
        o = one_patch(tile)
    _sync(o)
    t_patch1 = (time.time() - t0) / 4     # per-patch FFT+pairs latency
    local_ablation = {
        "fullframe_shiftsum_ms_avoided": round(t_shiftsum * 1e3, 1),
        "one_patch_ms": round(t_patch1 * 1e3, 1),
        "n_patches": 25,
        "bound": "local = integer-roll patch extraction + 25 patch "
                 "pair-correlation blocks (512^2 FFT latency-bound; "
                 "fractional global shift folded into patch spectra); "
                 "warp = 4 Hann overlap-add passes, frame-summed "
                 "spectra, ONE inverse FFT per tile (r5)",
    }

    rng = np.random.default_rng(2)
    n = 96
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = np.exp(-(x ** 2 + y ** 2 + z ** 2) / 200).astype(np.float32)
    vol += 0.05 * rng.standard_normal(vol.shape).astype(np.float32)
    mask = (np.sqrt(x ** 2 + y ** 2 + z ** 2) < n // 3)
    res = local_resolution_monores(jnp.asarray(vol), jnp.asarray(mask),
                                   sampling=2.0)
    _sync(res[0])
    t0 = time.time()
    res = local_resolution_monores(jnp.asarray(vol), jnp.asarray(mask),
                                   sampling=2.0)
    _sync(res[0])
    t_mono = time.time() - t0
    base = _cache_get("ref_cpu_movie_32x4096")
    if base is None:
        base = _ref_cpu_movie_numpy(frames_host)
        _cache_put("ref_cpu_movie_32x4096", base)
    # movie path is FFT/HBM bound: frames stream ~ F*H*W*4B several times
    bytes_movie = F * H * W * 4 * 14
    return dict(value=round(t_movie + t_mono, 2),
                unit="s (32x4096^2 FlexAlign global+local+warp "
                     "+ 96^3 MonoRes)",
                movie_s=round(t_movie, 3), global_s=round(t_g, 3),
                local_s=round(t_l, 3), warp_s=round(t_w, 3),
                local_ablation=local_ablation,
                monores_s=round(t_mono, 3),
                upload_s=round(t_upload, 1),
                vs_baseline=round(base / t_movie, 1),
                baseline="numpy transliteration of the serial FlexAlign "
                         "correlation loop (global measured; one local "
                         "patch measured, extrapolated x25); frames staged "
                         "on device once (upload_s = relay transfer, "
                         "reported separately)",
                hbm_util_movie=round(bytes_movie / t_movie / PEAK_HBM, 4))


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/xmipp3_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    platform = jax.devices()[0].platform
    configs = {}
    for key, fn in [("1_filter_align_64", bench_filter_align),
                    ("2_ctf_estimate", bench_ctf_estimate),
                    ("3_reconstruct_fourier_10k_128", bench_reconstruct),
                    ("4_projection_matching", bench_projection_matching),
                    ("5_movie_monores", bench_movie_monores)]:
        try:
            configs[key] = fn()
        except Exception as e:  # keep the bench robust: report the failure
            configs[key] = dict(error=f"{type(e).__name__}: {e}"[:200])
    head = configs.get("4_projection_matching", {})
    # full detail (long notes/baseline strings) -> BENCH_DETAIL.json;
    # stdout carries a COMPACT one-liner so the driver's tail cap keeps
    # all five configs (VERDICT r4 Weak #6)
    detail = {
        "metric": "projection_matching_2d_align_assign_128px_128refs",
        "value": head.get("value"),
        "unit": "particles/s/chip",
        "vs_baseline": head.get("vs_baseline"),
        "platform": platform,
        "configs": configs,
    }
    with open(os.path.join(os.path.dirname(os.path.abspath(__file__)),
                           "BENCH_DETAIL.json"), "w") as f:
        json.dump(detail, f, indent=1)
    def _strip(v):
        if isinstance(v, dict):
            return {k: _strip(x) for k, x in v.items()
                    if not isinstance(x, str) or len(x) < 40}
        return v

    compact = _strip(configs)
    print(json.dumps({
        "metric": "projection_matching_2d_align_assign_128px_128refs",
        "value": head.get("value"),
        "unit": "particles/s/chip",
        "vs_baseline": head.get("vs_baseline"),
        "platform": platform,
        "configs": compact,
        "detail": "BENCH_DETAIL.json",
    }))


if __name__ == "__main__":
    main()
