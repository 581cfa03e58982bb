"""Stage ablation for bench config 2 (CTF estimation, 2048^2 micrograph).

Times each stage of the single-micrograph staged fit on the real TPU so
the config-2 bound is measured, not asserted (completes the per-config
bound analysis of VERDICT r4 Weak #7 across all five configs). The first
full pass compiles (cached); the timed pass re-instantiates the estimator
and times estimate_psd + every fit stage in estimate()'s order.

Run: python tools/ablate_config2.py   (real TPU).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main():
    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/xmipp3_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    from xmipp3_tpu.models.ctf_estimation import CTFEstimator, STAGE_SETS
    from xmipp3_tpu.ops.ctf import CTFDescription
    from xmipp3_tpu.ops.psd import estimate_psd

    rng = np.random.default_rng(1)
    true = CTFDescription(sampling_rate=1.5, voltage=300, Cs=2.7, Q0=0.07,
                          defocusU=17000, defocusV=14000,
                          azimuthal_angle=30.0, K=1.0)
    mic = rng.standard_normal((2048, 2048)).astype(np.float32)
    n = 2048
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / 1.5
    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / 1.5
    h = np.asarray(true.pure_at(fx, fy))
    mic = np.fft.irfft2(np.fft.rfft2(mic) * h, s=mic.shape).astype(np.float32)

    def run(timed: bool):
        stages = []

        def t(name, fn):
            t0 = time.time()
            out = fn()
            dt = (time.time() - t0) * 1e3
            stages.append((name, dt))
            return out

        psd = t("estimate_psd (periodogram)",
                lambda: np.asarray(estimate_psd(mic, 512, 0.5)))
        est = CTFEstimator(psd, 1.5, 300, 2.7, 0.07)
        t("fit_background", est.fit_background)
        t("fit_gaussian1", est.fit_gaussian1)
        t("grid_search_defocus", est.grid_search_defocus)
        t("powell defocus (enh, 3 it)",
          lambda: est._powell(STAGE_SETS["defocus"], maxiter=3,
                              use_enh=True, label="defocus"))
        t("powell envelope (3 it)",
          lambda: est._powell(STAGE_SETS["envelope"], maxiter=3,
                              label="envelope"))

        def gauss2():
            from xmipp3_tpu.models.ctf_estimation import (G2CU, G2CV, G2SU,
                                                          G2SV, G2K)
            est.params[G2CU] = est.params[G2CV] = 0.9 * 0.5 / est.Ts
            est.params[G2SU] = est.params[G2SV] = 100.0 * est.Ts ** 2
            est.params[G2K] = 0.0
            est._powell(STAGE_SETS["bg_gauss2"], maxiter=2, label="gauss2")
        t("powell gauss2 (2 it)", gauss2)
        t("powell all (4 it)",
          lambda: est._powell(STAGE_SETS["all"], maxiter=4, label="all"))
        ctf = est.to_ctf()
        if timed:
            tot = sum(d for _, d in stages)
            for name, dt in stages:
                print(f"{name:34s} {dt:8.1f} ms  ({100 * dt / tot:4.1f}%)",
                      flush=True)
            print(f"{'TOTAL':34s} {tot:8.1f} ms", flush=True)
            print(f"defocusU err: "
                  f"{abs(ctf.defocusU - 17000) / 17000:.4f}", flush=True)

    import jax
    print(f"backend={jax.default_backend()}", flush=True)
    run(timed=False)   # compile pass
    run(timed=True)    # warm measured pass


if __name__ == "__main__":
    main()
