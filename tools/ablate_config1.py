"""Stage ablation for bench config 1 (filter + iterative_align, 64^2).

Times each stage of the config-1 pipeline on the real TPU so the
optimization targets the measured bound (VERDICT r4 Weak #1 / Next #3, #9).
Run: python tools/ablate_config1.py   (real TPU; compiles once, cached).
"""
import time

import numpy as np


_SYNC_FN = None


def _sync(x):
    # axon quirk: EAGER complex ops / complex fetches raise UNIMPLEMENTED —
    # reduce to a real f32 scalar inside jit before fetching.
    import jax.numpy as jnp
    import jax
    global _SYNC_FN
    if _SYNC_FN is None:
        _SYNC_FN = jax.jit(
            lambda a: jnp.sum(jnp.abs(a)).astype(jnp.float32))
    np.asarray(jax.device_get(_SYNC_FN(x)))


def main():
    import os

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/xmipp3_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from xmipp3_tpu.ops.align import (iterative_align,
                                      rotation_from_fourier_mag,
                                      _iterative_align_refine)
    from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                               low_pass_mask)
    from xmipp3_tpu.ops.polar import cartesian_to_polar, ring_ffts, \
        best_rotation_from_ffts
    from xmipp3_tpu.ops.shear_rotate import (rotate_shift_fourier,
                                             translate_fourier)
    from xmipp3_tpu.ops.shift import best_shift, correlation_index

    n, B = 64, 2048
    rng = np.random.default_rng(0)
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
    ref = np.exp(-(x ** 2 + y ** 2) / 40) + \
        0.5 * np.exp(-((x - 8) ** 2 + y ** 2) / 12)
    imgs = (ref[None] + 0.5 * rng.standard_normal((B, n, n))).astype(np.float32)
    lp = jnp.asarray(np.asarray(low_pass_mask(n, n, 0.25)))
    ref_j = jnp.asarray(ref)
    d = jax.device_put(jnp.asarray(imgs))
    zeros = jnp.zeros(B)
    psi0 = jnp.zeros(B)

    def timeit(name, fn, *args, reps=8):
        out = fn(*args)
        _sync(out if not isinstance(out, (tuple, list)) else out[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _sync(out if not isinstance(out, (tuple, list)) else out[0])
        dt = (time.time() - t0) / reps * 1e3
        print(f"{name:38s} {dt:8.2f} ms")
        return dt

    @jax.jit
    def full(imgs):
        filt = apply_fourier_mask_2d(imgs, lp)
        psi, sx, sy, corr, _ = iterative_align(ref_j, filt, n_iters=2,
                                               max_shift=6)
        return psi

    @jax.jit
    def stage_filter(imgs):
        return apply_fourier_mask_2d(imgs, lp)

    @jax.jit
    def stage_rotmag(imgs):
        return rotation_from_fourier_mag(ref_j, imgs, radius_min=3,
                                         radius_max=n // 2 - 2)[0]

    @jax.jit
    def stage_candidates(imgs, ang):
        outs = []
        for psi in (ang, ang + 180.0):
            rotated = rotate_shift_fourier(imgs, psi, zeros, zeros)
            dsx, dsy, _ = best_shift(ref_j, rotated, max_shift=6)
            aligned = translate_fourier(rotated, dsx, dsy)
            outs.append(correlation_index(ref_j, aligned))
        return outs[0] + outs[1]

    @jax.jit
    def stage_refine(imgs, psi):
        return _iterative_align_refine(ref_j, imgs, psi, zeros, zeros, 2, 6,
                                       2, n // 2 - 2, 1)[0]

    @jax.jit
    def stage_rotate_only(imgs, ang):
        return rotate_shift_fourier(imgs, ang, zeros, zeros)

    @jax.jit
    def stage_bestshift_only(imgs):
        return best_shift(ref_j, imgs, max_shift=6)[0]

    @jax.jit
    def stage_polar_only(imgs):
        return cartesian_to_polar(imgs, 2, n // 2 - 2)

    @jax.jit
    def stage_ringfft_only(imgs):
        return ring_ffts(cartesian_to_polar(imgs, 2, n // 2 - 2))

    @jax.jit
    def stage_logmag_only(imgs):
        m = jnp.abs(jnp.fft.fftshift(jnp.fft.fft2(imgs), axes=(-2, -1)))
        return jnp.log1p(m)

    @jax.jit
    def stage_final_warp(imgs, psi):
        from xmipp3_tpu.ops.geo import apply_affine_2d, alignment_matrices_2d
        return apply_affine_2d(imgs, alignment_matrices_2d(psi, zeros, zeros),
                               order=1)

    print(f"B={B}, n={n}, backend={jax.default_backend()}")
    t_full = timeit("FULL pipeline", full, d)
    timeit("  filter (rfft2+mask+irfft2)", stage_filter, d)
    timeit("  rotation_from_fourier_mag", stage_rotmag, d)
    timeit("    logmag (fft2+abs+log)", stage_logmag_only, d)
    timeit("    polar gather", stage_polar_only, d)
    timeit("    polar+ring_ffts", stage_ringfft_only, d)
    timeit("  candidates x2 (rot+shift+corr)", stage_candidates, d, psi0)
    timeit("    rotate_shift_fourier x1", stage_rotate_only, d, psi0)
    timeit("    best_shift x1", stage_bestshift_only, d)
    timeit("  refine scan (2 iters)", stage_refine, d, psi0)
    timeit("  final warp (apply_affine order1)", stage_final_warp, d, psi0)
    print(f"rate: {B / t_full * 1e3:.0f} images/s")


if __name__ == "__main__":
    main()
