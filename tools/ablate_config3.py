"""Stage ablation for bench config 3 (Fourier gridding 10k -> 128^3).

Times the packed backprojection's three stages on the real TPU —
spectra+coords prep, the raw-sample sort, the packed tri kernel — so the
config-3 bound is measured, not asserted (completes VERDICT r4 Weak #7's
per-config bound analysis). Also A/Bs the 7-operand stable sort against
six stable 2-operand sorts sharing the key (the pallas_scatter.py r3
lesson) at the real stream shapes.

Run: python tools/ablate_config3.py   (real TPU; compiles once, cached).
"""
import os
import sys
import time

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


_SYNC_FN = None


def _sync(x):
    import jax
    import jax.numpy as jnp
    global _SYNC_FN
    if _SYNC_FN is None:
        _SYNC_FN = jax.jit(
            lambda a: jnp.sum(jnp.abs(a)).astype(jnp.float32))
    np.asarray(jax.device_get(_SYNC_FN(x)))


def main():
    pass  # os imported at module level

    import jax
    try:
        jax.config.update("jax_compilation_cache_dir",
                          os.path.expanduser("~/.cache/xmipp3_tpu_jax"))
        jax.config.update("jax_persistent_cache_min_compile_time_secs", 0.0)
    except Exception:
        pass
    import jax.numpy as jnp
    from functools import partial
    from xmipp3_tpu.core.geometry import euler_matrix
    from xmipp3_tpu.ops.reconstruct import _disk_mask, _slice_tap_coords
    from xmipp3_tpu.ops.fourier import shift_spec_2d
    from xmipp3_tpu.ops.pallas_scatter_tri import (packed_cube_alloc,
                                                   tri_scatter_packed)

    N, BATCH, P = 128, 256, 256
    rng = np.random.default_rng(0)
    imgs = jax.device_put(jnp.asarray(
        rng.standard_normal((BATCH, N, N)).astype(np.float32)))
    rot = rng.uniform(0, 360, BATCH).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, BATCH))).astype(np.float32)
    psi = rng.uniform(0, 360, BATCH).astype(np.float32)
    mats = jax.device_put(jnp.asarray(euler_matrix(rot, tilt, psi)))
    z = jnp.zeros(BATCH)
    w1 = jnp.ones(BATCH)
    keep = _disk_mask(N, 0.5)
    flat_keep = np.flatnonzero(np.asarray(keep).ravel())

    @jax.jit
    def stage_prep(imgs, mats, sx, sy, img_w):
        spec = jnp.fft.rfft2(jnp.fft.ifftshift(imgs, axes=(-2, -1)))
        spec = shift_spec_2d(spec, sx, sy, N, N)
        spec = spec.reshape(BATCH, -1)[:, flat_keep]
        wimg = jnp.broadcast_to(img_w[:, None], spec.shape)
        zi, yi, xi = _slice_tap_coords(mats, N, P, keep=keep)
        z0 = jnp.floor(zi).astype(jnp.int32)
        y0 = jnp.floor(yi).astype(jnp.int32)
        x0 = jnp.floor(xi).astype(jnp.int32)
        base = ((z0 * P + y0) * P + x0).reshape(-1)
        return (base, (zi - z0).reshape(-1), (yi - y0).reshape(-1),
                (xi - x0).reshape(-1),
                (jnp.real(spec) * wimg).reshape(-1),
                (jnp.imag(spec) * wimg).reshape(-1), wimg.reshape(-1))

    @jax.jit
    def sort7(base, fz, fy, fx, sr, si, w):
        return jax.lax.sort([base, fz, fy, fx, sr, si, w], num_keys=1)

    @jax.jit
    def sort2x6(base, fz, fy, fx, sr, si, w):
        b2, a = jax.lax.sort([base, fz], num_keys=1)
        _, b = jax.lax.sort([base, fy], num_keys=1)
        _, c = jax.lax.sort([base, fx], num_keys=1)
        _, d = jax.lax.sort([base, sr], num_keys=1)
        _, e = jax.lax.sort([base, si], num_keys=1)
        _, f = jax.lax.sort([base, w], num_keys=1)
        return b2, a, b, c, d, e, f

    @jax.jit
    def argsort_gather(base, fz, fy, fx, sr, si, w):
        # the direct-KB path's current sort strategy (pallas_scatter_kb)
        order_ix = jnp.argsort(base)
        bs = base[order_ix]
        return (bs,) + tuple(a[order_ix] for a in (fz, fy, fx, sr, si, w))

    kernel = partial(tri_scatter_packed, P=P)

    streams = stage_prep(imgs, mats, z, z, w1)
    _sync(streams[0])
    srt = sort7(*streams)
    _sync(srt[0])
    packed0 = packed_cube_alloc(P)

    def timeit(name, fn, *args, reps=6):
        out = fn(*args)
        _sync(out if not isinstance(out, (tuple, list)) else out[0])
        t0 = time.time()
        for _ in range(reps):
            out = fn(*args)
        _sync(out if not isinstance(out, (tuple, list)) else out[0])
        dt = (time.time() - t0) / reps * 1e3
        print(f"{name:38s} {dt:8.2f} ms", flush=True)
        return dt

    print(f"BATCH={BATCH}, N={N}, P={P}, rows={streams[0].shape[0]}, "
          f"backend={jax.default_backend()}", flush=True)
    t_prep = timeit("prep (rfft2+coords+streams)", stage_prep,
                    imgs, mats, z, z, w1)
    t_sort7 = timeit("sort: 7-operand stable", sort7, *streams)
    t_sort2 = timeit("sort: 6x 2-operand stable", sort2x6, *streams)
    timeit("sort: argsort + 6 gathers (kb path)", argsort_gather, *streams)
    t_kern = timeit("tri_scatter_packed kernel", kernel, packed0, *srt)
    tot = t_prep + min(t_sort7, t_sort2) + t_kern
    print(f"batch total {tot:.1f} ms  -> 10k imgs ~ {tot * 10000 / BATCH / 1e3:.2f} s "
          f"(+finalize)", flush=True)


if __name__ == "__main__":
    main()
