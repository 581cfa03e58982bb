"""Device-side true-ref accuracy + timing probe for the projection-matching
path (bench config 4 shapes: 128 refs x 1024 imgs at 128 px).

CPU tests cannot catch TPU matmul-precision regressions (precision is ignored
on XLA:CPU), so run this ON DEVICE after touching ops/match.py, ops/shift.py,
ops/shear_rotate.py or ops/dft_mm.py (CLAUDE.md r5 precision lesson).

Reports: assignment accuracy vs the known true reference, psi / shift
recovery error on the non-flipped correct assignments, and warm per-batch
wall time. Run: `python tools/probe_match_accuracy.py` (TPU) or with
`JAX_PLATFORMS=cpu PALLAS_AXON_POOL_IPS=` for a CPU sanity pass.
"""
import sys
import time

import numpy as np


def _p(msg):
    print(f"[{time.strftime('%H:%M:%S')}] {msg}", flush=True)
    sys.stdout.flush()


def main():
    import jax
    import jax.numpy as jnp
    from xmipp3_tpu.core.sampling import compute_sampling_points
    from xmipp3_tpu.ops.match import match_to_gallery
    from xmipp3_tpu.ops.project import FourierProjector
    from xmipp3_tpu.ops.geo import apply_md_geometry

    SIZE, N_REFS, BATCH, MAX_SHIFT = 128, 128, 1024, 8
    rng = np.random.default_rng(7)
    z, y, x = np.mgrid[0:SIZE, 0:SIZE, 0:SIZE].astype(np.float32)
    z, y, x = z - SIZE // 2, y - SIZE // 2, x - SIZE // 2
    vol = np.zeros((SIZE, SIZE, SIZE), np.float32)
    for _ in range(12):
        c = rng.uniform(-SIZE // 4, SIZE // 4, 3)
        s = rng.uniform(2, 6)
        a = rng.uniform(0.5, 1.2)
        vol += a * np.exp(-((z - c[0]) ** 2 + (y - c[1]) ** 2 +
                            (x - c[2]) ** 2) / (2 * s ** 2))
    _p("phantom built; projecting gallery")
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
    psi_true = rng.uniform(-180.0, 180.0, BATCH).astype(np.float32)
    sx_true = rng.uniform(-6.0, 6.0, BATCH).astype(np.float32)
    sy_true = rng.uniform(-6.0, 6.0, BATCH).astype(np.float32)

    # forward-transform the true refs with the metadata-pose warp (the exact
    # inverse of what registration must recover), then add SNR~4 noise
    from xmipp3_tpu.ops.shear_rotate import rotate_shift_fourier
    base = jnp.asarray(refs[pick])

    @jax.jit
    def make_imgs(base, psi, sx, sy):
        # place ref at pose: rotate by -psi then shift by -R(-psi)s so that
        # registration R(psi)T(s) maps it back onto the reference
        rad = jnp.deg2rad(psi)
        c, s = jnp.cos(rad), jnp.sin(rad)
        tx = -(c * sx - s * sy)
        ty = -(s * sx + c * sy)
        return rotate_shift_fourier(base, -psi, tx, ty)

    _p("gallery done; generating posed images")
    imgs = np.asarray(make_imgs(base, jnp.asarray(psi_true),
                                jnp.asarray(sx_true), jnp.asarray(sy_true)))
    imgs = imgs + 0.5 * refs.std() * rng.standard_normal(
        imgs.shape).astype(np.float32)

    _p("images posed; compiling match")
    refs_d = jax.device_put(jnp.asarray(refs))
    imgs_d = jax.device_put(jnp.asarray(imgs))
    out = match_to_gallery(refs_d, imgs_d, max_shift=MAX_SHIFT)
    float(jnp.sum(out["corr"]))  # sync (np.asarray on big arrays fetches all)
    _p("match compiled; timing")
    t0 = time.time()
    N = 8
    for _ in range(N):
        out = match_to_gallery(refs_d, imgs_d, max_shift=MAX_SHIFT)
    float(jnp.sum(out["corr"]))
    dt = (time.time() - t0) / N

    ref_idx = np.asarray(out["ref_idx"])
    flip = np.asarray(out["flip"])
    ok = (ref_idx == pick) & ~flip
    acc = ok.mean()

    _p("timing done; registering for cc")
    # pose recovery on the correct, unflipped assignments: apply the
    # registration pose to the (noise-free) transformed image and verify it
    # matches applying nothing to the reference — measure psi/shift errors
    # directly in registration space
    psi_md = np.asarray(out["psi"])
    sx_md = np.asarray(out["sx"])
    sy_md = np.asarray(out["sy"])
    # md pose contract: registration = R(-psi_md)·T(s_md) (ops.geo); the
    # generator above used registration R(psi_true)·T(s_true) in the
    # rotate_shift convention. Compare via warp equivalence instead of
    # algebra: re-register the clean images with the recovered pose and
    # correlate with the true refs.
    reg = np.asarray(apply_md_geometry(
        jnp.asarray(imgs), jnp.asarray(psi_md), jnp.asarray(sx_md),
        jnp.asarray(sy_md), jnp.asarray(flip)))
    r = refs[pick]
    num = (reg * r).sum(axis=(1, 2))
    den = np.sqrt((reg ** 2).sum(axis=(1, 2)) * (r ** 2).sum(axis=(1, 2)))
    cc = num / np.maximum(den, 1e-12)

    print(f"platform: {jax.devices()[0].platform}")
    print(f"true-ref accuracy (unflipped): {acc:.4f}")
    print(f"mean registered cc (correct rows): {cc[ok].mean():.4f}")
    print(f"warm batch time: {dt * 1e3:.1f} ms "
          f"({BATCH / dt:.0f} particles/s)")


if __name__ == "__main__":
    main()
