"""Movie alignment tests: synthetic drifting movies with known trajectories."""
import numpy as np
import pytest

from xmipp3_tpu.ops import movie as mops
from xmipp3_tpu.ops.fourier import fourier_shift_2d


def make_movie(n_frames=8, size=256, drift_per_frame=(2.0, -1.5), seed=0,
               noise=1.0):
    """Band-limited random scene drifting linearly + per-frame noise."""
    rng = np.random.default_rng(seed)
    scene = rng.standard_normal((size, size)).astype(np.float32)
    from xmipp3_tpu.ops.fourier_filter import apply_fourier_mask_2d, low_pass_mask
    scene = np.asarray(apply_fourier_mask_2d(scene, low_pass_mask(size, size, 0.2)))
    scene = scene * 10.0
    frames = []
    true_pos = []
    for f in range(n_frames):
        dx = drift_per_frame[0] * f
        dy = drift_per_frame[1] * f
        true_pos.append((dx, dy))
        fr = np.asarray(fourier_shift_2d(scene[None], dx, dy))[0]
        fr = fr + noise * rng.standard_normal((size, size)).astype(np.float32)
        frames.append(fr)
    pos = np.array(true_pos, np.float32)
    pos -= pos.mean(axis=0)  # gauge: mean zero (matches solver)
    return np.stack(frames), pos


def test_global_align_recovers_linear_drift():
    frames, true_pos = make_movie()
    est = mops.global_align(frames, max_shift_px=20)
    err = np.abs(est - true_pos).max()
    assert err < 0.3, f"max traj error {err}\n{est}\n{true_pos}"


def test_global_align_noisy():
    frames, true_pos = make_movie(noise=5.0, seed=1)
    est = mops.global_align(frames, max_shift_px=20)
    err = np.abs(est - true_pos).max()
    assert err < 0.7, f"max traj error {err}"


def test_aligned_average_sharper():
    frames, true_pos = make_movie()
    avg0 = frames.mean(axis=0)
    avg = np.asarray(mops.shift_sum_frames(
        frames, -true_pos[:, 0], -true_pos[:, 1])) / len(frames)
    # power beyond low freq must be higher in the aligned average
    spec0 = np.abs(np.fft.rfft2(avg0))
    spec1 = np.abs(np.fft.rfft2(avg))
    band = slice(20, 50)  # within the scene's passband (LPF at 0.2)
    assert spec1[band, band].sum() > 1.5 * spec0[band, band].sum()


def test_dose_filter_monotonic():
    q = np.asarray(mops.dose_filter(64, 5, dose_per_frame=4.0, sampling=1.0))
    assert q.shape == (5, 64, 33)
    # later frames more attenuated at high frequency
    assert q[0, 0, 20] > q[4, 0, 20]
    # high freq more attenuated than low within one frame
    assert q[4, 0, 3] > q[4, 0, 30]


def test_estimate_gain_flat_for_uniform():
    rng = np.random.default_rng(2)
    frames = 5.0 + rng.standard_normal((6, 64, 64)).astype(np.float32) * 0.1
    gain = mops.estimate_gain(frames)
    np.testing.assert_allclose(gain, 1.0, atol=0.05)


def test_movie_program_cli(tmp_path):
    from xmipp3_tpu.core.image import Image, save_image
    from xmipp3_tpu.core.metadata import MetaData
    from xmipp3_tpu.programs import get_program
    frames, true_pos = make_movie(n_frames=6, size=128)
    fn = str(tmp_path / "movie.mrcs")
    save_image(fn, frames)
    out_md = str(tmp_path / "shifts.xmd")
    avg_fn = str(tmp_path / "mic.mrc")
    prog = get_program("movie_alignment_correlation")
    rc = prog.run_with_args(
        f"-i {fn} -o {out_md} --oavg {avg_fn} --maxShift 30 --sampling 1 "
        f"--skipLocalAlignment -v 0")
    assert rc == 0
    md = MetaData(out_md)
    assert md.size() == 6
    est = np.stack([md.getColumn("shiftX"), md.getColumn("shiftY")], axis=1)
    assert np.abs(est - true_pos).max() < 0.5
    avg = Image(avg_fn).data
    assert avg.shape == (128, 128)


def test_warp_fast_path_matches_scan_path():
    """The 4-pass reshape-batched warp must reproduce the general
    lax.scan tile path exactly (same tile set when H,W are tile
    multiples and overlap=0.5)."""
    import numpy as np
    import jax.numpy as jnp
    rng = np.random.default_rng(7)
    F, H, W = 4, 128, 128
    frames = rng.standard_normal((F, H, W)).astype(np.float32)
    ny = nx = 3
    cys = np.linspace(16, H - 17, ny).astype(int)
    cxs = np.linspace(16, W - 17, nx).astype(int)
    field = rng.uniform(-1.5, 1.5, (ny, nx, F, 2)).astype(np.float32)
    fast = np.asarray(mops.warp_sum_frames_tiled(frames, field, cys, cxs,
                                                 tile=32, overlap=0.5))
    # force the general path with an overlap the fast path rejects
    slow = np.asarray(mops.warp_sum_frames_tiled(frames, field, cys, cxs,
                                                 tile=32, overlap=0.499))
    # overlap=0.499 gives step=ceil? step=max(int(32*0.501),1)=16 == fast
    assert np.allclose(fast, slow, atol=1e-4), np.abs(fast - slow).max()


def test_warp_corrects_motion():
    """Regression for the r5 warp sign fix: with a ZERO local field the
    tiled warp must equal the plain global correction
    shift_sum_frames(frames, -pos) — i.e. it must UNDO the measured
    positions, not double them — and the corrected average must match
    the scene better than the raw mean."""
    frames, true_pos = make_movie(n_frames=6, size=256, noise=0.3)
    ny = nx = 3
    cys = np.linspace(64, 256 - 65, ny).astype(int)
    cxs = np.linspace(64, 256 - 65, nx).astype(int)
    total = np.broadcast_to(true_pos[None, None], (ny, nx, 6, 2))
    warped = np.asarray(mops.warp_sum_frames_tiled(
        np.asarray(frames), np.ascontiguousarray(total), cys, cxs,
        tile=128))
    direct = np.asarray(mops.shift_sum_frames(
        frames, -true_pos[:, 0], -true_pos[:, 1]))
    c_equiv = np.corrcoef(warped[32:-32, 32:-32].ravel(),
                          direct[32:-32, 32:-32].ravel())[0, 1]
    assert c_equiv > 0.999, c_equiv
    mid = frames.mean(axis=0)

    def cc(a, b):
        a = a[32:-32, 32:-32].ravel()
        b = b[32:-32, 32:-32].ravel()
        return np.corrcoef(a, b)[0, 1]

    # reference: the scene at gauge position (frame positions are
    # mean-zero, so the unshifted scene IS the target)
    scene = direct  # direct global correction is the known-good target
    assert cc(warped, scene) > cc(mid, scene) + 0.01


def test_global_align_accepts_device_frames():
    frames, _ = make_movie(n_frames=4, size=128)
    import jax
    est = mops.global_align(jax.device_put(frames), max_shift_px=20)
    ref = mops.global_align(frames, max_shift_px=20)
    assert np.allclose(est, ref, atol=1e-4)
