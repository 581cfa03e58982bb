"""Resolution suite tests: MonoRes, FSO, local filter, B-factor."""
import numpy as np
import pytest

from xmipp3_tpu.ops.monogenic import (bandpass_3d, fso_directional,
                                      local_filter_by_resolution,
                                      local_resolution_monores,
                                      monogenic_amplitude_3d)
from xmipp3_tpu.ops.mask import circular_mask


def test_monogenic_amplitude_envelope():
    # the monogenic amplitude of a modulated pattern ~ its envelope
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    env = np.exp(-((z - 16) ** 2 + (y - 16) ** 2 + (x - 16) ** 2) / (2 * 36.0))
    carrier = np.cos(2 * np.pi * 0.25 * x)
    vol = (env * carrier).astype(np.float32)
    amp = np.asarray(monogenic_amplitude_3d(vol))
    # at the center the amplitude should approximate the envelope, not the
    # oscillating signal
    c = 16
    assert amp[c, c, c] > 0.5 * env[c, c, c]
    corr = np.corrcoef(amp.ravel(), env.ravel())[0, 1]
    assert corr > 0.7


def test_monores_detects_resolution_difference():
    """Two spheres filtered to different resolutions -> different local res."""
    n = 48
    Ts = 2.0
    rng = np.random.default_rng(0)
    base = rng.standard_normal((n, n, n)).astype(np.float32)
    sharp = np.asarray(bandpass_3d(base, 0.0, 0.45))
    blurry = np.asarray(bandpass_3d(base, 0.0, 0.10))
    m1 = circular_mask((n, n, n), 8)
    m1_shifted = np.roll(m1, -12, axis=2)   # sphere at left
    m2_shifted = np.roll(m1, +12, axis=2)   # sphere at right
    vol = (sharp * m1_shifted + blurry * m2_shifted).astype(np.float32)
    mask = (m1_shifted + m2_shifted) > 0.5
    res_map, freqs, frac = local_resolution_monores(
        vol, mask, Ts, min_res=24.0, max_res=4.5, n_freqs=16,
        significance=0.9)
    r_sharp = np.median(res_map[m1_shifted > 0.5])
    r_blurry = np.median(res_map[m2_shifted > 0.5])
    assert r_sharp < r_blurry - 2.0, (r_sharp, r_blurry)


def test_fso_isotropic_vs_anisotropic():
    n = 32
    rng = np.random.default_rng(1)
    half = np.asarray(bandpass_3d(
        rng.standard_normal((n, n, n)).astype(np.float32), 0.0, 0.4))
    noise = 0.01 * rng.standard_normal((n, n, n)).astype(np.float32)
    freqs, fso = fso_directional(half + noise, half - noise, 1.0, n_dirs=20)
    # identical halves: FSO ~= 1 through most of the band
    assert fso[2: n // 4].mean() > 0.9


def test_local_filter_by_resolution():
    n = 32
    rng = np.random.default_rng(2)
    vol = rng.standard_normal((n, n, n)).astype(np.float32)
    res = np.full((n, n, n), 4.0, np.float32)
    res[:, :, : n // 2] = 10.0   # left half much lower resolution
    out = local_filter_by_resolution(vol, res, 1.0)
    spec_l = np.abs(np.fft.rfftn(out[:, :, : n // 2]))
    spec_r = np.abs(np.fft.rfftn(out[:, :, n // 2:]))
    # high-frequency content on the left must be attenuated vs right
    assert spec_l[8:, 8:, 8:].sum() < 0.5 * spec_r[8:, 8:, 8:].sum()


def test_bfactor_program(tmp_path):
    from xmipp3_tpu.core.image import load_image, save_image
    from xmipp3_tpu.programs import get_program
    n = 32
    rng = np.random.default_rng(3)
    vol = np.asarray(bandpass_3d(
        rng.standard_normal((n, n, n)).astype(np.float32), 0.0, 0.4))
    # blur with a known B factor
    from xmipp3_tpu.ops.fourier import freq_grid_3d
    fz, fy, fx = freq_grid_3d(n, n, n)
    r2 = fz ** 2 + fy ** 2 + fx ** 2  # (1/px)^2 at Ts=1 -> (1/A)^2
    B_true = 120.0
    blurred = np.fft.irfftn(np.fft.rfftn(vol) * np.exp(-(B_true / 4) * r2),
                            s=vol.shape, axes=(0, 1, 2)).astype(np.float32)
    fn = str(tmp_path / "b.vol")
    save_image(fn, blurred)
    out = str(tmp_path / "sharp.vol")
    prog = get_program("volume_correct_bfactor")
    rc = prog.run_with_args(f"-i {fn} -o {out} --sampling 1 --auto "
                            f"--fit_minres 8 --maxres 2.5 -v 0")
    assert rc == 0
    # fitted B should be close to -B_true (sharpening)
    assert prog.B < -40, prog.B
    sharp = load_image(out)
    assert np.isfinite(sharp).all()


def test_monores_program(tmp_path):
    from xmipp3_tpu.core.image import load_image, save_image
    from xmipp3_tpu.programs import get_program
    n = 32
    rng = np.random.default_rng(4)
    vol = np.asarray(bandpass_3d(
        rng.standard_normal((n, n, n)).astype(np.float32), 0.0, 0.3))
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out = str(tmp_path / "res.vol")
    prog = get_program("resolution_monogenic_signal")
    rc = prog.run_with_args(f"--vol {fn} -o {out} --sampling_rate 2 "
                            f"--steps 10 -v 0")
    assert rc == 0
    res = load_image(out)
    assert res.shape == vol.shape
    inside = res[res > 0]
    assert len(inside) > 0 and (inside >= 4.0 - 1e-3).all()
