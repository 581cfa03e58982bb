"""transform_filter reference flag-surface parity: value assertions for
the real-space and wavelet filter families (data/filters.cpp,
reconstruction/denoise.cpp, reconstruction/mean_shift.cpp)."""
import numpy as np
import pytest

from xmipp3_tpu.ops import spatial_filters as sf


def test_median_3x3_matches_scipy():
    from scipy.ndimage import median_filter
    rng = np.random.default_rng(0)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    out = np.asarray(sf.median_3x3(img))
    exp = median_filter(img, size=3, mode="nearest")
    np.testing.assert_allclose(out, exp, atol=1e-6)


def test_log_filter_formula():
    img = np.full((8, 8), 10.0, np.float32)
    out = np.asarray(sf.log_filter(img, 4.431, 0.4018, 336.6))
    np.testing.assert_allclose(out, 4.431 - 0.4018 * np.log(346.6),
                               rtol=1e-6)


def test_force_positive_repairs_with_neighbour_median():
    rng = np.random.default_rng(1)
    img = (rng.standard_normal((16, 16)) * 0.01 + 5).astype(np.float32)
    img[8, 8] = -3.0
    out = sf.force_positive(img)
    assert out[8, 8] > 4.5  # replaced by the local median (~5)
    keep = np.ones(img.shape, bool)
    keep[8, 8] = False
    np.testing.assert_array_equal(out[keep], img[keep])


def test_pixel_desv_filter_repairs_outliers_only():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    img[3, 3] = 100.0
    out = sf.pixel_desv_filter(img, 5.0)
    assert abs(out[3, 3]) < 5.0
    # non-positive factor is a no-op (reference pixelDesvFilter guard)
    np.testing.assert_array_equal(sf.pixel_desv_filter(img, 0.0), img)


def test_bound_median_filter_cascades():
    """A solid bad block is repaired from the outside in."""
    img = np.ones((16, 16), np.float32) * 2.0
    bad = np.zeros((16, 16), bool)
    bad[4:12, 4:12] = True
    img[bad] = -99.0
    out = sf.bound_median_filter(img, bad)
    np.testing.assert_allclose(out, 2.0, atol=1e-6)


def test_rolling_ball_flattens_gradient_keeps_particle():
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32)
    bg = 0.1 * xx + 0.05 * yy
    img = bg.copy()
    img[30:34, 30:34] += 10.0
    out = sf.rolling_ball_background(img, 8)
    # particle survives, smooth ramp is mostly removed
    assert out[31, 31] > 8.0
    corner_spread = abs(float(out[4:10, 4:10].mean())
                        - float(out[50:56, 50:56].mean()))
    ramp_spread = abs(float(bg[4:10, 4:10].mean())
                      - float(bg[50:56, 50:56].mean()))
    assert corner_spread < 0.3 * ramp_spread


def test_mean_shift_smooths_noise_preserves_edge():
    rng = np.random.default_rng(3)
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 10.0
    noisy = img + rng.standard_normal((32, 32)).astype(np.float32) * 0.3
    out = np.asarray(sf.mean_shift_filter(noisy, 1.0, 6.0, 2))
    # noise reduced within flat regions
    assert out[:, :12].std() < 0.7 * noisy[:, :12].std()
    # the step edge survives (range kernel blocks cross-edge mixing)
    assert float(out[:, 20:].mean() - out[:, :12].mean()) > 8.0


def test_retinex_keeps_sharp_feature_removes_smooth_bg():
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) - 32
    img = np.exp(-(xx ** 2 + yy ** 2) / (2 * 20.0 ** 2)) * 5  # smooth bg
    img[32, 32] += 8.0  # spike has a huge Laplacian
    out = sf.retinex_filter(img, percentile=0.95)
    assert abs(out[32, 32] - out[30, 28]) > 1.0
    assert np.abs(out[5:15, 5:15]).max() < 0.5


def test_basis_filter_orthonormal_projection():
    rng = np.random.default_rng(4)
    q, _ = np.linalg.qr(rng.standard_normal((64, 4)))
    basis = q.T.reshape(4, 8, 8).astype(np.float32)
    img = (2.0 * basis[0] - 1.5 * basis[2]).astype(np.float32)
    noise_dir = rng.standard_normal((8, 8)).astype(np.float32)
    noise_dir -= sum((noise_dir * b).sum() * b for b in basis)
    out = np.asarray(sf.basis_filter(img + noise_dir, basis))
    np.testing.assert_allclose(out, img, atol=1e-4)


def test_smoothing_shah_surface_and_edge():
    rng = np.random.default_rng(5)
    img = np.zeros((32, 32), np.float32)
    img[:, 16:] = 1.0
    noisy = img + rng.standard_normal((32, 32)).astype(np.float32) * 0.1
    fs, s = sf.smoothing_shah(noisy, outer=10)
    assert 0.0 <= fs.min() and fs.max() <= 1.0
    # surface is denoised
    assert fs[4:28, 2:12].std() < noisy[4:28, 2:12].std()
    # edge strength peaks at the discontinuity column
    mid = s[8:24, 14:18].mean()
    flat = s[8:24, 2:8].mean()
    assert mid > flat


# ---------------------------------------------------------------------------
# wavelet family
# ---------------------------------------------------------------------------

def test_daub_banks_orthogonal_reconstruction():
    from xmipp3_tpu.ops.denoise import daub_dwt2, daub_idwt2
    rng = np.random.default_rng(6)
    x = rng.standard_normal((64, 64)).astype(np.float32)
    for kind in ("DAUB4", "DAUB12", "DAUB20"):
        ll, details = daub_dwt2(x, 3, kind)
        rec = np.asarray(daub_idwt2(ll, details, kind))
        np.testing.assert_allclose(rec, x, atol=1e-5)


def test_wavelet_remove_scale_zeroes_finest_band():
    from xmipp3_tpu.ops.denoise import daub_dwt2, wavelet_filter_2d
    rng = np.random.default_rng(7)
    x = rng.standard_normal((64, 64)).astype(np.float32)
    out = np.asarray(wavelet_filter_2d(x, "DAUB12", "remove_scale",
                                       scale=0))
    _, details = daub_dwt2(out, 1, "DAUB12")
    for b in details[0]:
        assert float(np.abs(b).max()) < 1e-4


def test_wavelet_central_keeps_center_only():
    from xmipp3_tpu.ops.denoise import wavelet_filter_2d
    x = np.zeros((64, 64), np.float32)
    x[32, 32] = 1.0   # central impulse
    x[4, 4] = 1.0     # peripheral impulse
    out = np.asarray(wavelet_filter_2d(x, "DAUB4", "central", R=10))
    assert out[32, 32] > 0.5
    assert abs(out[4, 4]) < 0.3


def test_wavelet_bayesian_denoises():
    from xmipp3_tpu.ops.denoise import wavelet_filter_2d
    rng = np.random.default_rng(8)
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) - 32
    clean = np.exp(-(xx ** 2 + yy ** 2) / (2 * 8.0 ** 2)).astype(np.float32)
    noisy = clean + rng.standard_normal((64, 64)).astype(np.float32) * 0.1
    out = np.asarray(wavelet_filter_2d(noisy, "DAUB12", "bayesian",
                                       scale=3))
    assert np.abs(out - clean).mean() < np.abs(noisy - clean).mean()


def test_cli_where_choice_siblings(tmp_path):
    """Grammar upgrade: several bare choices on one where-line all parse."""
    from xmipp3_tpu.core.image import save_image
    from xmipp3_tpu.programs import get_program
    rng = np.random.default_rng(9)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, rng.standard_normal((2, 32, 32)).astype(np.float32))
    for kind in ("DAUB4", "DAUB12", "DAUB20"):
        prog = get_program("transform_filter")
        rc = prog.run_with_args(
            f"-i {fn} -o {tmp_path}/o.mrcs --wavelet {kind} remove_scale"
            .split())
        assert rc == 0
