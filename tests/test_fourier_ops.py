import numpy as np
import pytest

from xmipp3_tpu.ops.fourier import (fourier_shift_2d, good_fft_sizes,
                                    hermitian_full_from_half,
                                    next_good_fft_size, radial_average_half,
                                    rfft2)
from xmipp3_tpu.ops.fourier_filter import (FourierFilter, apply_fourier_mask_2d,
                                           band_pass_mask, bfactor_mask,
                                           gaussian_mask, high_pass_mask,
                                           low_pass_mask, real_gaussian_mask,
                                           sparsify, stop_band_mask)


def test_good_sizes():
    assert next_good_fft_size(100) == 100
    assert next_good_fft_size(101) == 108
    assert all(s >= 127 for s in good_fft_sizes(127))


def test_fourier_shift_matches_roll():
    rng = np.random.default_rng(0)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    out = np.asarray(fourier_shift_2d(img[None], 3.0, -5.0))[0]
    np.testing.assert_allclose(out, np.roll(img, (-5, 3), axis=(0, 1)),
                               atol=1e-4)


def test_hermitian_reconstruction():
    rng = np.random.default_rng(1)
    img = rng.standard_normal((16, 16)).astype(np.float32)
    half = np.asarray(rfft2(img[None]))[0]
    full = np.asarray(hermitian_full_from_half(half, 16))
    np.testing.assert_allclose(full, np.fft.fft2(img), atol=1e-3)


def test_lowpass_kills_high_freq():
    n = 64
    x = np.arange(n)
    low = np.cos(2 * np.pi * 4 * x / n)[None, :].repeat(n, 0).astype(np.float32)
    high = np.cos(2 * np.pi * 28 * x / n)[None, :].repeat(n, 0).astype(np.float32)
    img = low + high
    out = np.asarray(apply_fourier_mask_2d(img, low_pass_mask(n, n, 0.2)))
    # low survives, high is gone
    assert np.abs(out - low).max() < 0.02


def test_highpass_complements_lowpass():
    n = 32
    lp = low_pass_mask(n, n, 0.2, 0.05)
    hp = high_pass_mask(n, n, 0.2, 0.05)
    np.testing.assert_allclose(lp + hp, np.ones_like(lp), atol=1e-5)


def test_bandpass_stopband_complement():
    n = 32
    bp = band_pass_mask(n, n, 0.1, 0.3, 0.02)
    sb = stop_band_mask(n, n, 0.1, 0.3, 0.02)
    np.testing.assert_allclose(bp + sb, np.ones_like(bp), atol=1e-5)


def test_real_gaussian_equals_spatial_convolution():
    rng = np.random.default_rng(2)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    sigma = 2.0
    out = np.asarray(apply_fourier_mask_2d(img, real_gaussian_mask(64, 64, sigma)))
    # compare with direct convolution via scipy
    from scipy.ndimage import gaussian_filter
    ref = gaussian_filter(img, sigma, mode="wrap")
    np.testing.assert_allclose(out, ref, atol=5e-3)


def test_sparsify_keeps_strongest():
    rng = np.random.default_rng(3)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    out = np.asarray(sparsify(img[None], p=0.9))[0]
    spec = np.fft.fft2(out)
    nonzero = np.count_nonzero(np.abs(spec) > 1e-4)
    assert nonzero <= int(spec.size * 0.12)


def test_filter_engine_cli_style():
    rng = np.random.default_rng(4)
    imgs = rng.standard_normal((4, 32, 32)).astype(np.float32)
    f = FourierFilter("low_pass", ["0.25", "0.02"])
    out = np.asarray(f.apply(imgs))
    assert out.shape == imgs.shape
    # angstrom cutoff with sampling: 4 Å cutoff at 1 Å/px = 0.25 digital
    f2 = FourierFilter("low_pass", ["4", "0.02"], sampling=1.0)
    out2 = np.asarray(f2.apply(imgs))
    np.testing.assert_allclose(out, out2, atol=1e-5)


def test_radial_average():
    n = 64
    r_img = np.ones((1, n, n // 2 + 1), np.float32)
    avg = np.asarray(radial_average_half(r_img, 16))[0]
    np.testing.assert_allclose(avg, np.ones(16), atol=1e-5)
