"""Reference-formula golden tests (VERDICT round-1 item #10): assert
VALUES against closed-form expectations for the most-used primitives —
fourier_filter frequency responses, normalize-mode statistics,
transform_geometry B-spline warps vs scipy's independent implementation,
CTF model values, resize, and shift/rotation recovery at sub-pixel
precision."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp


# ---------------------------------------------------------------------------
# fourier_filter: measured frequency response == designed response
# ---------------------------------------------------------------------------

def _response_at(mask, n, fy_cyc, fx_cyc):
    """Measured gain of a filter mask at a pure cosine frequency."""
    from xmipp3_tpu.ops.fourier_filter import apply_fourier_mask_2d
    y, x = np.mgrid[0:n, 0:n].astype(np.float64)
    img = np.cos(2 * np.pi * (fy_cyc * y + fx_cyc * x)).astype(np.float32)
    out = np.asarray(apply_fourier_mask_2d(jnp.asarray(img[None]),
                                           jnp.asarray(mask)))[0]
    denom = float((img * img).sum())
    return float((out * img).sum()) / denom


class TestFourierFilterResponses:
    n = 64

    def test_lowpass_passband_and_stopband(self):
        from xmipp3_tpu.ops.fourier_filter import low_pass_mask
        m = np.asarray(low_pass_mask(self.n, self.n, 0.25, raised_w=0.02))
        assert _response_at(m, self.n, 0.0, 8 / 64) == \
            pytest.approx(1.0, abs=1e-3)          # 0.125 < 0.25: passes
        assert _response_at(m, self.n, 0.0, 24 / 64) == \
            pytest.approx(0.0, abs=1e-3)          # 0.375 > 0.25: blocked

    def test_highpass_mirror_of_lowpass(self):
        from xmipp3_tpu.ops.fourier_filter import high_pass_mask
        m = np.asarray(high_pass_mask(self.n, self.n, 0.25, raised_w=0.02))
        assert _response_at(m, self.n, 0.0, 8 / 64) == \
            pytest.approx(0.0, abs=1e-3)
        assert _response_at(m, self.n, 0.0, 24 / 64) == \
            pytest.approx(1.0, abs=1e-3)

    def test_bandpass_edges(self):
        from xmipp3_tpu.ops.fourier_filter import band_pass_mask
        m = np.asarray(band_pass_mask(self.n, self.n, 0.125, 0.375,
                                      raised_w=0.02))
        assert _response_at(m, self.n, 0.0, 16 / 64) == \
            pytest.approx(1.0, abs=1e-3)          # inside band
        assert _response_at(m, self.n, 0.0, 4 / 64) == \
            pytest.approx(0.0, abs=1e-3)          # below
        assert _response_at(m, self.n, 0.0, 28 / 64) == \
            pytest.approx(0.0, abs=1e-3)          # above

    def test_gaussian_response_value(self):
        from xmipp3_tpu.ops.fourier_filter import gaussian_mask
        sigma = 0.15
        m = np.asarray(gaussian_mask(self.n, self.n, sigma))
        f = 8 / 64
        expected = np.exp(-f * f / (2 * sigma * sigma))
        assert _response_at(m, self.n, 0.0, f) == \
            pytest.approx(expected, abs=2e-3)

    def test_bfactor_response_value(self):
        from xmipp3_tpu.ops.fourier_filter import bfactor_mask
        B, Ts = 200.0, 2.0
        m = np.asarray(bfactor_mask(self.n, self.n, B, Ts))
        f_dig = 8 / 64
        expected = np.exp(-(B / 4.0) * (f_dig / Ts) ** 2)
        assert _response_at(m, self.n, 0.0, f_dig) == \
            pytest.approx(expected, rel=2e-3)


# ---------------------------------------------------------------------------
# normalize modes: output statistics match the mode's defining contract
# ---------------------------------------------------------------------------

class TestNormalizeGolden:
    def _data(self):
        rng = np.random.default_rng(0)
        n = 48
        y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
        signal = 3.0 * np.exp(-(x ** 2 + y ** 2) / 30)
        imgs = (signal[None] + rng.normal(2.0, 1.5, (6, n, n))) \
            .astype(np.float32)
        bg = (np.sqrt(x ** 2 + y ** 2) > n // 2 - 4)
        return imgs, bg

    def test_new_xmipp_background_stats(self):
        """NewXmipp: background -> mean 0, std 1 (data/normalize.h:201)."""
        from xmipp3_tpu.ops.normalize import normalize_new_xmipp
        imgs, bg = self._data()
        out = np.asarray(normalize_new_xmipp(imgs, jnp.asarray(bg)))
        for im in out:
            assert im[bg].mean() == pytest.approx(0.0, abs=5e-2)
            assert im[bg].std() == pytest.approx(1.0, abs=5e-2)

    def test_old_xmipp_global_stats(self):
        """OldXmipp: whole image -> mean 0, std 1."""
        from xmipp3_tpu.ops.normalize import normalize_old_xmipp
        imgs, _ = self._data()
        out = np.asarray(normalize_old_xmipp(imgs))
        for im in out:
            assert im.mean() == pytest.approx(0.0, abs=1e-4)
            assert im.std() == pytest.approx(1.0, abs=1e-4)

    def test_ramp_removes_plane(self):
        """Ramp: the background-plane fit removes a pure gradient exactly
        (reference Ramp mode = least-squares plane subtraction)."""
        from xmipp3_tpu.ops.normalize import subtract_background_plane
        n = 48
        y, x = np.mgrid[0:n, 0:n].astype(np.float32)
        plane = (0.3 * x - 0.2 * y + 5.0)[None].astype(np.float32)
        bg = np.ones((n, n), bool)
        out = np.asarray(subtract_background_plane(plane, jnp.asarray(bg)))
        assert np.abs(out).max() < 1e-3 * np.abs(plane).max()


# ---------------------------------------------------------------------------
# transform_geometry B-spline vs scipy.ndimage (independent implementation)
# ---------------------------------------------------------------------------

class TestGeometryVsScipy:
    def test_bspline_rotation_matches_scipy(self):
        # scipy.ndimage.affine_transform with the SAME center convention
        # (n//2) and rotation sense reproduces rotate_2d to float noise
        from scipy.ndimage import affine_transform
        from xmipp3_tpu.ops.geo import rotate_2d
        n = 64
        y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
        img = (np.exp(-(x ** 2 + y ** 2) / 200)
               * np.cos(0.3 * x) * np.sin(0.2 * y)).astype(np.float32)
        ang = 23.0
        ours = np.asarray(rotate_2d(img[None], jnp.asarray([ang]),
                                    order=3))[0]
        a = np.deg2rad(ang)
        R = np.array([[np.cos(a), np.sin(a)], [-np.sin(a), np.cos(a)]])
        ctr = np.array([n // 2, n // 2])
        ref = affine_transform(img.astype(np.float64), R,
                               offset=ctr - R @ ctr, order=3,
                               mode="constant")
        c = slice(n // 4, 3 * n // 4)
        assert np.abs(ours[c, c] - ref[c, c]).max() < 1e-5

    def test_bspline_shift_matches_scipy(self):
        from scipy.ndimage import shift as scipy_shift
        from xmipp3_tpu.ops.geo import shift_2d_real
        n = 64
        y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
        img = np.exp(-(x ** 2 + y ** 2) / 120).astype(np.float32)
        sx, sy = 3.3, -1.7
        ours = np.asarray(shift_2d_real(img[None], jnp.asarray([sx]),
                                        jnp.asarray([sy]), order=3))[0]
        ref = scipy_shift(img.astype(np.float64), (sy, sx), order=3,
                          mode="constant")
        c = slice(8, n - 8)
        assert np.abs(ours[c, c] - ref[c, c]).max() < 5e-3


# ---------------------------------------------------------------------------
# subpixel shift/rotation recovery at known ground truth
# ---------------------------------------------------------------------------

class TestAlignmentGolden:
    def test_best_shift_subpixel(self):
        from xmipp3_tpu.ops.fourier import fourier_shift_2d
        from xmipp3_tpu.ops.shift import best_shift
        n = 64
        y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
        ref = np.exp(-(x ** 2 + y ** 2) / 60).astype(np.float32) + \
            0.3 * np.exp(-((x - 9) ** 2 + y ** 2) / 20).astype(np.float32)
        true_sx, true_sy = 2.31, -1.62
        moved = np.asarray(fourier_shift_2d(ref[None], true_sx, true_sy))
        dsx, dsy, _ = best_shift(jnp.asarray(ref[None]),
                                 jnp.asarray(moved), max_shift=8)
        assert float(dsx[0]) == pytest.approx(-true_sx, abs=0.05)
        assert float(dsy[0]) == pytest.approx(-true_sy, abs=0.05)

    def test_ctf_known_zero_crossing(self):
        """First CTF zero at the textbook frequency sqrt(1/(lambda*defocus))
        for Cs=0, Q0=0 (data/ctf.h forward model)."""
        from xmipp3_tpu.ops.ctf import CTFDescription
        ctf = CTFDescription(sampling_rate=1.0, voltage=300, Cs=0.0,
                             Q0=0.0, defocusU=15000, defocusV=15000, K=1.0)
        lam = 12.2643247 / np.sqrt(300e3 * (1 + 0.978466e-6 * 300e3))
        f_zero = np.sqrt(1.0 / (lam * 15000.0))
        measured = ctf.first_zero_freq()
        assert measured == pytest.approx(f_zero, abs=2.5e-4)


class TestKaiserBlobFourierPair:
    """The analytic blob Fourier transform (Lewitt closed forms,
    reference blobs.cpp:144-166) must equal the numeric 3-D FT of the
    sampled profile — this is the pair the gridding deapodization
    relies on."""

    def _numeric_pair(self, a, alpha, m, n=64, dx=0.25):
        from xmipp3_tpu.ops.basis import kaiser_value
        ax = (np.arange(n) - n // 2) * dx
        z, y, x = np.meshgrid(ax, ax, ax, indexing="ij")
        r = np.sqrt(x * x + y * y + z * z)
        vol = kaiser_value(r, a=a, alpha=alpha, m=m)
        F = np.fft.fftshift(np.abs(np.fft.fftn(np.fft.ifftshift(vol))))
        F = F * dx ** 3                        # Riemann-sum FT scale
        freqs = np.fft.fftshift(np.fft.fftfreq(n, d=dx))
        # radial line through the center
        return freqs[n // 2:], F[n // 2, n // 2, n // 2:]

    @pytest.mark.parametrize("m,alpha", [(2, 10.4), (0, 15.0)])
    def test_analytic_matches_numeric(self, m, alpha):
        from xmipp3_tpu.ops.basis import kaiser_fourier_value
        a = 2.0
        freqs, numeric = self._numeric_pair(a, alpha, m)
        analytic = kaiser_fourier_value(freqs, a=a, alpha=alpha, m=m)
        sel = freqs < 1.2                      # resolved band
        scale = analytic[0]
        err = np.abs(numeric[sel] - analytic[sel]).max() / scale
        assert err < 2e-3
        # DC value equals the blob mass
        assert abs(numeric[0] - analytic[0]) / scale < 1e-3
