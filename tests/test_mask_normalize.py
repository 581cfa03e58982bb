import numpy as np
import pytest

from xmipp3_tpu.ops.mask import (background_mask, circular_mask, crown_mask,
                                 raised_cosine_window_1d, rectangular_mask)
from xmipp3_tpu.ops.normalize import (normalize, normalize_old_xmipp,
                                      normalize_ramp, normalize_robust,
                                      subtract_background_plane)


def test_circular_mask_area():
    m = circular_mask((64, 64), 20)
    assert abs(m.sum() - np.pi * 400) / (np.pi * 400) < 0.02
    assert m[32, 32] == 1.0
    assert m[0, 0] == 0.0


def test_crown_and_background():
    c = crown_mask((64, 64), 10, 20)
    assert c[32, 32] == 0.0
    assert c[32, 32 + 15] == 1.0
    b = background_mask((64, 64), 30)
    assert b[32, 32] == 0.0
    assert b[0, 0] == 1.0


def test_spherical_mask():
    m = circular_mask((32, 32, 32), 10)
    assert m[16, 16, 16] == 1.0
    vol = 4 / 3 * np.pi * 1000
    assert abs(m.sum() - vol) / vol < 0.05


def test_rect_mask():
    m = rectangular_mask((32, 32), 5, 8)
    assert m.sum() == (2 * 5 + 1) * (2 * 8 + 1)


def test_old_xmipp():
    rng = np.random.default_rng(0)
    img = (5.0 + 3.0 * rng.standard_normal((4, 32, 32))).astype(np.float32)
    out = np.asarray(normalize_old_xmipp(img))
    np.testing.assert_allclose(out.mean(axis=(1, 2)), 0, atol=1e-5)
    np.testing.assert_allclose(out.std(axis=(1, 2)), 1, atol=1e-5)


def test_plane_subtraction_recovers():
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    plane = 2.0 + 0.1 * (x - 32) - 0.05 * (y - 32)
    rng = np.random.default_rng(1)
    signal = np.zeros((64, 64), np.float32)
    signal[28:36, 28:36] = 5.0  # particle in the middle
    img = (plane + signal).astype(np.float32)
    bg = background_mask((64, 64), 20)
    out = np.asarray(subtract_background_plane(img[None], bg))[0]
    # background should be ~0 after plane removal
    assert np.abs(out[bg > 0]).max() < 1e-2
    assert out[32, 32] == pytest.approx(5.0, abs=0.02)


def test_normalize_ramp_zero_background():
    rng = np.random.default_rng(2)
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    img = (0.2 * x + rng.standard_normal((64, 64))).astype(np.float32)
    out = np.asarray(normalize_ramp(img[None]))[0]
    bg = background_mask((64, 64)) > 0
    assert abs(out[bg].mean()) < 0.05
    assert out[bg].std() == pytest.approx(1.0, abs=0.05)


def test_robust_resists_outliers():
    rng = np.random.default_rng(3)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    img[0, 0] = 1e4
    out = np.asarray(normalize_robust(img))
    assert abs(np.median(out)) < 0.05


def test_dispatch_methods():
    rng = np.random.default_rng(4)
    img = rng.standard_normal((2, 32, 32)).astype(np.float32)
    for m in ("OldXmipp", "NewXmipp", "Ramp", "Robust", "Michael"):
        out = np.asarray(normalize(img, m))
        assert out.shape == img.shape and np.isfinite(out).all()
    with pytest.raises(ValueError):
        normalize(img, "nope")


def test_piece_smoother():
    w = raised_cosine_window_1d(64, 0.5)
    assert w[0] < 0.1 and w[32] == 1.0 and w[-1] < 0.1
    np.testing.assert_allclose(w, w[::-1], atol=1e-6)

# ---------------------------------------------------------------------------
# Reference normalize method family (data/normalize.cpp)
# ---------------------------------------------------------------------------

def _bg(shape, r):
    return np.asarray(background_mask(shape, r))


def test_near_old_xmipp_values():
    from xmipp3_tpu.ops.normalize import normalize_near_old_xmipp
    rng = np.random.default_rng(5)
    img = (rng.standard_normal((32, 32)) * 3 + 7).astype(np.float32)
    bg = _bg(img.shape, 12)
    out = np.asarray(normalize_near_old_xmipp(img, bg))
    # I = (I - mean(I)) / std(bg)
    exp = (img - img.mean()) / img[bg > 0.5].std()
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-4)


def test_new_xmipp2_values():
    from xmipp3_tpu.ops.normalize import normalize_new_xmipp2
    rng = np.random.default_rng(6)
    img = (rng.standard_normal((32, 32)) + 4).astype(np.float32)
    img[12:20, 12:20] += 10.0  # bright particle
    bg = _bg(img.shape, 12)
    out = np.asarray(normalize_new_xmipp2(img, bg))
    mbg = img[bg > 0.5].mean()
    exp = (img - mbg) / (img.mean() - mbg)
    np.testing.assert_allclose(out, exp, rtol=1e-3, atol=1e-3)


def test_robust_reference_median_p99_and_clip():
    from xmipp3_tpu.ops.normalize import normalize_robust_reference
    rng = np.random.default_rng(7)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    bg = _bg(img.shape, 12)
    out = normalize_robust_reference(img, bg)
    bgv = img[bg > 0.5]
    fg = img[bg <= 0.5]
    p99 = np.sort(fg)[int(fg.size * 0.99)]
    exp = (img - np.median(bgv)) / p99
    np.testing.assert_allclose(out, exp, rtol=1e-4, atol=1e-4)
    clipped = normalize_robust_reference(img * 100, bg, clip=True)
    assert clipped.max() <= 1.3284 + 1e-6
    assert clipped.min() >= -1.3284 - 1e-6


def test_remove_dust_replaces_only_outliers():
    from xmipp3_tpu.ops.normalize import remove_dust
    rng = np.random.default_rng(8)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    img[5, 5] = 50.0   # white dust
    img[9, 9] = -50.0  # black dust
    out = remove_dust(img, thr_black=-4.0, thr_white=4.0,
                      rng=np.random.default_rng(0))
    assert abs(out[5, 5]) < 10 and abs(out[9, 9]) < 10
    untouched = np.ones(img.shape, bool)
    untouched[5, 5] = untouched[9, 9] = False
    np.testing.assert_array_equal(out[untouched], img[untouched])


def test_neighbour_mode_rescales_background():
    from xmipp3_tpu.ops.normalize import normalize_remove_neighbours
    rng = np.random.default_rng(9)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    # add a background plane — Neighbour removes it
    yy, xx = np.mgrid[0:64, 0:64].astype(np.float32) - 32
    img_p = img + 0.05 * xx - 0.03 * yy + 2.0
    bg = _bg(img.shape, 24)
    out = normalize_remove_neighbours(img_p, bg, threshold=3.0,
                                      rng=np.random.default_rng(0))
    bgv = out[bg > 0.5]
    assert abs(bgv.mean()) < 0.1
    assert abs(bgv.std() - 1.0) < 0.1


def test_tomography_zero_tilt_standardizes():
    from xmipp3_tpu.ops.normalize import normalize_tomography
    rng = np.random.default_rng(10)
    img = (rng.standard_normal((48, 48)) * 2 + 5).astype(np.float32)
    out, mu, sigma = normalize_tomography(img, 0.0)
    # in-band accepted stats are standardized; gaussian noise → nearly all
    # pixels accepted, so global stats land near (0, 1)
    assert abs(mu - img.mean()) < 0.3
    assert abs(out.mean()) < 0.1 and abs(out.std() - 1.0) < 0.1
    # tilt scales the denominator by cos(tilt)
    out45, _, _ = normalize_tomography(img, 45.0)
    band = np.abs(np.arange(48) - 24) <= int(48 * np.cos(np.pi / 4) / 2)
    ratio = out[:, band].std() / out45[:, band].std()
    np.testing.assert_allclose(ratio, np.cos(np.pi / 4), atol=0.08)


def test_tomography_tilt_mask_zeroes_outside_band():
    from xmipp3_tpu.ops.normalize import normalize_tomography
    rng = np.random.default_rng(11)
    img = rng.standard_normal((48, 48)).astype(np.float32)
    out, _, _ = normalize_tomography(img, 60.0, tilt_mask=True)
    assert np.all(out[:, :5] == 0.0) and np.all(out[:, -5:] == 0.0)
    assert out[:, 20:28].std() > 0.5


def test_normalize_cli_random_and_dust(tmp_path):
    from xmipp3_tpu.core.image import Image, save_image
    from xmipp3_tpu.programs import get_program
    rng = np.random.default_rng(12)
    data = (rng.standard_normal((3, 24, 24)) + 1).astype(np.float32)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, data)
    out = str(tmp_path / "r.mrcs")
    prog = get_program("transform_normalize")
    rc = prog.run_with_args(
        f"-i {fn} -o {out} --method Random --prm 2 2 5 5".split())
    assert rc == 0
    res = Image.read_stack(out)
    np.testing.assert_allclose(res, data * 2 + 5, rtol=1e-5, atol=1e-5)


def test_mask_substitute_avg_and_count(tmp_path, capsys):
    from xmipp3_tpu.core.image import Image, save_image
    from xmipp3_tpu.programs import get_program
    data = np.zeros((1, 16, 16), np.float32)
    data[0, 8, 8] = 4.0
    data[0, 0, 0] = -9.0  # outside circular mask r=6
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, data)
    out = str(tmp_path / "m.mrcs")
    prog = get_program("transform_mask")
    rc = prog.run_with_args(
        f"-i {fn} -o {out} --mask circular -6 --substitute avg".split())
    assert rc == 0
    res = Image.read_stack(out)
    np.testing.assert_allclose(res[0, 0, 0], data[0].mean(), atol=1e-5)
    assert res[0, 8, 8] == 4.0
    # count mode: pixels >= 1 inside the mask
    prog2 = get_program("transform_mask")
    rc = prog2.run_with_args(
        f"-i {fn} --mask circular -6 --count_above 1".split())
    assert rc == 0
    cap = capsys.readouterr().out
    assert "above 1" in cap and "= 1" in cap


def test_blob_circular_mask_reference_parity():
    """blob_circular/blob_crown vs a numpy transliteration of the
    reference BlobCircularMask/BlobCrownMask loops (data/mask.cpp:219-308)."""
    from scipy import special

    from xmipp3_tpu.ops.mask import blob_circular_mask, blob_crown_mask

    def blob_val(r, a, alpha, m):
        if r > a:
            return 0.0
        rt = np.sqrt(max(1 - (r / a) ** 2, 0.0))
        return rt ** m * special.iv(m, alpha * rt) / special.iv(m, alpha)

    n, r1, w, order, alpha = 17, 4.0, 3.0, 2, 10.4
    got_in = blob_circular_mask((n, n), r1, w, order, alpha, inner=True)
    got_out = blob_circular_mask((n, n), r1, w, order, alpha, inner=False)
    want_in = np.zeros((n, n))
    want_out = np.zeros((n, n))
    for i in range(n):
        for j in range(n):
            r = np.hypot(i - n // 2, j - n // 2)
            want_in[i, j] = 1.0 if r <= r1 else blob_val(r - r1, w, alpha,
                                                         order)
            want_out[i, j] = 1.0 if r >= r1 else blob_val(r1 - r, w, alpha,
                                                          order)
    np.testing.assert_allclose(got_in, want_in, atol=1e-6)
    np.testing.assert_allclose(got_out, want_out, atol=1e-6)
    # crown inner = outside(r1) * inside(r2); outer = inside(r1)+outside(r2)
    r2 = 7.0
    np.testing.assert_allclose(
        blob_crown_mask((n, n), r1, r2, w, order, alpha, inner=True),
        want_out * blob_circular_mask((n, n), r2, w, order, alpha,
                                      inner=True), atol=1e-6)


def test_transform_mask_blob_cli(tmp_path):
    from xmipp3_tpu.core.image import Image, save_image
    from xmipp3_tpu.ops.mask import blob_circular_mask
    from xmipp3_tpu.programs import get_program

    data = np.ones((1, 16, 16), np.float32)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, data)
    out = str(tmp_path / "m.mrcs")
    prog = get_program("transform_mask")
    rc = prog.run_with_args(
        f"-i {fn} -o {out} --mask blob_circular 5 -2 -m 2 -a 10.4".split())
    assert rc == 0
    res = Image.read_stack(out)
    want = blob_circular_mask((16, 16), 5.0, 2.0, 2, 10.4, inner=True)
    np.testing.assert_allclose(res[0], want, atol=1e-5)
