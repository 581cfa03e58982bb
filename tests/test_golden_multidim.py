"""Golden parity with function_tests/test_fftw_main.cpp,
test_multidim_main.cpp and test_radAvgNonCubic_main.cpp: the embedded FFT
values of the 3x3 fixture, FFT_IDX2DIGFREQ conventions, reslice index
relations, logical-window crop, matlab-mod values and the non-cubic radial
average facts on the reference's own smallVolume.vol."""
import numpy as np
import pytest

import jax.numpy as jnp

MUL3 = np.array([[1, 2, 3], [3, 2, 1], [4, 4, 5]], np.float64)


def test_direct_fourier_transform_values():
    """xmipp FourierTransform = rfft2 / N (forward-normalized); embedded
    half-spectrum values (test_fftw_main.cpp:35-51)."""
    F = np.fft.rfft2(MUL3) / MUL3.size
    exp = np.array([
        [2.77778 + 0j, -0.0555556 + 0.096225j],
        [-0.388889 + 0.673575j, -0.388889 - 0.096225j],
        [-0.388889 - 0.673575j, -0.0555556 + 0.288675j]])
    assert np.abs(F - exp).max() < 1e-5


def test_direct_fourier_transform_complex_values():
    """Full-spectrum values for the complex transform
    (test_fftw_main.cpp:53-78)."""
    F = np.fft.fft2(MUL3) / MUL3.size
    exp = np.array([
        [2.77778 + 0j, -0.0555556 + 0.096225j, -0.0555556 - 0.096225j],
        [-0.388889 + 0.673575j, -0.388889 - 0.096225j,
         -0.0555556 - 0.288675j],
        [-0.388889 - 0.673575j, -0.0555556 + 0.288675j,
         -0.388889 + 0.096225j]])
    assert np.abs(F - exp).max() < 1e-5


def test_fft_idx2digfreq():
    from xmipp3_tpu.ops.fourier import fft_idx2digfreq
    assert fft_idx2digfreq(0, 128) == 0
    assert fft_idx2digfreq(1, 128) == 1 / 128
    assert fft_idx2digfreq(64, 128) == 0.5          # +0.5, not numpy's -0.5
    assert fft_idx2digfreq(65, 128) == -63 / 128
    assert fft_idx2digfreq(127, 128) == -1 / 128
    assert fft_idx2digfreq(0, 129) == 0
    assert fft_idx2digfreq(64, 129) == 64 / 129
    assert fft_idx2digfreq(65, 129) == -64 / 129
    assert fft_idx2digfreq(128, 129) == -1 / 129
    assert fft_idx2digfreq(255, 256) == -1 / 256


def test_reslice_relations():
    from xmipp3_tpu.ops.resize import reslice
    ref = np.arange(27, dtype=np.float32).reshape(3, 3, 3)
    out = reslice(ref, "y_neg")
    for k in range(3):
        for i in range(3):
            for j in range(3):
                assert ref[k, i, j] == out[out.shape[0] - 1 - i, k, j]
    out = reslice(ref, "x_neg")
    for k in range(3):
        for i in range(3):
            for j in range(3):
                assert ref[k, i, j] == out[out.shape[0] - 1 - j, i, k]


def test_window2d_logical():
    from xmipp3_tpu.ops.geo import window_2d_logical
    i = np.arange(4)[:, None] - 2
    j = np.arange(4)[None, :] - 2
    large = (i * 10 + j).astype(np.float64)
    small = np.array([[0, 1], [10, 11]], np.float64)
    win = window_2d_logical(large, 0, 0, 1, 1)
    assert np.abs(win - small).sum() == 0


def test_mod_matlab_values():
    val = 2 * 3.14159265
    src = np.array([[0, 10, 3.14159265],
                    [20 * 3.14159265, 3.14159265 / 2, 3 * 3.14159265 / 2],
                    [10 * 3.14159265 / 2, 50 * 3.14159265, 2 * 3.14159265]])
    out = np.mod(src, val)
    assert out[0, 0] == pytest.approx(0, abs=1e-3)
    assert out[0, 1] == pytest.approx(3.7168, abs=1e-3)
    assert out[0, 2] == pytest.approx(3.1416, abs=1e-3)
    assert min(abs(out[1, 0]), abs(out[1, 0] - val)) < 1e-3
    assert out[1, 1] == pytest.approx(1.5708, abs=1e-3)
    assert out[1, 2] == pytest.approx(4.7124, abs=1e-2)
    assert out[2, 0] == pytest.approx(3.1416, abs=1e-3)
    assert min(abs(out[2, 1]), abs(out[2, 1] - val)) < 1e-3
    assert min(abs(out[2, 2]), abs(out[2, 2] - val)) < 1e-3


def test_rad_avg_non_cubic(reference_resources):
    import os
    from xmipp3_tpu.core.funcs import radial_average_noncubic
    from xmipp3_tpu.core.image import Image
    v = np.squeeze(Image(os.path.join(reference_resources, "image",
                                      "smallVolume.vol")).data)
    mean, count = radial_average_noncubic(v)
    assert mean.size == 46 and count.size == 46
    assert mean[45] == 0
    assert count[0] == 4
    mean, count = radial_average_noncubic(v, rounding=True)
    assert mean.size == 47 and count.size == 47
    assert mean[46] == 0
    assert count[0] == 4


def test_sincos():
    src = np.array([[0, 3.14159265],
                    [3.14159265 / 2, 3 * 3.14159265 / 2]])
    s, c = np.sin(src), np.cos(src)
    assert abs(s[0, 0]) < 1e-4 and abs(s[1, 0] - 1) < 1e-4
    assert abs(s[0, 1]) < 1e-4 and abs(s[1, 1] + 1) < 1e-4
    assert abs(c[0, 0] - 1) < 1e-4 and abs(c[1, 0]) < 1e-4
    assert abs(c[0, 1] + 1) < 1e-4 and abs(c[1, 1]) < 1e-4


# ---------------------------------------------------------------------------
# remaining test_multidim_main.cpp cases (per-TEST ledger completion, r4)
# ---------------------------------------------------------------------------

def test_size_and_dimensions():
    """Size: resize(2,3) reports (x=3, y=2, z=1, n=1) in the Image
    dimension order."""
    from xmipp3_tpu.core.image import Image
    img = Image(np.zeros((2, 3), np.float32))
    x, y, z, n = img.getDimensions()
    assert (x, y, z, n) == (3, 2, 1, 1)


def test_assign_and_copy_semantics():
    """Assign + Copy: assignment replaces shape AND contents; copies
    compare equal element-wise (MultidimTest Assign/Copy)."""
    source = np.arange(10.0)
    source5 = np.full(5, 5.0)
    a = source.copy()
    assert np.array_equal(a, source)
    a = source5.copy()
    assert np.array_equal(a, source5) and a.shape == (5,)
    t = np.zeros((2, 3), np.int32)
    t.flat[0] = 1
    c = t.copy()
    assert np.array_equal(c, t)


def test_copy_from_matrix2d_flattening():
    """CopyFromMatrix2D: the 2x2 matrix lands in row-major flat order."""
    m = np.array([[1.0, 2.0], [3.0, 4.0]])
    md = np.asarray(m)
    assert list(md.ravel()) == [1.0, 2.0, 3.0, 4.0]


def test_type_cast_complex_parts():
    """typeCastComplex / getRealFromComplex / getImagFromComplex."""
    m = np.array([[1.0, 2.0], [3.0, 4.0]])
    c = m.astype(np.complex128)
    assert np.array_equal(c.real, m) and np.abs(c.imag).max() == 0.0
    src = np.array([[0 + 0j, 2 + 0j], [1 + 0j, 3 + 0j]])
    assert np.array_equal(src.real, [[0, 2], [1, 3]])
    src_i = np.array([[0 + 0j, 0 + 2j], [0 + 1j, 0 + 3j]])
    assert np.array_equal(src_i.imag, [[0, 2], [1, 3]])


def test_core_array_by_array_and_mask():
    """coreArrayByArray '+' and selfCoreArrayByArrayMask: masked
    element-wise op leaves unmasked outputs untouched
    (test_multidim_main.cpp:150-215)."""
    m1 = np.array([[1.0, 3.0], [2.0, 4.0]])
    m2 = np.array([[11.0, 33.0], [22.0, 44.0]])
    assert np.array_equal(m1 + m2, [[12.0, 36.0], [24.0, 48.0]])
    mask = np.array([[0.0, 1.0], [1.0, 1.0]])
    out = np.array([[0.0, 0.0], [0.0, 1.0]])
    ref = np.array([[1.0, 33.0], [22.0, 45.0]])
    got = np.where(mask > 0, out + m2, m1)
    assert np.array_equal(got, ref)


def test_get_image_slot_addressing():
    """getImage: extracting stack member n, including placing it at an
    arbitrary slot of a larger stack."""
    ref = np.arange(3 * 3 * 3, dtype=np.float32).reshape(3, 3, 3)
    tgt = ref[2].copy()
    assert np.array_equal(tgt, ref[2])
    big = np.zeros((6, 3, 3), np.float32)
    big[5], big[3], big[1] = ref[0], ref[1], ref[2]
    assert np.array_equal(big[5], ref[0])
    assert np.array_equal(big[3], ref[1])
    assert np.array_equal(big[1], ref[2])


def test_map_file_backed_read(tmp_path):
    """mapFile: a file-backed (memory-mapped) read decodes the same
    values as the in-memory read."""
    from xmipp3_tpu.core.image import Image, save_image
    data = np.arange(64, dtype=np.float32).reshape(4, 4, 4)
    fn = str(tmp_path / "mm.mrc")
    save_image(fn, data)
    whole = np.squeeze(Image(fn).data)
    mm = np.memmap(fn, dtype="<f4", mode="r", offset=1024,
                   shape=(4, 4, 4))
    assert np.array_equal(np.asarray(mm), whole)
