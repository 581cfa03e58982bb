"""Golden parity with the reference function_tests/test_transformation_main.cpp
and test_filters_main.cpp — the embedded expected values transliterated
verbatim: BSPLINE3 rotate of the 3x3 fixture, 3D integer translate, nearest
scaleToSize, geo<->matrix roundtrip, matrix-string parsing,
correlation_matrix, regionGrowing3DEqualValue."""
import numpy as np
import pytest

import jax.numpy as jnp

MUL3 = np.array([[1, 2, 3], [3, 2, 1], [4, 4, 5]], np.float32)


def _vol333():
    vol = np.zeros((3, 3, 3), np.float32)
    vol[:, 1, :] = 1
    vol[:, 2, :] = 2
    vol[:, 0, :] = 3
    return vol


def test_rotate_bspline3_exact():
    """rotate(BSPLINE3, out, in, 10, DONT_WRAP) — the expected 3x3 from
    test_transformation_main.cpp:76-95. Pins mirror-off-bounds prefilter +
    zero-outside sampling."""
    from xmipp3_tpu.ops.geo import rotate_2d
    exp = np.array([[0, 2.1950049, 0],
                    [2.6541736, 2, 1.3803737],
                    [0, 3.9039731, 0]])
    out = np.asarray(rotate_2d(jnp.asarray(MUL3[None]), jnp.array([10.0]),
                               order=3, wrap=False))[0]
    assert np.abs(out - exp).max() < 1e-5


def test_translate_bspline3_volume():
    """translate by (0,1,0) with wrap: row i -> row (i+1) mod 3
    (test_transformation_main.cpp:97-113; integer shifts are exact for any
    spline order)."""
    from xmipp3_tpu.ops.geo import apply_affine_3d
    vol = _vol333()
    M = np.eye(3, 4, dtype=np.float32)
    M[1, 3] = 1.0
    out = np.asarray(apply_affine_3d(jnp.asarray(vol), jnp.asarray(M[None]),
                                     wrap=True))[0]
    ref = np.empty_like(vol)
    for i in range(3):
        ref[:, (i + 1) % 3, :] = vol[:, i, :]
    assert np.abs(out - ref).max() < 1e-5


def test_scale_to_size_nearest():
    """scaleToSize(NEAREST, out, in, 2, 2) must not modify the input (the
    reference test's actual assertion — it compares a pre-copy of the input
    against the input, never the output) and must produce a finite 2x2."""
    from xmipp3_tpu.ops.resize import spline_resize_2d
    src = MUL3.copy()
    out = np.asarray(spline_resize_2d(jnp.asarray(src[None]), 2, 2, order=0))[0]
    assert out.shape == (2, 2)
    assert np.isfinite(out).all()
    assert np.array_equal(src, MUL3)  # input untouched
    # every output sample must be one of the input values (nearest picks)
    assert all(v in MUL3.astype(float) for v in np.unique(out) if v != 0)


def test_geo_to_transformation_matrix_roundtrip_2d():
    from xmipp3_tpu.core.geometry import (geo_to_transformation_matrix,
                                          transformation_matrix_to_geo)
    geo = {"scale": 2.0, "psi": 54.5454545455, "x": 1.0, "y": 2.0,
           "flip": True}
    A = geo_to_transformation_matrix(geo, dim=2)
    back = transformation_matrix_to_geo(A)
    assert back["scale"] == pytest.approx(2.0, abs=1e-9)
    assert back["psi"] == pytest.approx(geo["psi"], abs=1e-9)
    assert back["x"] == pytest.approx(1.0, abs=1e-9)
    assert back["y"] == pytest.approx(2.0, abs=1e-9)
    assert back["flip"] is True


def test_geo_to_transformation_matrix_roundtrip_3d():
    from xmipp3_tpu.core.geometry import (geo_to_transformation_matrix,
                                          transformation_matrix_to_geo)
    geo = {"scale": 2.0, "rot": 40.9090909091, "tilt": 81.8181818182,
           "psi": 54.5454545455, "x": 1.0, "y": 2.0, "z": 3.0, "flip": True}
    A = geo_to_transformation_matrix(geo, dim=3)
    back = transformation_matrix_to_geo(A)
    for k in ("scale", "rot", "tilt", "psi", "x", "y", "z"):
        assert back[k] == pytest.approx(geo[k], abs=1e-8), k
    assert back["flip"] is True


def test_string_to_transformation_matrix():
    from xmipp3_tpu.core.geometry import transformation_matrix_from_string
    exp = np.eye(4)
    exp[0, :3] = [-1.1601138, -1.6291519, 2]
    exp[1, :3] = [-1.6291519, 1.1601138, 4]
    flat = (" -1.1601138 -1.6291519 2 0 "
            " -1.6291519  1.1601138 4 0 "
            "  0          0         1 0 "
            "  0          0         0 1 ")
    bracketed = (" [[-1.1601138 -1.6291519 2 0], "
                 "  [-1.6291519  1.1601138 4 0], "
                 "  [ 0          0         1 0], "
                 "  [ 0          0         0 1]] ")
    assert np.allclose(transformation_matrix_from_string(flat), exp)
    assert np.allclose(transformation_matrix_from_string(bracketed), exp)
    M3 = transformation_matrix_from_string(bracketed, dim=3)
    assert np.allclose(M3, exp[:3, :3])


def test_correlation_matrix_exact():
    """test_filters_main.cpp correlation_matrix: self-correlation of the
    3x3 fixture equals the embedded integers exactly."""
    from xmipp3_tpu.ops.shift import correlation_matrix
    exp = np.array([[64, 62, 66], [78, 85, 78], [66, 62, 64]], float)
    out = np.asarray(correlation_matrix(jnp.asarray(MUL3),
                                        jnp.asarray(MUL3)))[0]
    assert np.abs(out - exp).max() < 1e-3


def test_best_shift_self_zero():
    from xmipp3_tpu.ops.shift import best_shift
    dx, dy, _ = best_shift(jnp.asarray(MUL3), jnp.asarray(MUL3[None]))
    assert abs(float(dx[0])) < 1e-4 and abs(float(dy[0])) < 1e-4


def test_region_growing_3d_equal_value():
    """test_filters_main.cpp regionGrowing3DEqualValue: half the volume is
    zeros (the seed's region); the other half keeps label 1."""
    from xmipp3_tpu.ops.mask import region_growing_equal_value
    i = np.arange(50)[:, None]
    j = np.arange(50)[None, :]
    plane = np.where(i > 24, (i + j).astype(np.float64), 0.0)
    vol = np.broadcast_to(plane, (50, 50, 50)).copy()
    out = region_growing_equal_value(vol, seed=(0, 0, 0), filling_value=0)
    assert int((out > 0).sum()) == 25 * 50 * 50
