"""Golden parity with the reference function_tests/test_geometry_main.cpp:
angles2Matrix2Angles formula identity, rotation3DMatrix axis signs,
least-squares plane fit, normalize_ramp."""
import numpy as np

from xmipp3_tpu.core.geometry import (euler_matrix, matrix_to_euler,
                                      rotation3d_matrix)

TOL = 1e-5


def _formula_elems(x, y, z):
    """The six matrix elements test_geometry_main.cpp checks (its explicit
    ZYZ formula with rot=x, tilt=y, psi=z in radians)."""
    r11 = np.cos(z) * np.cos(y) * np.cos(x) - np.sin(z) * np.sin(x)
    r12 = np.cos(z) * np.cos(y) * np.sin(x) + np.sin(z) * np.cos(x)
    r13 = -np.cos(z) * np.sin(y)
    r22 = -np.sin(z) * np.cos(y) * np.sin(x) + np.cos(z) * np.cos(x)
    r23 = np.sin(z) * np.sin(y)
    r33 = np.cos(y)
    return np.array([r11, r12, r13, r22, r23, r33])


def test_angles2matrix2angles():
    step = 30.0
    grid = np.arange(0, 360, step, dtype=float)
    for zd in grid:
        for yd in grid:
            for xd in grid:
                M = np.asarray(euler_matrix(xd, yd, zd), np.float64)
                rot, tilt, psi = matrix_to_euler(M)
                got = _formula_elems(np.deg2rad(rot), np.deg2rad(tilt),
                                     np.deg2rad(psi))
                want = _formula_elems(np.deg2rad(xd), np.deg2rad(yd),
                                      np.deg2rad(zd))
                assert np.abs(got - want).max() < TOL, (xd, yd, zd)


def test_rotate_angle_around_axis():
    for sign in (-1, 1):
        M = rotation3d_matrix(90.0 * sign, [1, 0, 0])
        assert abs(M[1, 2] - sign) < TOL and abs(M[2, 1] + sign) < TOL
        M = rotation3d_matrix(90.0 * sign, [0, 1, 0])
        assert abs(M[0, 2] + sign) < TOL and abs(M[2, 0] - sign) < TOL
        M = rotation3d_matrix(90.0 * sign, [0, 0, 1])
        assert abs(M[0, 1] - sign) < TOL and abs(M[1, 0] + sign) < TOL


def test_least_squares_plane_fit_all_points():
    from xmipp3_tpu.ops.normalize import least_squares_plane_fit
    # img(i,j) = i + j over logical coords (4x4 centered at index 2)
    i = np.arange(4)[:, None] - 2
    j = np.arange(4)[None, :] - 2
    img = (i + j).astype(np.float32)
    a, b, c = np.asarray(least_squares_plane_fit(img[None]))[0]
    assert abs(a - 1) < TOL and abs(b - 1) < TOL and abs(c) < TOL


def test_normalize_ramp_exact_plane():
    from xmipp3_tpu.ops.normalize import normalize_ramp
    i = np.arange(4)[:, None] - 2
    j = np.arange(4)[None, :] - 2
    img = (i + j).astype(np.float32)
    out = np.asarray(normalize_ramp(img[None]))[0]
    assert np.abs(out).sum() < 1e-4
