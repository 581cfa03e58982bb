"""Golden parity with the reference function_tests/test_euler_main.cpp:
every embedded expected matrix and the full 24-order extract/toMatrix
roundtrip grid, transliterated with the reference's own values and
XMIPP_EQUAL_ACCURACY-class tolerances."""
import numpy as np

from xmipp3_tpu.core import euler_orders as eo
from xmipp3_tpu.core.geometry import euler_matrix

TOL = 1e-6


def test_euler_xmipp_match():
    """Euler(z,y,x rad, ZYZ).toMatrix == Euler_angles2matrix(x,y,z deg)
    (test_euler_main.cpp eulerXmippMatch — 'euler and xmipp are inverse')."""
    g = np.arange(0, 360, 30, dtype=float)
    Z, Y, X = np.meshgrid(g, g, g, indexing="ij")
    M1 = eo.to_matrix(np.deg2rad(Z), np.deg2rad(Y), np.deg2rad(X), eo.ZYZ)
    M2 = np.empty_like(M1)
    for a, z in enumerate(g):
        for b, y in enumerate(g):
            for c, x in enumerate(g):
                M2[a, b, c] = euler_matrix(x, y, z)
    assert np.abs(M1 - M2).max() < 1e-5  # euler_matrix computes in f32

    # second half of the reference test: extract->toMatrix equals the
    # matrix2angles->angles2matrix roundtrip of the same matrix
    x2, y2, z2 = eo.extract(M1, eo.ZYZ)
    M3 = eo.to_matrix(x2, y2, z2, eo.ZYZ)
    assert np.abs(M3 - M1).max() < TOL


def test_euler_rotate_x():
    out = eo.euler_rotate(np.eye(4), [0.5, 0.0, 0.0])
    exp = np.array([[1, 0, 0, 0],
                    [0, 0.87758255, 0.47942555, 0],
                    [0, -0.47942555, 0.87758255, 0],
                    [0, 0, 0, 1]])
    assert np.abs(out - exp).max() < TOL


def test_euler_rotate_y():
    out = eo.euler_rotate(np.eye(4), [0.0, 0.25, 0.0])
    exp = np.array([[0.96891242, 0, -0.24740396, 0],
                    [0, 1, 0, 0],
                    [0.24740396, 0, 0.96891242, 0],
                    [0, 0, 0, 1]])
    assert np.abs(out - exp).max() < TOL


def test_euler_rotate_z():
    out = eo.euler_rotate(np.eye(4), [0.0, 0.0, 0.75])
    exp = np.array([[0.73168886, 0.68163878, 0, 0],
                    [-0.68163878, 0.73168886, 0, 0],
                    [0, 0, 1, 0],
                    [0, 0, 0, 1]])
    assert np.abs(out - exp).max() < TOL


def test_euler_rotate_xyz():
    out = eo.euler_rotate(np.eye(4), [0.123, -1.234, 2.345])
    exp = np.array([[-2.310437e-01, 2.362753e-01, 9.438182e-01, 0],
                    [-6.286172e-01, -7.766573e-01, 4.054479e-02, 0],
                    [7.426031e-01, -5.839327e-01, 3.279685e-01, 0],
                    [0, 0, 0, 1]])
    assert np.abs(out - exp).max() < TOL


def test_euler_angles_xyz():
    out = eo.to_matrix(-3.05844, -0.233197, 0.369401, eo.ORDERS["XYZ"])
    exp = np.array([[9.073022e-01, 3.512840e-01, 2.310892e-01],
                    [3.777082e-01, -9.223917e-01, -8.080873e-02],
                    [1.847679e-01, 1.606022e-01, -9.695709e-01]])
    assert np.abs(out - exp).max() < TOL


def test_euler_angles_xzy():
    """The reference's eulerAnglesXZY case: same XYZ order, swapped args."""
    out = eo.to_matrix(0.369401, -0.233197, -3.05844, eo.ORDERS["XYZ"])
    exp = np.array([[-0.96957093, -0.080808729, 0.23108916],
                    [0.16060221, -0.92239171, 0.35128403],
                    [0.18476792, 0.3777082, 0.9073022]])
    assert np.abs(out - exp).max() < TOL


def test_extract_all_24_orders():
    """toMatrix(extract(M)) == M for every order on the reference's
    -360..360 step-30 grid (test_euler_main.cpp extract)."""
    g = np.deg2rad(np.arange(-360, 360, 30, dtype=float))
    Z, Y, X = np.meshgrid(g, g, g, indexing="ij")
    for order in eo.ORDER_LIST:
        M = eo.to_matrix(X, Y, Z, order)
        x2, y2, z2 = eo.extract(M, order)
        M2 = eo.to_matrix(x2, y2, z2, order)
        assert np.abs(M - M2).max() < TOL, hex(order)
