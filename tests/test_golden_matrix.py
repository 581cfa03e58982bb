"""Transliteration of the reference matrix gtest
(applications/tests/function_tests/test_matrix_main.cpp): the embedded
expected values for inverse, det3x3, solveLinearSystem, RANSAC weighted
LSQ, schur, generalizedEigs, firstEigs/lastEigs and
connectedComponentsOfUndirectedGraph, asserted against core/numerics.py.

initGaussian is not ported: its goldens are tied to the reference's own
legacy random generator stream, which is not a behavior contract."""
import numpy as np

from xmipp3_tpu.core.numerics import (connected_components_undirected,
                                      first_eigs, generalized_eigs,
                                      last_eigs,
                                      ransac_weighted_least_squares,
                                      schur_decomposition,
                                      solve_linear_system)


def test_inverse_goldens():
    # MatrixTest.inverse
    R = np.array([[-0.9234482, -0.38372311, 0],
                  [0.38372311, -0.9234482, 0],
                  [0, 0, 1.0]])
    expected = np.array([[-0.9234482, 0.38372311, 0],
                         [-0.38372311, -0.9234482, 0],
                         [0, 0, 1.0]])
    assert np.allclose(np.linalg.inv(R), expected, atol=1e-7)
    M = np.array([[1, 2, 3, -4], [3, -4, 5, 6],
                  [5, 6, 7, -8], [7, -8, 9, 10]], float)
    Minv_expected = np.array(
        [[-0.437500, -0.562500, 0.187500, 0.312500],
         [-0.500000, 0.625000, 0.250000, -0.375000],
         [0.312500, 0.437500, -0.062500, -0.187500],
         [-0.375000, 0.500000, 0.125000, -0.250000]])
    assert np.allclose(np.linalg.inv(M), Minv_expected, atol=1e-6)


def test_det3x3_golden():
    A = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 11]], float)
    assert abs(np.linalg.det(A) - (-6.0)) < 1e-10


def test_solve_linear_system_golden():
    # MatrixTest.solveLinearSystem: pseudo-inverse LSQ of a 4x3 system
    A = np.array([[1, -2, -3], [4, 5, -6], [-7, -8, -9], [10, -11, -12]],
                 float)
    b = np.array([14, 32, 50, 68], float)
    x = solve_linear_system(A, b)
    assert np.allclose(x, [0.064431, -0.183922, -5.412896], atol=1e-5)


def test_ransac_weighted_least_squares():
    # MatrixTest.RANSAC: 60 exact points on y=0.5x+1 + 40 uniform outliers
    rng = np.random.default_rng(7)
    n_steps = 60
    x_in = np.arange(n_steps) / n_steps
    x_out = rng.uniform(0, 1, 40)
    A = np.stack([np.concatenate([x_in, x_out]),
                  np.ones(100)], axis=1)
    b = np.concatenate([0.5 * x_in + 1, rng.uniform(1, 1.5, 40)])
    w = np.ones(100)
    sol = ransac_weighted_least_squares(A, b, w, tol=0.1, n_iter=10000,
                                        outlier_fraction=0.5)
    assert abs(sol[0] - 0.5) < 1e-2
    assert abs(sol[1] - 1.0) < 1e-2


def test_schur_golden():
    A = np.array([[1, 2, 3], [4, 5, 6], [7, 8, 9]], float)
    O, T = schur_decomposition(A)
    expectedO = np.array(
        [[-0.231970687246286, -0.882905959653586, 0.408248290463863],
         [-0.525322093301233, -0.239520420054206, -0.816496580927726],
         [-0.818673499356181, 0.403865119545174, 0.408248290463863]])
    expectedT = np.array(
        [[16.116843969807043, 4.898979485566353, 0],
         [0, -1.116843969807043, 0],
         [0, 0, 0]])
    # canonicalize column signs (Schur is unique up to per-column sign)
    signs = np.sign(np.sum(O * expectedO, axis=0))
    O = O * signs
    T = signs[:, None] * T * signs[None, :]
    assert np.allclose(O, expectedO, atol=1e-9)
    assert np.allclose(T, expectedT, atol=1e-9)
    assert np.allclose(O @ T @ O.T, A, atol=1e-9)


def test_generalized_eigs_golden():
    A = np.array([[1, 1], [1, 0]], float)
    B = np.array([[2, 0], [0, 1]], float)
    D, P = generalized_eigs(A, B)
    assert np.allclose(D, [-0.5, 1.0], atol=1e-12)
    expectedP = np.array([[0.408248290463863, -0.57735026918962],
                          [-0.816496580927726, -0.57735026918962]])
    signs = np.sign(np.sum(P * expectedP, axis=0))
    assert np.allclose(P * signs, expectedP, atol=1e-9)


def test_first_last_eigs_golden():
    A = np.array([[1, 0.5, 0.3], [0.5, 1, 0.5], [0.3, 0.5, 1]], float)
    D, P = first_eigs(A, 2)
    assert np.allclose(D, [1.872841614740048, 0.7], atol=1e-12)
    expectedP = np.array([[-0.549434786658031, 0.707106781186547],
                          [-0.629478220767080, 0],
                          [-0.549434786658031, -0.707106781186547]])
    signs = np.sign(np.sum(P * expectedP, axis=0))
    assert np.allclose(P * signs, expectedP, atol=1e-9)
    D2, P2 = last_eigs(A, 2)
    assert np.allclose(D2, [0.427158385259952, 0.7], atol=1e-12)
    expectedP2 = np.array([[0.445108318513645, 0.707106781186547],
                           [-0.777018126931355, 0],
                           [0.445108318513645, -0.707106781186547]])
    signs2 = np.sign(np.sum(P2 * expectedP2, axis=0))
    assert np.allclose(P2 * signs2, expectedP2, atol=1e-9)


def test_connected_components_goldens():
    full = np.array([[1, 0.5, 0.3], [0.5, 1, 0.5], [0.3, 0.5, 1]])
    assert connected_components_undirected(full).tolist() == [0, 0, 0]
    two = np.array([[1, 0.5, 0], [0.5, 1, 0], [0, 0, 1]])
    assert connected_components_undirected(two).tolist() == [0, 0, 1]
    iso = np.array([[1, 0, 0], [0, 1, 0.1], [0, 0.1, 1]])
    assert connected_components_undirected(iso).tolist() == [0, 1, 1]


def test_matrix_operations_goldens():
    # matrixOperation_XtAX_symmetric / matrixOperation_AtA embedded values
    A = np.array([[1, 0.5, 0.3], [0.5, 1, 0.5], [0.3, 0.5, 1]])
    B = A.T @ A @ A
    expectedB = np.array([[2.17, 2.245, 1.827],
                          [2.245, 2.65, 2.245],
                          [1.827, 2.245, 2.17]])
    assert np.allclose(B, expectedB, atol=1e-12)
    C = np.array([[1, 0.5], [0.5, 1], [0.3, 0.5]])
    assert np.allclose(C.T @ C, [[1.34, 1.15], [1.15, 1.5]], atol=1e-12)
