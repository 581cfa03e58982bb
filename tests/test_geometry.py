import numpy as np
import pytest

from xmipp3_tpu.core.geometry import (alignment_matrix_2d, euler_matrix,
                                      matrix_to_euler, rotation2d_matrix)


def test_euler_identity():
    np.testing.assert_allclose(euler_matrix(0, 0, 0), np.eye(3), atol=1e-6)


def test_euler_composition():
    # A(rot,tilt,psi) = Rz(psi)·Ry(tilt)·Rz(rot) with passive row convention
    def Rz(t):
        t = np.deg2rad(t)
        return np.array([[np.cos(t), np.sin(t), 0],
                         [-np.sin(t), np.cos(t), 0], [0, 0, 1]])

    def Ry(t):
        t = np.deg2rad(t)
        return np.array([[np.cos(t), 0, -np.sin(t)], [0, 1, 0],
                         [np.sin(t), 0, np.cos(t)]])

    A = np.asarray(euler_matrix(10.0, 20.0, 30.0))
    np.testing.assert_allclose(A, Rz(30) @ Ry(20) @ Rz(10), atol=1e-6)


def test_euler_orthonormal_batch():
    rng = np.random.default_rng(0)
    rot, tilt, psi = (rng.uniform(-180, 180, 16) for _ in range(3))
    A = np.asarray(euler_matrix(rot, tilt, psi))
    assert A.shape == (16, 3, 3)
    eye = np.einsum("bij,bkj->bik", A, A)
    np.testing.assert_allclose(eye, np.broadcast_to(np.eye(3), (16, 3, 3)),
                               atol=1e-5)


def test_matrix_to_euler_roundtrip():
    rng = np.random.default_rng(1)
    for _ in range(20):
        rot, tilt, psi = rng.uniform(-179, 179), rng.uniform(1, 179), \
            rng.uniform(-179, 179)
        A = np.asarray(euler_matrix(rot, tilt, psi))
        r2, t2, p2 = matrix_to_euler(A)
        A2 = np.asarray(euler_matrix(r2, t2, p2))
        np.testing.assert_allclose(A2, A, atol=1e-5)


def test_projection_direction():
    # tilt=90, rot=0 -> projection direction along +x
    A = np.asarray(euler_matrix(0.0, 90.0, 0.0))
    np.testing.assert_allclose(A[2], [1, 0, 0], atol=1e-6)


def test_alignment_matrix_flip():
    A = alignment_matrix_2d(psi=0.0, shiftx=2.0, shifty=-1.0, flip=True)
    # x coordinate mirrored after shift applied
    v = A @ np.array([1.0, 1.0, 1.0])
    np.testing.assert_allclose(v, [-3.0, 0.0, 1.0], atol=1e-6)
