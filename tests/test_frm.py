"""FRM SO(3) volume alignment (reference interface/frm.h:35-52,
external/sh_alignment): recover a known rotation to <1 degree."""
import numpy as np
import pytest

from xmipp3_tpu.core.geometry import euler_matrix, matrix_to_euler
from xmipp3_tpu.ops.frm import _zyz_active, frm_align_volumes
from xmipp3_tpu.ops.geo import apply_affine_3d


def _blobby_volume(n=48, seed=0):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for c, s, a in [((0, 0, 0), 5.0, 1.0), ((6, -4, 5), 2.5, 0.9),
                    ((-5, 5, -3), 3.0, 0.7), ((-8, -6, 2), 1.8, 1.2),
                    ((3, 8, -8), 1.5, 0.8)]:
        vol += a * np.exp(-((z - c[0]) ** 2 + (y - c[1]) ** 2 +
                            (x - c[2]) ** 2) / (2 * s ** 2))
    return vol


def _ang_err(Ma, Mb):
    Rrel = Ma @ Mb.T
    return np.degrees(np.arccos(np.clip((np.trace(Rrel) - 1) / 2, -1, 1)))


class TestFRM:
    @pytest.mark.parametrize("angles", [(20.0, 30.0, -40.0), (5.0, 8.0, 3.0)])
    def test_recovers_rotation_below_1deg(self, angles):
        vol = _blobby_volume()
        M_true = _zyz_active(*np.deg2rad(angles))
        v2 = np.asarray(apply_affine_3d(
            vol, np.linalg.inv(M_true).astype(np.float32)[None]))[0]
        M = frm_align_volumes(vol, v2, L=24)
        assert _ang_err(M, M_true) < 1.0

    def test_small_rotation_8deg(self):
        """VERDICT #7 exit criterion: volumes 8 deg apart -> < 1 deg."""
        vol = _blobby_volume()
        w = np.deg2rad(8.0) * np.array([0.3, 0.8, -0.5])
        w /= np.linalg.norm(w) / np.deg2rad(8.0)
        from xmipp3_tpu.ops.frm import _rotvec_mat
        M_true = _rotvec_mat(w).astype(np.float32)
        v2 = np.asarray(apply_affine_3d(
            vol, np.linalg.inv(M_true)[None]))[0]
        M = frm_align_volumes(vol, v2, L=24)
        assert _ang_err(M, M_true) < 1.0

    def test_euler_decomposition_consistent(self):
        """matrix_to_euler(M) must reproduce M through euler_matrix (the
        volume_align output contract)."""
        M = _zyz_active(*np.deg2rad((25.0, 40.0, -70.0)))
        rot, tilt, psi = matrix_to_euler(M)
        M2 = np.asarray(euler_matrix(rot, tilt, psi))
        assert np.abs(M2 - M).max() < 1e-5

    def test_volume_align_frm_cli(self, tmp_path):
        from xmipp3_tpu.core.image import Image
        from xmipp3_tpu.programs import get_program
        vol = _blobby_volume()
        M_true = _zyz_active(*np.deg2rad((15.0, 25.0, -30.0)))
        v2 = np.asarray(apply_affine_3d(
            vol, np.linalg.inv(M_true).astype(np.float32)[None]))[0]
        d = str(tmp_path)
        Image(vol).write(d + "/v1.vol")
        Image(v2).write(d + "/v2.vol")
        prog = get_program("volume_align")
        prog.read(["x", "--i1", d + "/v1.vol", "--i2", d + "/v2.vol",
                   "--frm", "24", "--apply", d + "/al.vol"])
        assert prog.tryRun() == 0
        assert prog.corr > 0.98
        aligned = np.squeeze(Image(d + "/al.vol").data)
        a = vol - vol.mean()
        b = aligned - aligned.mean()
        cc = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
        assert cc > 0.98
