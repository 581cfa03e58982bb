"""volume_align reference flag-surface parity
(volume_align_prog.cpp: 10-D trial grid, covariance/least-squares
fitness, --local Powell, --copyGeo/--copyGray/--store outputs)."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import load_image, save_image
from xmipp3_tpu.programs import get_program


def _vol(n=24):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    return (np.exp(-((z - 3) ** 2 + y ** 2 + x ** 2) / 8.0)
            + np.exp(-(z ** 2 + (y - 4) ** 2 + (x + 3) ** 2) / 6.0)
            ).astype(np.float32)


def run_prog(args):
    prog = get_program("volume_align")
    rc = prog.run_with_args(args.split())
    assert rc == 0
    return prog


def test_grid_recovers_shift(tmp_path):
    vol = _vol()
    shifted = np.roll(vol, (0, 2, -1), axis=(0, 1, 2))
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, vol)
    save_image(f2, shifted)
    prog = run_prog(f"--i1 {f1} --i2 {f2} "
                    "-x -3 3 1 -y -3 3 1 -v 0")
    # shifted = roll(vol, y+2, x-1); aligning back needs x=+1, y=-2
    fit, t = prog.fit, prog.matrix_A
    assert prog.corr > 0.99
    np.testing.assert_allclose([t[0, 3], t[1, 3]], [1.0, -2.0], atol=0.1)


def test_grid_recovers_rotation_and_store(tmp_path):
    from xmipp3_tpu.core.geometry import euler_matrix
    from xmipp3_tpu.ops.geo import apply_affine_3d
    vol = _vol(28)
    A = np.eye(4, dtype=np.float32)
    A[:3, :3] = np.asarray(euler_matrix(0.0, 0.0, 20.0), np.float32)
    rotated = np.asarray(apply_affine_3d(vol, A[None, :3, :4]))[0]
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, rotated)
    save_image(f2, vol)
    st = str(tmp_path / "store.txt")
    geo = str(tmp_path / "geo.txt")
    prog = run_prog(f"--i1 {f1} --i2 {f2} --psi 0 40 5 "
                    f"--store {st} --copyGeo {geo} -v 0")
    assert abs(prog.angles[2] - 20.0) <= 5.0
    vals = [float(v) for v in open(st).read().split(",")]
    assert len(vals) == 7 and abs(vals[2] - prog.angles[2]) < 1e-6
    gvals = [float(v) for v in open(geo).read().split()]
    assert len(gvals) == 16 and abs(gvals[15] - 1.0) < 1e-9


def test_least_squares_grey_scale(tmp_path):
    vol = _vol()
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, (2.0 * vol).astype(np.float32))
    save_image(f2, vol)
    gray = str(tmp_path / "gray.txt")
    prog = run_prog(f"--i1 {f1} --i2 {f2} --least_squares "
                    f"--grey_scale 1 3 0.5 --copyGray {gray} -v 0")
    gs, gh = [float(v) for v in open(gray).read().split()]
    assert abs(gs - 2.0) < 0.26
    assert prog.fit < 0.05  # rms after grey matching is small


def test_local_powell_refines_shift(tmp_path):
    from scipy.ndimage import shift as ndshift
    vol = _vol()
    shifted = ndshift(vol, (0.0, 1.3, -0.8), order=1)
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, vol)
    save_image(f2, shifted.astype(np.float32))
    prog = run_prog(f"--i1 {f1} --i2 {f2} --local --onlyShift -v 0")
    A = prog.matrix_A
    np.testing.assert_allclose([A[0, 3], A[1, 3]], [0.8, -1.3], atol=0.35)


def test_consider_mirror_prefers_flip(tmp_path):
    vol = _vol()
    mirrored = vol[::-1].copy()  # Z flip
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, mirrored)
    save_image(f2, vol)
    prog = run_prog(f"--i1 {f1} --i2 {f2} --consider_mirror -v 0")
    # identity candidate loses to the mirror candidate
    assert prog.matrix_A[2, 2] < 0 or prog.corr > 0.95


def test_apply_writes_transformed_volume(tmp_path):
    vol = _vol()
    shifted = np.roll(vol, 2, axis=2)
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, vol)
    save_image(f2, shifted)
    out = str(tmp_path / "al.vol")
    run_prog(f"--i1 {f1} --i2 {f2} -x -3 3 1 --apply {out} -v 0")
    aligned = np.squeeze(load_image(out))
    a = vol - vol.mean()
    b = aligned - aligned.mean()
    cc = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cc > 0.99
