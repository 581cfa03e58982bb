"""Helical symmetry search tests (volume_find_symmetry helical modes,
volume_find_symmetry.cpp:279-345 + symmetry_Helical)."""
import os

import numpy as np

from tests.test_batch3 import run_prog
from xmipp3_tpu.core.image import save_image
from xmipp3_tpu.ops.helical import helical_correlation, symmetrize_helical


def make_helix(n=48, dz=4.0, drot=30.0, r=10.0):
    vol = np.zeros((n, n, n), np.float32)
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    for k in range(-5, 6):
        a = np.deg2rad(drot * k)
        cx, cy, cz = r * np.cos(a), r * np.sin(a), dz * k
        vol += np.exp(-((x - cx) ** 2 + (y - cy) ** 2 + (z - cz) ** 2)
                      / 3.0)
    return vol


def test_symmetrize_helical_preserves_helix():
    vol = make_helix()
    vs = np.asarray(symmetrize_helical(vol, 4.0, 30.0))
    m = vol > 0.05
    a = vol[m] - vol[m].mean()
    b = vs[m] - vs[m].mean()
    cc = (a * b).sum() / (np.linalg.norm(a) * np.linalg.norm(b))
    assert cc > 0.95
    # wrong parameters destroy the correlation
    vw = np.asarray(symmetrize_helical(vol, 6.5, 77.0))
    bw = vw[m] - vw[m].mean()
    ccw = (a * bw).sum() / (np.linalg.norm(a) * np.linalg.norm(bw))
    assert ccw < cc - 0.1


def test_helical_correlation_peaks_at_truth():
    vol = make_helix()
    c_true = float(helical_correlation(vol, 4.0, 30.0))
    c_off = float(helical_correlation(vol, 5.0, 45.0))
    assert c_true > c_off + 0.05


def test_find_symmetry_helical_cli(tmp_path):
    vol = make_helix()
    fn = str(tmp_path / "helix.vol")
    save_image(fn, vol)
    out = str(tmp_path / "params.xmd")
    prog = run_prog(
        "volume_find_symmetry",
        f"-i {fn} --sym helical -z 2 6 1 --rotHelical 10 50 10 "
        f"--sampling 1 -o {out} -v 0")
    assert abs(prog.best_z - 4.0) <= 1.0
    assert abs(prog.best_rot - 30.0) <= 10.0
    assert os.path.exists(out)
    assert os.path.exists(str(tmp_path / "params.xmp"))  # correlation map
    # local refinement around the truth
    prog2 = run_prog(
        "volume_find_symmetry",
        f"-i {fn} --sym helical --localHelical 4.5 25 --sampling 1 -v 0")
    assert abs(prog2.best_z - 4.0) <= 0.5
    assert abs(prog2.best_rot - 30.0) <= 5.0


def test_find_symmetry_helical_dihedral_and_cn(tmp_path):
    # dihedral + C2 fixture: helix plus its dihedral/C2 replicas
    vol = make_helix(dz=5.0, drot=40.0)
    vol = vol + vol[::-1, ::-1, :]                     # z,y negated: Rx(pi)
    vol = vol + vol[:, ::-1, ::-1]                     # C2 about z
    fn = str(tmp_path / "dihelix.vol")
    save_image(fn, vol.astype(np.float32))
    prog = run_prog(
        "volume_find_symmetry",
        f"-i {fn} --sym helicalDihedral --sym2 C2 -z 3 7 1 "
        f"--rotHelical 20 60 10 --heightFraction 0.9 --sampling 1 -v 0")
    assert abs(prog.best_z - 5.0) <= 1.0
    assert abs(prog.best_rot - 40.0) <= 10.0
