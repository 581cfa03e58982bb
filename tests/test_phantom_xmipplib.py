"""Phantom engine + xmippLib shim + metadata/angular utility programs."""
import os

import numpy as np
import pytest

from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.phantom import Phantom, Feature
from xmipp3_tpu.programs import get_program


DESCR = """# Phantom description
# General Volume Parameters:
#      Xdim Ydim Zdim Background Scale
        32 32 32 0 1
# Feature Parameters:
sph + 1 0 0 0 8
cyl + 0.5 10 0 0 3 3 12 0 90 0
cub = 2 -10 -10 -10 5 5 5
gau + 1 0 10 0 2
"""


def test_phantom_parse_and_voxelize(tmp_path):
    fn = str(tmp_path / "p.descr")
    open(fn, "w").write(DESCR)
    ph = Phantom.read(fn)
    assert ph.dims == (32, 32, 32)
    assert len(ph.features) == 4
    vol = ph.voxelize()
    assert vol.shape == (32, 32, 32)
    # sphere center has density >= 1
    assert vol[16, 16, 16] >= 1.0
    # cube corner region is set (=) to 2
    assert vol[6, 6, 6] == 2.0
    # sphere volume approx (4/3)pi r^3 of '+1' voxels around center
    sph_vox = (vol >= 0.99) & (vol < 1.5)
    assert abs(sph_vox.sum() - 4 / 3 * np.pi * 512) / (4 / 3 * np.pi * 512) < 0.3


def test_phantom_roundtrip_write(tmp_path):
    fn = str(tmp_path / "p.descr")
    open(fn, "w").write(DESCR)
    ph = Phantom.read(fn)
    fn2 = str(tmp_path / "p2.descr")
    ph.write(fn2)
    ph2 = Phantom.read(fn2)
    np.testing.assert_allclose(ph.voxelize(), ph2.voxelize())


def test_phantom_programs(tmp_path):
    fn = str(tmp_path / "p.descr")
    open(fn, "w").write(DESCR)
    vol_fn = str(tmp_path / "p.vol")
    assert get_program("phantom_create").run_with_args(
        f"-i {fn} -o {vol_fn}") == 0
    root = str(tmp_path / "projs")
    assert get_program("phantom_project").run_with_args(
        f"-i {vol_fn} -o {root}.stk --nangles 10 --seed 1") == 0
    md = MetaData(root + ".xmd")
    assert md.size() == 10
    # simulate microscope on those projections
    out = str(tmp_path / "noisy.stk")
    assert get_program("phantom_simulate_microscope").run_with_args(
        f"-i {root}.xmd -o {out} --noise 0.5 --seed 2") == 0
    from xmipp3_tpu.core.image import Image
    noisy = Image.read_stack(out)
    clean = Image.read_stack(root + ".stk")
    assert noisy.std() > clean.std()


def test_xmipplib_shim(tmp_path):
    import xmippLib
    # label constants
    assert xmippLib.MDL_IMAGE == "image"
    assert xmippLib.MDL_ANGLE_ROT == "angleRot"
    assert xmippLib.label2Str(xmippLib.MDL_SHIFT_X) == "shiftX"
    # MetaData with label constants
    md = xmippLib.MetaData()
    oid = md.addObject()
    md.setValue(xmippLib.MDL_IMAGE, "a.mrc", oid)
    md.setValue(xmippLib.MDL_ANGLE_ROT, 30.0, oid)
    fn = str(tmp_path / "t.xmd")
    md.write(fn)
    md2 = xmippLib.MetaData(fn)
    assert md2.getValue(xmippLib.MDL_IMAGE, md2.firstObject()) == "a.mrc"
    # Image + compare functions
    from xmipp3_tpu.core.image import save_image
    arr = np.random.default_rng(0).standard_normal((16, 16)).astype(np.float32)
    fn_img = str(tmp_path / "i.spi")
    save_image(fn_img, arr)
    img = xmippLib.Image(fn_img)
    np.testing.assert_allclose(img.getData(), arr, atol=1e-6)
    assert xmippLib.compareTwoImageTolerance(fn_img, fn_img)
    assert xmippLib.getImageSize(fn_img) == (16, 16, 1, 1)
    # Euler helpers
    A = xmippLib.Euler_angles2matrix(10, 20, 30)
    r, t, p = xmippLib.Euler_matrix2angles(A)
    assert abs(r - 10) < 1e-3 and abs(t - 20) < 1e-3 and abs(p - 30) < 1e-3


def test_metadata_split_and_import(tmp_path):
    md = MetaData.fromRows([{"itemId": i + 1, "cost": float(i)}
                            for i in range(10)])
    fn = str(tmp_path / "all.xmd")
    md.write(fn)
    root = str(tmp_path / "part")
    assert get_program("metadata_split").run_with_args(
        f"-i {fn} -n 3 --oroot {root} --dont_randomize") == 0
    sizes = [MetaData(f"{root}{k + 1:06d}.xmd").size() for k in range(3)]
    assert sum(sizes) == 10
    # import
    txt = str(tmp_path / "cols.txt")
    open(txt, "w").write("1 2.5 a.mrc\n2 3.5 b.mrc\n")
    out = str(tmp_path / "imported.xmd")
    assert get_program("metadata_import").run_with_args(
        f"-i {txt} -o {out} --columns itemId cost image") == 0
    mdi = MetaData(out)
    assert mdi.getValue("image", 1) == "b.mrc"


def test_angular_distance_program(tmp_path):
    rng = np.random.default_rng(0)
    rows1, rows2 = [], []
    for i in range(20):
        rot, tilt = rng.uniform(-180, 180), rng.uniform(0, 180)
        rows1.append({"itemId": i + 1, "angleRot": rot, "angleTilt": tilt})
        rows2.append({"itemId": i + 1, "angleRot": rot + 2.0,
                      "angleTilt": tilt})
    f1, f2 = str(tmp_path / "a1.xmd"), str(tmp_path / "a2.xmd")
    MetaData.fromRows(rows1).write(f1)
    MetaData.fromRows(rows2).write(f2)
    prog = get_program("angular_distance")
    assert prog.run_with_args(f"--ang1 {f1} --ang2 {f2} -v 0") == 0
    # 2 deg rot difference scaled by sin(tilt) <= 2 deg arc
    assert prog.distances.mean() < 2.1
    assert prog.distances.max() <= 2.0 + 1e-3
