"""MATLAB/Octave binding bridge tests (bindings/matlab/ + matlab_bridge).

Each test drives the same `xmipp matlab_bridge` CLI the .m wrappers shell
out to, marshalling arguments through real MAT-files with scipy.io — i.e.
the full binding path minus the MATLAB interpreter itself (the .m files
are thin marshal stubs; a structural test checks them too).
Reference contracts: /root/reference/src/xmipp/bindings/matlab/*.cpp/.m.
"""
import os
import re

import numpy as np
import pytest
from scipy.io import loadmat, savemat

from xmipp3_tpu.programs import get_program

MLDIR = os.path.join(os.path.dirname(os.path.dirname(
    os.path.abspath(__file__))), "bindings", "matlab")


def bridge(tmp_path, func, **args):
    fin = str(tmp_path / f"in_{func}.mat")
    fout = str(tmp_path / f"out_{func}.mat")
    savemat(fin, args)
    prog = get_program("matlab_bridge")
    rc = prog.run_with_args(f"--func {func} -i {fin} -o {fout} -v 0")
    assert rc == 0
    return loadmat(fout, squeeze_me=True)


def test_read_write_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((8, 12, 16)).astype(np.float32)
    fn = str(tmp_path / "v.vol")
    bridge(tmp_path, "write", array=vol, filename=fn)
    out = bridge(tmp_path, "read", filename=fn)
    np.testing.assert_allclose(out["I"], vol, atol=1e-6)


def test_rotate_2d_matches_ops(tmp_path):
    rng = np.random.default_rng(1)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    out = bridge(tmp_path, "rotate", img=img, angs=90.0, axis=[],
                 align_z=[], gridding=False, wrap=True)
    back = bridge(tmp_path, "rotate", img=out["img_out"], angs=-90.0,
                  axis=[], align_z=[], gridding=False, wrap=True)
    # 4x90-degree rotations must close; compare the interior (spline edge)
    np.testing.assert_allclose(back["img_out"][4:-4, 4:-4],
                               img[4:-4, 4:-4], atol=1e-3)


def test_rotate_3d_euler(tmp_path):
    z, y, x = np.mgrid[0:16, 0:16, 0:16].astype(np.float32) - 8
    vol = np.exp(-((x - 3) ** 2 + y ** 2 + z ** 2) / 6.0)
    out = bridge(tmp_path, "rotate", img=vol, angs=[0.0, 0.0, 90.0],
                 axis=[], align_z=[], gridding=False, wrap=False)
    assert out["img_out"].shape == vol.shape
    # mass is preserved and the blob moved off its original spot
    assert abs(out["img_out"].sum() - vol.sum()) / vol.sum() < 0.05
    assert np.corrcoef(out["img_out"].ravel(), vol.ravel())[0, 1] < 0.9


def test_scale_and_pyramid(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.standard_normal((32, 32)).astype(np.float32)
    out = bridge(tmp_path, "scale", img=img, outsize=[16, 16],
                 gridding=False)
    assert out["img_out"].shape == (16, 16)
    out = bridge(tmp_path, "scale", img=img, outsize=[64, 64],
                 gridding=True)
    assert out["img_out"].shape == (64, 64)
    red = bridge(tmp_path, "scale_pyramid", img=img, operation="reduce",
                 levels=1)
    assert red["img_out"].shape == (16, 16)
    exp = bridge(tmp_path, "scale_pyramid", img=img, operation="expand",
                 levels=1)
    assert exp["img_out"].shape == (64, 64)


def test_mirror(tmp_path):
    img = np.arange(12, dtype=np.float32).reshape(3, 4)
    out = bridge(tmp_path, "mirror", img=img, flipstring="x")
    np.testing.assert_allclose(out["img_out"], img[:, ::-1])
    out = bridge(tmp_path, "mirror", img=img, flipstring="xy")
    np.testing.assert_allclose(out["img_out"], img[::-1, ::-1])


def test_mask_types(tmp_path):
    out = bridge(tmp_path, "mask", msize=[16, 16], type="circular",
                 origin=[], params=[5.0], inner=False)
    m = out["mask"]
    assert m[8, 8] == 1.0 and m[0, 0] == 0.0
    out = bridge(tmp_path, "mask", msize=[16, 16], type="crown",
                 origin=[], params=[3.0, 6.0], inner=False)
    m = out["mask"]
    assert m[8, 8] == 0.0 and m[8, 12] == 1.0
    out = bridge(tmp_path, "mask", msize=[16, 16, 16], type="gaussian",
                 origin=[], params=[3.0], inner=False)
    assert out["mask"].shape == (16, 16, 16)


def test_morphology(tmp_path):
    img = np.zeros((16, 16), np.float32)
    img[7:9, 7:9] = 1.0
    out = bridge(tmp_path, "morphology", img=img, operation="dilation",
                 neig=8, ksize=1, count=0)
    assert out["img_out"].sum() > img.sum()
    out = bridge(tmp_path, "morphology", img=img, operation="erosion",
                 neig=8, ksize=1, count=0)
    assert out["img_out"].sum() < img.sum()


def test_normalize(tmp_path):
    rng = np.random.default_rng(3)
    img = 5.0 + 2.0 * rng.standard_normal((32, 32)).astype(np.float32)
    out = bridge(tmp_path, "normalize", img=img, method="OldXmipp",
                 mask=[])
    o = out["img_out"]
    assert abs(o.mean()) < 1e-3 and abs(o.std() - 1) < 1e-3


def test_periodogram_and_psd_enhance(tmp_path):
    rng = np.random.default_rng(4)
    mic = rng.standard_normal((256, 256)).astype(np.float32)
    out = bridge(tmp_path, "periodogram", image=mic, sz=64)
    psd = out["psd"]
    assert psd.shape == (64, 64) and (psd >= 0).all()
    enh = bridge(tmp_path, "psd_enhance", img=psd, center=True,
                 take_log=True, filter_w1=0.05, filter_w2=0.2,
                 decay_width=0.02, mask_w1=0.025, mask_w2=0.2)
    assert enh["img_out"].shape == (64, 64)


def test_adjust_ctf_struct_fields(tmp_path):
    # synthetic CTF-shaped PSD (the tom wrapper passes a centered psd)
    from xmipp3_tpu.ops.ctf import CTFDescription
    n, Ts = 128, 1.5
    true = CTFDescription(sampling_rate=Ts, voltage=300, Cs=2.7, Q0=0.07,
                          defocusU=15000, defocusV=14000,
                          azimuthal_angle=20.0, K=1.0)
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / Ts
    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / Ts
    half = np.asarray(true.pure_at(fx, fy)) ** 2 + 0.05
    full = np.concatenate([half, half[:, -2:0:-1]], axis=1)[:, :n]
    psd = np.fft.fftshift(full)
    out = bridge(tmp_path, "adjust_ctf", psd=psd, Dz=14000.0,
                 voltage=300.0, objectPixelSize=Ts, ctfmodelSize=0,
                 Cs=2.7, min_freq=0.03, max_freq=0.35, Ca=2.0)
    for field in ("DeltafU", "DeltafV", "AzimuthalAngle", "kV", "K",
                  "Cs", "Ca", "espr", "ispr", "alpha", "DeltaF",
                  "DeltaR", "Q0", "base_line", "sqrt_K", "sqU", "sqV",
                  "sqrt_angle", "gaussian_K", "sigmaU", "sigmaV",
                  "gaussian_angle", "cU", "cV", "gaussian_K2",
                  "sigmaU2", "sigmaV2", "gaussian_angle2", "cU2", "cV2"):
        assert field in out, field
    mean_def = 0.5 * (float(out["DeltafU"]) + float(out["DeltafV"]))
    assert abs(mean_def - 14500) / 14500 < 0.15


def test_ctf_correct_phase_flips_sign(tmp_path):
    rng = np.random.default_rng(5)
    img = rng.standard_normal((64, 64)).astype(np.float32)
    st = {"DeltafU": 12000.0, "DeltafV": 12000.0, "AzimuthalAngle": 0.0,
          "kV": 300.0, "Cs": 2.0, "Q0": 0.1, "K": 1.0,
          "objectPixelSize": 1.5}
    out = bridge(tmp_path, "ctf_correct_phase", img=img, st=st,
                 method="leave", epsilon=0.0)
    o = out["img_out"]
    assert o.shape == img.shape and not np.allclose(o, img)
    # applying the same correction twice restores the original (sign^2=1)
    out2 = bridge(tmp_path, "ctf_correct_phase", img=o, st=st,
                  method="leave", epsilon=0.0)
    np.testing.assert_allclose(out2["img_out"], img, atol=1e-4)


def test_ctf_generate_filter(tmp_path):
    out = bridge(tmp_path, "ctf_generate_filter", Xdim=64, Tm=1.5,
                 DeltafU=12000.0, DeltafV=10000.0, AzimuthalAngle=15.0,
                 kV=300.0, Cs=2.0, Q0=0.1, K=1.0)
    f = out["ctfFilter"]
    assert f.shape == (64, 64)
    assert f.min() < -0.3 and f.max() > 0.3        # oscillating CTF


def test_align2d_recovers_pose(tmp_path):
    from xmipp3_tpu.ops.shear_rotate import rotate_shift_fourier
    import jax.numpy as jnp
    rng = np.random.default_rng(6)
    y, x = np.mgrid[0:64, 0:64].astype(np.float32) - 32
    ref = (np.exp(-(x ** 2 + y ** 2) / 60) +
           0.6 * np.exp(-((x - 9) ** 2 + y ** 2) / 10)).astype(np.float32)
    img = np.asarray(rotate_shift_fourier(jnp.asarray(ref[None]),
                                          jnp.asarray([25.0]),
                                          jnp.asarray([2.0]),
                                          jnp.asarray([-3.0])))[0]
    st = bridge(tmp_path, "align2d", img=img, ref=ref, mode="complete",
                max_shift=6, max_rot=0, psi_interval=10, Rin=2, Rout=28,
                outside=0)
    assert st["Tform"].shape == (3, 3)
    # the estimated pose must undo the applied one (opposite signs)
    assert abs(abs(float(st["Psi"])) - 25.0) < 3.0


def test_resolution_curves(tmp_path):
    rng = np.random.default_rng(7)
    a = rng.standard_normal((32, 32, 32)).astype(np.float32)
    b = a + 0.3 * rng.standard_normal((32, 32, 32)).astype(np.float32)
    out = bridge(tmp_path, "resolution", img=a, ref=b,
                 objectpixelsize=2.0)
    assert out["frc"].shape == out["freq"].shape
    assert out["frc"][1] > 0.8                     # correlated volumes
    assert "dpr" in out and "frc_noise" in out


def test_volume_segment(tmp_path):
    z, y, x = np.mgrid[0:24, 0:24, 0:24].astype(np.float32) - 12
    vol = np.exp(-(x ** 2 + y ** 2 + z ** 2) / 18.0)
    out = bridge(tmp_path, "volume_segment", vol=vol, sampling=2.0,
                 mass=500, type="voxels", enable_threshold=False,
                 threshold=0, wang_radius=3, probabilistic=False)
    m = out["seg_mask"]
    assert 400 <= m.sum() <= 600
    assert m[12, 12, 12] == 1.0 and m[0, 0, 0] == 0.0
    out = bridge(tmp_path, "volume_segment", vol=vol, sampling=2.0,
                 mass=0, type="voxels", enable_threshold=True,
                 threshold=0.5, wang_radius=3, probabilistic=False)
    np.testing.assert_allclose(out["seg_mask"], (vol >= 0.5))


def test_mirt3d_interp(tmp_path):
    vol = np.arange(27, dtype=np.float64).reshape(3, 3, 3)
    # identity sample at MATLAB coords (1-based grid points)
    yy, xx, zz = np.mgrid[1:4, 1:4, 1:4].astype(np.float64)
    out = bridge(tmp_path, "mirt3D_mexinterp", input_image=vol,
                 XI=xx, YI=yy, ZI=zz)
    np.testing.assert_allclose(out["output_image"], vol, atol=1e-9)
    # outside -> NaN
    out = bridge(tmp_path, "mirt3D_mexinterp", input_image=vol,
                 XI=np.array([[10.0]]), YI=np.array([[1.0]]),
                 ZI=np.array([[1.0]]))
    assert np.isnan(out["output_image"]).all()


def test_metadata_and_nma_roundtrip(tmp_path):
    from xmipp3_tpu.core.metadata import MetaData
    d = tmp_path / "nma"
    d.mkdir()
    rows = [{"image": f"img{i:03d}.spi",
             "nmaDisplacements": np.array([0.1 * i, -0.2 * i]),
             "cost": 0.5 + 0.1 * i} for i in range(4)]
    MetaData.fromRows(rows).write(str(d / "images.xmd"))
    out = bridge(tmp_path, "nma_read_alignment", NMAdirectory=str(d))
    assert out["NMAdisplacements"].shape == (4, 2)
    np.testing.assert_allclose(out["cost"], [0.5, 0.6, 0.7, 0.8],
                               atol=1e-6)
    bridge(tmp_path, "nma_save_cluster", NMAdirectory=str(d),
           clusterName="c1", inCluster=np.array([1.0, 0, 1.0, 0]))
    md = MetaData(str(d / "c1.xmd"))
    assert md.size() == 2
    out = bridge(tmp_path, "read_metadata",
                 filename=str(d / "images.xmd"))
    assert "cost" in out


def test_read_structure_factor(tmp_path):
    from xmipp3_tpu.core.metadata import MetaData
    rows = [{"resolutionFreq": 0.1 * (i + 1),
             "resolutionLogStructure": -1.0 * i} for i in range(5)]
    fn = str(tmp_path / "structureFactor.xmd")
    MetaData.fromRows(rows).write(fn)
    out = bridge(tmp_path, "read_structure_factor", rundir=str(tmp_path))
    assert len(out["f2"]) == 5
    np.testing.assert_allclose(out["f2"][0], 0.01, atol=1e-9)


def test_m_wrappers_cover_reference_surface():
    """Every reference bindings/matlab entry point has a same-named .m
    wrapper here, and each wrapper routes through xmipp_matlab_bridge or
    the xmipp CLI (no MEX, no dead stubs)."""
    expected = [
        "xmipp_read", "xmipp_write", "tom_xmipp_rotate", "tom_xmipp_scale",
        "tom_xmipp_scale_pyramid", "tom_xmipp_mirror", "tom_xmipp_mask",
        "tom_xmipp_morphology", "tom_xmipp_normalize",
        "tom_xmipp_adjust_ctf", "tom_xmipp_ctf_correct_phase",
        "tom_xmipp_psd_enhance", "tom_calc_periodogram",
        "tom_xmipp_align2d", "tom_xmipp_resolution",
        "tom_xmipp_volume_segment", "mirt3D_mexinterp",
        "xmipp_read_metadata", "xmipp_nma_read_alignment",
        "xmipp_nma_save_cluster", "xmipp_nma_selection_tool",
        "xmipp_ctf_generate_filter", "xmipp_ctf_for_metadata_row",
        "xmipp_read_structure_factor", "xmipp_show_structure_factor",
        "xmipp_calculate_strain",
    ]
    for name in expected:
        fn = os.path.join(MLDIR, name + ".m")
        assert os.path.exists(fn), name
        src = open(fn).read()
        m = re.search(r"^function\s+[^\n]*" + re.escape(name),
                      src, re.MULTILINE)
        assert m, f"{name}.m must define function {name}"
        assert ("xmipp_matlab_bridge(" in src or "system(" in src
                or name in ("xmipp_show_structure_factor",
                            "xmipp_ctf_for_metadata_row",
                            "xmipp_nma_selection_tool")), name


def test_bridge_func_named_in_m_files_exist():
    """Every bridge('<func>') referenced by an .m file is registered."""
    from xmipp3_tpu.programs.matlab_bridge import FUNCS
    for fn in os.listdir(MLDIR):
        if not fn.endswith(".m"):
            continue
        src = open(os.path.join(MLDIR, fn)).read()
        for func in re.findall(r"xmipp_matlab_bridge\('([a-zA-Z0-9_]+)'",
                               src):
            assert func in FUNCS, (fn, func)
