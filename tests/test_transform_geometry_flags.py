"""transform_geometry reference flag-surface parity
(data/transform_geometry.cpp: --matrix, --apply_transform, --write_matrix,
--shift_to, rotate_volume matrix/alignZ/icosahedral)."""
import numpy as np
import pytest

from xmipp3_tpu.core.geometry import (align_with_z, ico_setting_rotation,
                                      md_pose_from_matrix)
from xmipp3_tpu.core.image import Image, load_image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, f"{name} failed"
    return prog


@pytest.fixture()
def md_stack(tmp_path):
    """Stack + metadata with nonzero per-row geometry."""
    rng = np.random.default_rng(3)
    from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                               low_pass_mask)
    data = np.asarray(apply_fourier_mask_2d(
        rng.standard_normal((4, 32, 32)).astype(np.float32),
        low_pass_mask(32, 32, 0.2))) * 10
    fn = str(tmp_path / "stack.mrcs")
    save_image(fn, data)
    md = MetaData.fromRows([
        {"image": f"{i + 1:06d}@{fn}", "enabled": 1, "itemId": i + 1,
         "anglePsi": float(10 * i), "shiftX": float(i - 1.5),
         "shiftY": float(1.0 - 0.5 * i), "flip": 0}
        for i in range(4)])
    fn_md = str(tmp_path / "in.xmd")
    md.write(fn_md)
    return fn_md, fn, data


def test_metadata_only_roundtrip(md_stack, tmp_path):
    """Default metadata path rewrites pose labels WITHOUT touching pixels;
    applying the updated labels must equal applying pixels directly
    (the reference's produces_a_metadata contract,
    transform_geometry.cpp:118-122, 313-316)."""
    fn_md, fn_stack, data = md_stack
    out_md = str(tmp_path / "geo.xmd")
    args = "--rotate 25 --shift 2 -1 0 --scale 1.1"
    run_prog("transform_geometry", f"-i {fn_md} -o {out_md} {args}")
    # original pixels untouched
    np.testing.assert_allclose(Image.read_stack(fn_stack), data, atol=1e-5)
    md = MetaData(out_md)
    assert md.size() == 4
    # pixels path: same flags with --apply_transform
    out_stk = str(tmp_path / "applied.mrcs")
    run_prog("transform_geometry",
             f"-i {fn_md} -o {out_stk} {args} --apply_transform --interp linear")
    applied = Image.read_stack(out_stk)
    # applying the updated labels to the ORIGINAL pixels reproduces it
    from xmipp3_tpu.ops.geo import apply_affine_2d, metadata_alignment_matrices
    rows = list(md.iterRows())
    A = metadata_alignment_matrices(
        np.array([r["anglePsi"] for r in rows], np.float32),
        np.array([r["shiftX"] for r in rows], np.float32),
        np.array([r["shiftY"] for r in rows], np.float32),
        np.array([bool(r.get("flip", 0)) for r in rows]),
        np.array([float(r.get("scale", 1.0)) for r in rows], np.float32))
    via_md = np.asarray(apply_affine_2d(data, np.asarray(A), order=1))
    # interior comparison (boundary handling differs at the edge pixels)
    np.testing.assert_allclose(via_md[:, 6:-6, 6:-6],
                               applied[:, 6:-6, 6:-6], atol=2e-2)


def test_matrix_flag_equals_rotate(md_stack, tmp_path):
    fn_md, fn_stack, data = md_stack
    ang = np.deg2rad(-30.0)   # CLI --rotate 30 (clockwise) = psi -30
    c, s = np.cos(ang), np.sin(ang)
    mat = f"{c} {s} 0 {-s} {c} 0 0 0 1"
    out1 = str(tmp_path / "m.mrcs")
    out2 = str(tmp_path / "r.mrcs")
    run_prog("transform_geometry",
             f"-i {fn_stack} -o {out1} --matrix {mat} --interp linear")
    run_prog("transform_geometry",
             f"-i {fn_stack} -o {out2} --rotate 30 --interp linear "
             f"--dont_apply_geo")
    np.testing.assert_allclose(Image.read_stack(out1),
                               Image.read_stack(out2), atol=1e-4)


def test_write_matrix(md_stack, tmp_path, capsys):
    fn_md, fn_stack, _ = md_stack
    out = str(tmp_path / "w.mrcs")
    run_prog("transform_geometry",
             f"-i {fn_stack} -o {out} --rotate 10 --write_matrix")
    err = capsys.readouterr().err
    assert "[" in err and err.count("\n") >= 4


def test_shift_to_updates_metadata(md_stack, tmp_path):
    fn_md, fn_stack, _ = md_stack
    md0 = MetaData(fn_md)
    md0.setColumnValues("angleRot", [0.0, 30.0, 60.0, 90.0])
    md0.setColumnValues("angleTilt", [0.0, 15.0, 30.0, 45.0])
    fn2 = str(tmp_path / "in2.xmd")
    md0.write(fn2)
    out_md = str(tmp_path / "st.xmd")
    run_prog("transform_geometry", f"-i {fn2} -o {out_md} --shift_to 3 0 0")
    md = MetaData(out_md)
    rows = list(md.iterRows())
    from xmipp3_tpu.core.geometry import euler_matrix
    for r0, r in zip(md0.iterRows(), rows):
        R = np.asarray(euler_matrix(r0.get("angleRot", 0.0),
                                    r0.get("angleTilt", 0.0),
                                    r0.get("anglePsi", 0.0)))
        posp = R @ np.array([3.0, 0.0, 0.0])
        assert abs(r["shiftX"] - (r0.get("shiftX", 0.0) + posp[0])) < 1e-4
        assert abs(r["shiftY"] - (r0.get("shiftY", 0.0) + posp[1])) < 1e-4


def test_align_with_z():
    rng = np.random.default_rng(0)
    for _ in range(10):
        v = rng.standard_normal(3)
        R = align_with_z(v)
        np.testing.assert_allclose(R @ (v / np.linalg.norm(v)),
                                   [0, 0, 1], atol=1e-12)
        np.testing.assert_allclose(R @ R.T, np.eye(3), atol=1e-12)
        assert np.linalg.det(R) > 0.99
    # degenerate: axis along x
    R = align_with_z([1.0, 0.0, 0.0])
    np.testing.assert_allclose(R @ [1, 0, 0], [0, 0, 1], atol=1e-12)


def test_ico_setting_rotation_conjugates_symmetry():
    """Rotating a volume i2->i1 must conjugate the i2 group into the i1
    group (the defining property of the setting change)."""
    from xmipp3_tpu.core.sym import symmetry_matrices
    G2 = symmetry_matrices("i2")
    G1 = symmetry_matrices("i1")
    R = ico_setting_rotation("i2", "i1")
    conj = np.einsum("ij,njk,kl->nil", R, G2, R.T)
    # every conjugated element must be in G1
    for M in conj:
        d = np.abs(G1 - M[None]).max(axis=(1, 2)).min()
        assert d < 1e-9


def test_rotate_volume_aliases(tmp_path):
    vol = np.zeros((16, 16, 16), np.float32)
    vol[8, 8, 12] = 1.0
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out1 = str(tmp_path / "a.vol")
    out2 = str(tmp_path / "b.vol")
    run_prog("transform_geometry",
             f"-i {fn} -o {out1} --rotate_volume axis 90 0 0 1 --interp linear")
    # equivalent explicit matrix (rotation about z by 90 deg, reference
    # passive convention = rotation3d_matrix)
    from xmipp3_tpu.core.geometry import rotation3d_matrix
    M = rotation3d_matrix(90.0, [0, 0, 1])
    mstr = " ".join(f"{x:.10f}" for x in
                    np.asarray(
                        _axis_mat()).ravel())
    run_prog("transform_geometry",
             f"-i {fn} -o {out2} --rotate_volume matrix {mstr} "
             f"--interp linear")
    np.testing.assert_allclose(load_image(out1), load_image(out2),
                               atol=1e-4)


def _axis_mat():
    ang = np.deg2rad(90.0)
    K = np.array([[0, -1, 0], [1, 0, 0], [0, 0, 0]], np.float64)
    return np.eye(3) + np.sin(ang) * K + (1 - np.cos(ang)) * (K @ K)


def test_md_pose_from_matrix_roundtrip():
    from xmipp3_tpu.ops.geo import metadata_alignment_matrices
    rng = np.random.default_rng(1)
    psi = rng.uniform(-180, 180, 5).astype(np.float32)
    sx = rng.uniform(-4, 4, 5).astype(np.float32)
    sy = rng.uniform(-4, 4, 5).astype(np.float32)
    flip = rng.integers(0, 2, 5).astype(bool)
    sc = rng.uniform(0.7, 1.4, 5).astype(np.float32)
    A = np.asarray(metadata_alignment_matrices(psi, sx, sy, flip, sc))
    for i in range(5):
        p = md_pose_from_matrix(A[i])
        assert abs((p["psi"] - psi[i] + 180) % 360 - 180) < 1e-3
        assert abs(p["x"] - sx[i]) < 1e-3
        assert abs(p["y"] - sy[i]) < 1e-3
        assert abs(p["scale"] - sc[i]) < 1e-4
        assert p["flip"] == bool(flip[i])


# ---------------------------------------------------------------------------
# transform_window reference flags (transform_window.cpp)
# ---------------------------------------------------------------------------

def test_window_corners_logical_equals_size(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((3, 32, 32)).astype(np.float32)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, data)
    out1 = str(tmp_path / "a.mrcs")
    out2 = str(tmp_path / "b.mrcs")
    # --size 16 == --corners -8 -8 7 7 (FIRST/LAST_XMIPP_INDEX of 16)
    run_prog("transform_window", f"-i {fn} -o {out1} --size 16")
    run_prog("transform_window", f"-i {fn} -o {out2} --corners -8 -8 7 7")
    np.testing.assert_allclose(Image.read_stack(out1),
                               Image.read_stack(out2), atol=1e-6)


def test_window_corners_physical_and_pad(tmp_path):
    rng = np.random.default_rng(1)
    data = rng.standard_normal((2, 16, 16)).astype(np.float32) + 5.0
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, data)
    out = str(tmp_path / "p.mrcs")
    run_prog("transform_window",
             f"-i {fn} -o {out} --corners 2 2 13 13 --physical")
    res = Image.read_stack(out)
    np.testing.assert_allclose(res, data[:, 2:14, 2:14], atol=1e-6)
    # pad avg: enlarge with average fill
    out2 = str(tmp_path / "q.mrcs")
    run_prog("transform_window",
             f"-i {fn} -o {out2} --corners -12 -12 11 11 --pad avg")
    res2 = Image.read_stack(out2)
    assert res2.shape == (2, 24, 24)
    assert abs(res2[0, 0, 0] - data[0].mean()) < 1e-5


def test_window_volume_corners(tmp_path):
    rng = np.random.default_rng(2)
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out = str(tmp_path / "w.vol")
    run_prog("transform_window",
             f"-i {fn} -o {out} --corners -4 -4 -4 3 3 3")
    res = load_image(out)
    assert res.shape == (8, 8, 8)
    np.testing.assert_allclose(res, vol[4:12, 4:12, 4:12], atol=1e-6)


def test_window_unitcell_c4(tmp_path):
    """c4 unit cell: mask covers ~1/4 of the shell and orbit copies tile
    the full shell."""
    n = 24
    rng = np.random.default_rng(3)
    vol = rng.standard_normal((n, n, n)).astype(np.float32)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out = str(tmp_path / "uc.vol")
    run_prog("transform_window",
             f"-i {fn} -o {out} --unitcell c4 3 10 0 0 1")
    res = load_image(out)
    nz = np.count_nonzero(np.abs(res) > 1e-8)
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float64) - n // 2
    r = np.sqrt(x * x + y * y + z * z)
    shell = np.count_nonzero((r >= 3) & (r <= 10))
    assert 0.15 < nz / shell < 0.35   # ~1/4
