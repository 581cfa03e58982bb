"""Volume utility + PDB program tests."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.pdb import AtomicModel, rasterize, read_pdb, write_pdb
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, name
    return prog


def test_pdb_roundtrip(tmp_path):
    rng = np.random.default_rng(0)
    model = AtomicModel(rng.uniform(-20, 20, (50, 3)),
                        ["C"] * 30 + ["N"] * 10 + ["O"] * 10,
                        np.zeros(50, np.float32), np.ones(50, np.float32))
    fn = str(tmp_path / "m.pdb")
    write_pdb(fn, model)
    m2 = read_pdb(fn)
    assert len(m2) == 50
    np.testing.assert_allclose(m2.coords, model.coords, atol=1e-3)
    assert m2.elements[0] == "C" and m2.elements[45] == "O"


def test_volume_from_pdb_program(tmp_path):
    model = AtomicModel(np.array([[0.0, 0, 0], [8.0, 0, 0], [0, 8.0, 0]]),
                        ["C", "C", "C"], np.zeros(3, np.float32),
                        np.ones(3, np.float32))
    fn = str(tmp_path / "m.pdb")
    write_pdb(fn, model)
    out = str(tmp_path / "m.vol")
    prog = run_prog("volume_from_pdb", f"-i {fn} -o {out} --sampling 1 --size 32 -v 0")
    vol = np.squeeze(Image(out).data)
    assert vol.shape == (32, 32, 32)
    assert vol.max() > 0
    # mass concentrated near atom positions (centered model)
    assert vol[16, 16 + 5, 16 - 3] < vol[16, 16, 16] + vol.max()


def test_volume_center_program(tmp_path):
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    vol = np.exp(-((z - 10) ** 2 + (y - 20) ** 2 + (x - 12) ** 2) / 8.0)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out = str(tmp_path / "c.vol")
    run_prog("volume_center", f"-i {fn} -o {out}")
    c = np.squeeze(Image(out).data)
    idx = np.unravel_index(np.argmax(c), c.shape)
    assert np.allclose(idx, (16, 16, 16), atol=1)


def test_volume_align_program(tmp_path):
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - 16, y - 16, x - 16
    vol = (np.exp(-((z - 5) ** 2 + y ** 2 + x ** 2) / 8.0) +
           np.exp(-(z ** 2 + (y - 6) ** 2 + (x + 4) ** 2) / 6.0))
    from xmipp3_tpu.ops.geo import apply_affine_3d
    from xmipp3_tpu.core.geometry import euler_matrix
    R = np.asarray(euler_matrix(0.0, 40.0, 0.0), np.float32)
    rotated = np.asarray(apply_affine_3d(vol.astype(np.float32), R[None]))[0]
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, vol)
    save_image(f2, rotated)
    prog = run_prog("volume_align", f"--i1 {f2} --i2 {f1} --step 20 -v 0")
    assert prog.corr > 0.9


def test_volume_subtraction_program(tmp_path):
    """POCS adjustment (reference semantics): without --sub the output is
    volume 2 adjusted onto volume 1's constraint sets; with --sub the
    difference of a scaled copy is ~0 (volume_subtraction.cpp run())."""
    n = 24
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    a = np.exp(-((z - 12) ** 2 + (y - 10) ** 2 + (x - 14) ** 2) / 20)
    a = a.astype(np.float32)
    b = (1.5 * a).astype(np.float32)
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, a)
    save_image(f2, b)
    out = str(tmp_path / "d.vol")
    run_prog("volume_subtraction", f"--i1 {f1} --i2 {f2} -o {out} --radavg")
    adj = np.squeeze(Image(out).data)
    c = np.corrcoef(adj.ravel(), a.ravel())[0, 1]
    assert c > 0.99
    run_prog("volume_subtraction",
             f"--i1 {f1} --i2 {f2} -o {out} --radavg --sub")
    diff = np.squeeze(Image(out).data)
    assert np.abs(diff).max() < 0.12 * a.max()


def test_volume_segment_otsu(tmp_path):
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    vol = ((z - 16) ** 2 + (y - 16) ** 2 + (x - 16) ** 2 < 64).astype(
        np.float32)
    vol += 0.05 * np.random.default_rng(2).standard_normal((n, n, n)
                                                           ).astype(np.float32)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out = str(tmp_path / "m.vol")
    run_prog("volume_segment", f"-i {fn} -o {out} --method otsu -v 0")
    mask = np.squeeze(Image(out).data)
    true = ((z - 16) ** 2 + (y - 16) ** 2 + (x - 16) ** 2 < 64)
    agreement = (mask.astype(bool) == true).mean()
    assert agreement > 0.98


def test_transform_mask_program(tmp_path):
    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((4, 32, 32)).astype(np.float32)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    out = str(tmp_path / "masked.mrcs")
    run_prog("transform_mask", f"-i {fn} -o {out} --mask circular 10")
    m = Image.read_stack(out)
    assert m[0][0, 0] == 0.0
    assert m[0][16, 16] == imgs[0][16, 16]


def test_transform_symmetrize_c4(tmp_path):
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - 16, y - 16, x - 16
    vol = np.exp(-(z ** 2 + (y - 6) ** 2 + (x - 6) ** 2) / 6.0).astype(np.float32)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out = str(tmp_path / "sym.vol")
    run_prog("transform_symmetrize", f"-i {fn} -o {out} --sym c4")
    s = np.squeeze(Image(out).data)
    # c4-symmetrized: 90° rotation invariance
    from xmipp3_tpu.ops.geo import apply_affine_3d
    from xmipp3_tpu.core.geometry import euler_matrix
    R = np.asarray(euler_matrix(90.0, 0.0, 0.0), np.float32)
    s90 = np.asarray(apply_affine_3d(s, R[None]))[0]
    inner = (np.sqrt(z ** 2 + y ** 2 + x ** 2) < 12)
    err = np.abs(s - s90)[inner].max() / s.max()
    assert err < 0.05


def test_transform_symmetrize_helical(tmp_path):
    """Helical symmetrization (symmetry_Helical, symmetries.cpp:1632):
    a perfect helix of blobs is invariant; an off-helix blob is smeared."""
    n = 32
    z_rise, rot_step = 4.0, np.deg2rad(40.0)
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = np.zeros((n, n, n), np.float32)
    r0 = 8.0
    for l in range(-4, 5):
        zc = l * z_rise
        th = l * rot_step
        yc, xc = r0 * np.sin(th), r0 * np.cos(th)
        vol += np.exp(-((zz - zc) ** 2 + (yy - yc) ** 2 + (xx - xc) ** 2)
                      / 4.0)
    fn = str(tmp_path / "helix.vol")
    save_image(fn, vol)
    out = str(tmp_path / "sym.vol")
    run_prog("transform_symmetrize",
             f"-i {fn} -o {out} --sym helical "
             f"--helixParams 4 40 --heightFraction 0.8")
    s = np.squeeze(Image(out).data)
    core = np.s_[10:22, 4:28, 4:28]
    c = np.corrcoef(s[core].ravel(), vol[core].ravel())[0, 1]
    assert c > 0.95
    # off-helix blob gets averaged away relative to the helix density
    vol2 = vol.copy()
    vol2[16, 16 + 12, 16] += 5.0
    fn2 = str(tmp_path / "helix2.vol")
    save_image(fn2, vol2)
    out2 = str(tmp_path / "sym2.vol")
    run_prog("transform_symmetrize",
             f"-i {fn2} -o {out2} --sym helical "
             f"--helixParams 4 40 --heightFraction 0.8")
    s2 = np.squeeze(Image(out2).data)
    assert s2[16, 28, 16] < 2.5  # the 5.0 spike is smeared along the orbit


def test_transform_symmetrize_dihedral_and_sum(tmp_path):
    n = 24
    zz, yy, xx = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    # z-asymmetric object: blob above the equator
    vol = np.exp(-((zz - 4) ** 2 + yy ** 2 + (xx - 5) ** 2) / 6.0
                 ).astype(np.float32)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out = str(tmp_path / "dih.vol")
    run_prog("transform_symmetrize", f"-i {fn} -o {out} --sym dihedral")
    s = np.squeeze(Image(out).data)
    # dihedral result is (close to) invariant under 180deg X rotation
    s180 = s[::-1, ::-1, :]
    err = np.abs(s - s180).max() / max(s.max(), 1e-6)
    assert err < 1e-4  # exact by construction (W + X180(W))/2
    # --sum on a point group scales by the group order
    out_avg = str(tmp_path / "avg.vol")
    out_sum = str(tmp_path / "sum.vol")
    run_prog("transform_symmetrize", f"-i {fn} -o {out_avg} --sym c2")
    run_prog("transform_symmetrize", f"-i {fn} -o {out_sum} --sym c2 --sum")
    a = np.squeeze(Image(out_avg).data)
    b = np.squeeze(Image(out_sum).data)
    np.testing.assert_allclose(b, 2 * a, rtol=1e-4, atol=1e-5)


def test_volume_to_pseudoatoms(tmp_path):
    """Reference surface volume_to_pseudoatoms.cpp:111-1020: seed-grow
    optimization reaches targetError; atoms land on the blob centers."""
    n = 24
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    vol = (np.exp(-((z - 12) ** 2 + (y - 8) ** 2 + (x - 12) ** 2) / 4.0) +
           np.exp(-((z - 12) ** 2 + (y - 16) ** 2 + (x - 12) ** 2) / 4.0)
           ).astype(np.float32)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    prog = run_prog("volume_to_pseudoatoms",
                    f"-i {fn} -o {tmp_path}/pa --initialSeeds 10 "
                    f"--sigma 1.4 --targetError 8 -v 0")
    model = read_pdb(str(tmp_path / "pa.pdb"))
    assert len(model) >= 2
    assert prog.final_error < 0.15
    # both blob centers covered by a nearby atom (centered coords)
    targets = np.array([[0, -4, 0], [0, 4, 0]], float)
    d = np.linalg.norm(model.coords[:, None] - targets[None], axis=2)
    assert d.min(axis=0).max() < 2.0
    # header REMARKs (writeResults, volume_to_pseudoatoms.cpp:929-932)
    head = open(str(tmp_path / "pa.pdb")).read()
    assert "REMARK fixedGaussian" in head
    assert "REMARK intensityColumn Bfactor" in head


def test_volume_to_pseudoatoms_options(tmp_path):
    """occupancy column, dontAllowIntensity, verbose-2 diagnostics."""
    n = 20
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    vol = np.exp(-((z - 10) ** 2 + (y - 10) ** 2 + (x - 10) ** 2) / 6.0
                 ).astype(np.float32)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    run_prog("volume_to_pseudoatoms",
             f"-i {fn} -o {tmp_path}/pb --initialSeeds 6 --sigma 1.7 "
             f"--targetError 20 --intensityColumn occupancy "
             f"--dontScale -v 2")
    model = read_pdb(str(tmp_path / "pb.pdb"))
    assert len(model) >= 1
    # intensity went to the occupancy column (min atom writes exactly
    # 0.01 by the reference formula); Bfactor holds the literal 1
    assert model.occupancies.min() >= 0.01
    assert np.allclose(model.bfactors, 1.0)
    for suffix in ("_approximation.vol", "_rawDiff.vol",
                   "_relativeDiff.vol", "_approximation.hist"):
        assert (tmp_path / ("pb" + suffix)).exists(), suffix
    # fixed-intensity mode: every atom carries fraction f of the range
    run_prog("volume_to_pseudoatoms",
             f"-i {fn} -o {tmp_path}/pc --initialSeeds 6 --sigma 1.7 "
             f"--targetError 20 --dontAllowIntensity 0.2 "
             f"--dontAllowMovement -v 0")
    model = read_pdb(str(tmp_path / "pc.pdb"))
    # all intensities equal -> written as 1.0 in the Bfactor column
    assert np.allclose(model.bfactors, model.bfactors[0])


def test_volume_from_pdb_full_surface(tmp_path):
    """Round-4 flags: blobs/poor_Gaussian/fixed_Gaussian/high_sampling_rate/
    orig/noHet/oPDB/intensityColumn (volume_from_pdb.cpp:185-560)."""
    import numpy as np
    from xmipp3_tpu.core.image import Image
    pdb = tmp_path / "m.pdb"
    lines = [
        "ATOM      1  CA  ALA A   1       2.000   0.000   0.000  1.00 10.00           C",
        "ATOM      2  N   ALA A   2      -2.000   0.000   0.000  0.50 20.00           N",
        "HETATM    3 FE   HEM A   3       0.000   3.000   0.000  1.00  5.00          FE",
    ]
    pdb.write_text("\n".join(lines) + "\n")
    out = str(tmp_path / "v.vol")

    def vol_of(extra):
        run_prog("volume_from_pdb",
                 f"-i {pdb} -o {out} --sampling 1 --size 24 -v 0 " + extra)
        return np.squeeze(Image(out).data)

    v_scatter = vol_of("")
    v_blobs = vol_of("--blobs")
    v_poor = vol_of("--poor_Gaussian")
    v_fixg = vol_of("--fixed_Gaussian 1.5 --intensityColumn Bfactor")
    for v in (v_scatter, v_blobs, v_poor, v_fixg):
        assert v.shape == (24, 24, 24) and v.max() > 0
    # fixed_Gaussian with Bfactor weights: atom 2 (B=20) twice atom 1
    a1 = v_fixg[12, 12, 12 + 2]
    a2 = v_fixg[12, 12, 12 - 2]
    assert abs(a2 / a1 - 2.0) < 0.2
    # noHet removes the iron peak
    v_nohet = vol_of("--noHet")
    assert v_scatter[12, 12 + 3, 12] > 1e-3
    assert v_nohet[12, 12 + 3, 12] < v_scatter[12, 12 + 3, 12] * 0.1
    # high sampling then downscale stays close to direct rasterization
    v_hi = vol_of("--high_sampling_rate 0.5")
    cc = np.corrcoef(v_hi.ravel(), v_scatter.ravel())[0, 1]
    assert cc > 0.95
    # non-cubic size + centering + oPDB
    run_prog("volume_from_pdb",
             f"-i {pdb} -o {out} --sampling 1 --size 32 24 16 "
             f"--centerPDB --oPDB -v 0")
    assert np.squeeze(Image(out).data).shape == (16, 24, 32)
    import os
    assert os.path.exists(str(tmp_path / "v_centered.pdb"))
