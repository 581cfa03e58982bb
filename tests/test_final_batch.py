"""Tests for the final endpoint batch + pallas polar parity."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.pdb import AtomicModel, read_pdb, write_pdb
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, name
    return prog


def test_metadata_xml(tmp_path):
    md = MetaData.fromRows([{"itemId": 1, "cost": 0.5, "image": "a.mrc"}])
    fn = str(tmp_path / "m.xmd")
    md.write(fn)
    out = str(tmp_path / "m.xml")
    run_prog("metadata_xml", f"-i {fn} -o {out}")
    txt = open(out).read()
    assert "<ROW" in txt and 'image="a.mrc"' in txt


def test_metadata_split_3d(tmp_path):
    # reference contract (metadata_split_3D.cpp): per gallery direction the
    # neighbours are split at their median maxCC; correlates-well images
    # accumulate positive votes -> _upper, the rest -> _lower
    rng = np.random.default_rng(1)
    rows = []
    for i in range(40):
        good = i % 2 == 0
        rows.append({"itemId": i + 1, "image": f"im{i:03d}.spi",
                     "imageIndex": i,
                     "angleRot": float(rng.uniform(-180, 180)),
                     "angleTilt": float(rng.uniform(10, 90)),
                     "maxCC": (0.8 if good else 0.2) +
                     float(rng.normal(0, 0.01))})
    fn = str(tmp_path / "a.xmd")
    MetaData.fromRows(rows).write(fn)
    run_prog("metadata_split_3D",
             f"-i {fn} --oroot {tmp_path}/h --angSampling 20 --maxDist 40")
    up = MetaData(str(tmp_path / "h_upper.xmd"))
    lo = MetaData(str(tmp_path / "h_lower.xmd"))
    # high-cc images dominate the upper half
    up_cc = np.asarray(up.getColumn("maxCC"), float)
    lo_cc = np.asarray(lo.getColumn("maxCC"), float)
    assert up_cc.mean() > lo_cc.mean()
    assert (up_cc > 0.5).mean() > 0.8


def test_phantom_movie_and_alignment(tmp_path):
    fn = str(tmp_path / "mv.mrcs")
    run_prog("phantom_movie", f"-o {fn} -size 128 128 6 --simple "
             f"--shift 2 0 -1 0 --skipBarrel --skipDose --step 32 32 "
             f"--thickness 2 --signal 2 --seed 1")
    gt = MetaData(fn[:-5] + "_gt.xmd")
    assert gt.size() == 6
    out_md = str(tmp_path / "sh.xmd")
    run_prog("movie_alignment_correlation",
             f"-i {fn} -o {out_md} --maxShift 30 --sampling 1 "
             f"--skipLocalAlignment -v 0")
    est = np.stack([MetaData(out_md).getColumn("shiftX"),
                    MetaData(out_md).getColumn("shiftY")], axis=1)
    true = np.stack([gt.getColumn("shiftX"), gt.getColumn("shiftY")], axis=1)
    true = true - true.mean(axis=0)
    assert np.abs(est - true).max() < 0.5


def test_peak_high_contrast(tmp_path):
    rng = np.random.default_rng(2)
    img = rng.standard_normal((128, 128)).astype(np.float32) * 0.1
    img[30, 40] = 50.0
    img[90, 100] = -45.0
    fn = str(tmp_path / "i.mrc")
    save_image(fn, img)
    out = str(tmp_path / "p.xmd")
    prog = run_prog("image_peak_high_contrast", f"-i {fn} -o {out} --thr 5")
    assert prog.n_peaks == 2
    md = MetaData(out)
    coords = {(md.getValue("xcoor", i), md.getValue("ycoor", i))
              for i in md}
    assert (40, 30) in coords and (100, 90) in coords


def test_noisy_zones_filter(tmp_path):
    rng = np.random.default_rng(3)
    mic = rng.standard_normal((256, 256)).astype(np.float32)
    mic[0:80, 0:80] *= 20  # noisy corner
    fn_mic = str(tmp_path / "m.mrc")
    save_image(fn_mic, mic)
    rows = [{"xcoor": 40, "ycoor": 40, "itemId": 1},    # in noisy zone
            {"xcoor": 180, "ycoor": 180, "itemId": 2},
            {"xcoor": 200, "ycoor": 120, "itemId": 3}]
    fn_pos = str(tmp_path / "pos.xmd")
    MetaData.fromRows(rows).write(fn_pos)
    out = str(tmp_path / "f.xmd")
    prog = run_prog("coordinates_noisy_zones_filter",
                    f"--pos {fn_pos} --mic {fn_mic} -o {out} --zmax 3")
    md = MetaData(out)
    ids = set(md.getColumn("itemId"))
    assert 1 not in ids and {2, 3} <= ids


def test_pdb_programs(tmp_path):
    rng = np.random.default_rng(4)
    model = AtomicModel(rng.uniform(-10, 10, (40, 3)), ["C"] * 40,
                        np.zeros(40, np.float32), np.ones(40, np.float32))
    fn = str(tmp_path / "m.pdb")
    write_pdb(fn, model)
    prog = run_prog("pdb_analysis", f"-i {fn}")
    assert prog.radius_of_gyration > 0
    # reduce
    out = str(tmp_path / "red.pdb")
    run_prog("pdb_reduce_pseudoatoms", f"-i {fn} -o {out} --num 10")
    assert len(read_pdb(out)) == 10
    # label from volume
    vol = np.ones((32, 32, 32), np.float32) * 7.0
    fnv = str(tmp_path / "v.vol")
    save_image(fnv, vol)
    out2 = str(tmp_path / "lab.pdb")
    # reference semantics (pdb_label_from_volume.cpp:242): the sampled
    # value lands in the OCCUPANCY column, and voxel indices start at 0
    # unless --origin recenters them — atoms span ±10 Å, so center at 16
    run_prog("pdb_label_from_volume",
             f"--pdb {fn} --vol {fnv} -o {out2} --origin 16 16 16 "
             f"--md {tmp_path}/params.xmd")
    m2 = read_pdb(out2)
    assert np.allclose(m2.occupancies, 7.0, atol=0.01)


def test_tilt_pair_assignment(tmp_path):
    rng = np.random.default_rng(5)
    u = rng.uniform(50, 450, (25, 2))
    # tilted = squeeze in x + shift, with shuffled order
    t_full = np.stack([u[:, 0] * 0.7 + 30, u[:, 1] + 10], axis=1)
    perm = rng.permutation(25)
    MetaData.fromRows([{"xcoor": int(p[0]), "ycoor": int(p[1]),
                        "itemId": i + 1} for i, p in enumerate(u)]
                      ).write(str(tmp_path / "u.xmd"))
    MetaData.fromRows([{"xcoor": int(p[0]), "ycoor": int(p[1]),
                        "itemId": i + 1} for i, p in
                       enumerate(t_full[perm])]
                      ).write(str(tmp_path / "t.xmd"))
    prog = run_prog("image_assignment_tilt_pair",
                    f"--untiltcoor {tmp_path}/u.xmd "
                    f"--tiltcoor {tmp_path}/t.xmd --odir {tmp_path} -v 0")
    assert prog.n_pairs >= 20


def test_compare_density(tmp_path):
    # two blobs; v1 has an EXTRA satellite blob -> after removing the
    # biggest component the residual mass is v1's, so the sign image
    # should be overwhelmingly +1 where it is nonzero
    n = 64
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    main = np.exp(-(z ** 2 + y ** 2 + x ** 2) / 40.0)
    sat = np.exp(-((z - 22) ** 2 + (y - 22) ** 2 + x ** 2) / 14.0)
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, (main + sat).astype(np.float32))
    save_image(f2, main.astype(np.float32))
    out = str(tmp_path / "corr.xmp")
    prog = run_prog("compare_density",
                    f"-v1 {f1} -v2 {f2} -o {out} --degstep 45 -v 0")
    cc = prog.corr_image
    assert cc.shape == (9, 5)          # 360/45+1 x 180/45+1
    assert set(np.unique(cc)).issubset({-1.0, 0.0, 1.0})
    nz = cc[cc != 0]
    assert len(nz) > 0 and (nz == 1).mean() > 0.8
    assert np.squeeze(Image(out).data).shape == (9, 5)
    # identical volumes -> all zeros
    prog2 = run_prog("compare_density",
                     f"-v1 {f2} -v2 {f2} -o {tmp_path}/z.xmp "
                     f"--degstep 90 -v 0")
    assert np.all(prog2.corr_image == 0)


def test_emx_golden_and_roundtrip(tmp_path):
    from xmipp3_tpu.core.emx import read_emx, write_emx
    import os
    fix = "/root/reference/src/xmipp/resources/test/EMX/EMXread.emx"
    if not os.path.exists(fix):
        pytest.skip("EMX fixture unavailable")
    tables = read_emx(fix)
    assert tables["micrograph"].size() == 2
    mic = tables["micrograph"]
    assert mic.getValue("ctfVoltage", 0) == 100.0
    assert mic.getValue("ctfDefocusU", 0) == 10000.0   # 1000 nm -> Å
    assert mic.getValue("sampling_rate", 0) == pytest.approx(5.6)
    # program-level conversion emx -> xmd -> emx
    out_md = str(tmp_path / "p.xmd")
    run_prog("metadata_convert_emx", f"-i {fix} -o {out_md} --entity particle")
    md = MetaData(out_md)
    assert md.size() == 1
    out_emx = str(tmp_path / "p.emx")
    run_prog("metadata_convert_emx", f"-i {out_md} -o {out_emx}")
    back = read_emx(out_emx)["particle"]
    assert back.getValue("ctfDefocusU", 0) == 10000.0


def test_tilt_pair_delaunay_hard_transform(tmp_path):
    """Dense field + 35 deg in-plane rotation + 55 deg tilt anisotropy +
    20% outliers: the Delaunay quad-invariant RANSAC must recover the
    correspondence where identity-seeded mutual-NN cannot (reference
    external/delaunay + TiltPairAligner, data/micrograph.h:549)."""
    from xmipp3_tpu.core.metadata import MetaData
    from xmipp3_tpu.programs import get_program
    rng = np.random.default_rng(0)
    d = str(tmp_path)
    n = 150
    u = rng.uniform(50, 1950, (n, 2))
    ang = np.deg2rad(35.0)
    ct = np.cos(np.deg2rad(55.0))
    R = np.array([[np.cos(ang), -np.sin(ang)], [np.sin(ang), np.cos(ang)]])
    A_true = R @ np.array([[ct, 0], [0, 1.0]])
    b_true = np.array([120.0, -60.0])
    t = u @ A_true.T + b_true + rng.normal(0, 1.5, (n, 2))
    u_all = np.concatenate([u, rng.uniform(50, 1950, (30, 2))])
    t_all = np.concatenate([t, rng.uniform(50, 1950, (30, 2))])
    rng.shuffle(t_all)
    MetaData.fromRows([{"xcoor": int(p[0]), "ycoor": int(p[1])}
                       for p in u_all]).write(d + "/u.xmd")
    MetaData.fromRows([{"xcoor": int(p[0]), "ycoor": int(p[1])}
                       for p in t_all]).write(d + "/t.xmd")
    prog = get_program("image_assignment_tilt_pair")
    prog.read(["x", "--untiltcoor", d + "/u.xmd", "--tiltcoor",
               d + "/t.xmd", "--odir", d, "--maxshift", "12"])
    assert prog.tryRun() == 0
    mu = MetaData(d + "/untilted_assigned.xmd")
    mt = MetaData(d + "/tilted_assigned.xmd")
    uu = np.stack([mu.getColumn("xcoor").astype(float),
                   mu.getColumn("ycoor").astype(float)], 1)
    tt = np.stack([mt.getColumn("xcoor").astype(float),
                   mt.getColumn("ycoor").astype(float)], 1)
    pred = uu @ A_true.T + b_true
    resid = np.linalg.norm(pred - tt, axis=1)
    assert prog.n_pairs > 0.8 * n
    assert (resid < 10).mean() > 0.97


def test_phantom_movie_full_surface(tmp_path):
    """Reference grammar (phantom_movie_main.cpp:41-83): ice + low-pass +
    range adjust, particle content types, barrel distortion, Poisson dose,
    gain/dark references."""
    fn = str(tmp_path / "mv2.mrcs")
    run_prog("phantom_movie",
             f"-o {fn} -size 96 80 4 --type cross --count 12 "
             f"--particleSize 10 14 --thickness 3 --signal 0.5 "
             f"--ice 1.0 0.5 0.2 1.8 --low 0.1 0.05 --dose 20 "
             f"--barrel 0.01 0.02 0.0 0.0 --shift -0.1 0.01 -0.05 0.01 "
             f"--gain {tmp_path}/g.mrc --dark {tmp_path}/d.mrc --seed 3")
    mv = Image(fn).data
    assert mv.shape == (4, 80, 96)
    # Poisson dose => integer counts, scaled by dose*ice range
    assert np.allclose(mv, np.round(mv))
    assert mv.mean() > 1  # dose 20 on ~[0.2, 1.8+signal] ice
    g = np.squeeze(Image(str(tmp_path / "g.mrc")).data)
    d = np.squeeze(Image(str(tmp_path / "d.mrc")).data)
    assert g.shape == (80, 96) and np.allclose(g, 1) and np.allclose(d, 0)
    # frames differ (drift + barrel + dose)
    assert np.abs(mv[0] - mv[3]).mean() > 0.1
    # circle type + skipIce: content on a zero background
    fn3 = str(tmp_path / "mv3.mrcs")
    run_prog("phantom_movie",
             f"-o {fn3} -size 64 64 2 --type circle --count 6 "
             f"--particleSize 8 12 --thickness 2 --signal 1 --skipIce "
             f"--skipDose --skipShift --skipBarrel --seed 4")
    mv3 = Image(fn3).data
    assert mv3.max() >= 1 and (mv3 >= 0).all()
    assert np.allclose(mv3[0], mv3[1])  # no displacement at all


def test_peak_high_contrast_fiducial_mode(tmp_path):
    """Full fiducial pipeline (image_peak_high_contrast.cpp:58-68):
    bandpass + dark-outlier components + mirror/Mahalanobis filters."""
    rng = np.random.default_rng(5)
    Z, H, W = 24, 96, 96
    vol = 0.1 * rng.standard_normal((Z, H, W)).astype(np.float32)
    truth = [(30, 30, 12), (70, 40, 12), (50, 70, 10)]
    zz, yy, xx = np.mgrid[0:Z, 0:H, 0:W]
    for (x, y, z) in truth:
        vol -= 3.0 * np.exp(-((xx - x) ** 2 + (yy - y) ** 2
                              + (zz - z) ** 2) / 6.0).astype(np.float32)
    fn = str(tmp_path / "tomo.mrc")
    save_image(fn, vol)
    out = str(tmp_path / "coords3d.xmd")
    prog = run_prog("image_peak_high_contrast",
                    f"--vol {fn} -o {out} --samplingRate 2 "
                    f"--fiducialSize 16 --boxSize 16 --numberSampSlices 8 "
                    f"--sdThr 4 --numberOfCoordinatesThr 5 "
                    f"--mirrorCorrelationThr 0.1 "
                    f"--mahalanobisDistanceThr 3 --relaxedModeThr 2 -v 0")
    md = MetaData(out)
    pts = np.stack([np.asarray(md.getColumn("xcoor"), float),
                    np.asarray(md.getColumn("ycoor"), float),
                    np.asarray(md.getColumn("zcoor"), float)], axis=1)
    t = np.asarray(truth, float)
    dmin = np.linalg.norm(pts[:, None] - t[None], axis=-1).min(axis=0)
    assert (dmin < 4).all(), (pts, truth)
