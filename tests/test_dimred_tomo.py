"""Dimred library + image screening + tomo program tests."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.models.dimred import METHODS, pca, reduce_dimensionality
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, name
    return prog


def clustered_data(seed=0):
    rng = np.random.default_rng(seed)
    c1 = rng.standard_normal((30, 10)) * 0.5 + np.r_[5, np.zeros(9)]
    c2 = rng.standard_normal((30, 10)) * 0.5 - np.r_[5, np.zeros(9)]
    return np.vstack([c1, c2]), np.r_[np.zeros(30), np.ones(30)]


@pytest.mark.parametrize("method", sorted(METHODS))
def test_dimred_methods_separate_clusters(method):
    X, labels = clustered_data()
    Y = reduce_dimensionality(X, method, d=2)
    assert Y.shape == (60, 2)
    assert np.isfinite(Y).all()
    # the two clusters must be separable along some projection of Y
    m1 = Y[labels == 0].mean(axis=0)
    m2 = Y[labels == 1].mean(axis=0)
    dirv = m2 - m1
    if np.linalg.norm(dirv) < 1e-9:
        pytest.fail("cluster means coincide")
    proj = Y @ dirv
    thresh = (proj[labels == 0].mean() + proj[labels == 1].mean()) / 2
    acc = max(((proj > thresh) == labels).mean(),
              ((proj < thresh) == labels).mean())
    assert acc > 0.9, f"{method}: separation accuracy {acc}"


def test_pca_reconstruction_error():
    X, _ = clustered_data()
    Y, model = pca(X, d=2, return_model=True)
    Xrec = Y @ model["components"] + model["mean"]
    # 2 components capture the dominant structure
    rel = np.linalg.norm(X - Xrec) / np.linalg.norm(X - X.mean(0))
    assert rel < 0.5


def test_vectorize_dimred_roundtrip(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((12, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    vec_md = str(tmp_path / "v.xmd")
    run_prog("image_vectorize", f"-i {fn} -o {vec_md}")
    md = MetaData(vec_md)
    assert md.size() == 12
    assert len(md.getValue("classificationData", 0)) == 256
    out_md = str(tmp_path / "red.xmd")
    run_prog("matrix_dimred", f"-i {vec_md} -o {out_md} --method PCA --dout 3")
    md2 = MetaData(out_md)
    assert len(md2.getValue("dimred", 0)) == 3
    # back to images
    back = str(tmp_path / "back.mrcs")
    run_prog("image_vectorize", f"-i {vec_md} -o {back}")
    np.testing.assert_allclose(Image.read_stack(back), imgs, atol=1e-5)


def test_sort_by_statistics_flags_outlier(tmp_path):
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((10, 16, 16)).astype(np.float32)
    imgs[3] *= 50.0  # outlier
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    out = str(tmp_path / "sorted.xmd")
    prog = run_prog("image_sort_by_statistics", f"-i {fn} -o {out}")
    md = MetaData(out)
    # outlier must be last after sorting by zScore
    last = md.getValue("image", md.size() - 1)
    assert last.startswith("000004@")


def test_eliminate_empty(tmp_path):
    rng = np.random.default_rng(3)
    empty = 0.1 * rng.standard_normal((5, 32, 32)).astype(np.float32)
    full = empty.copy()
    y, x = np.mgrid[0:32, 0:32].astype(np.float32)
    blob = np.exp(-((y - 16) ** 2 + (x - 16) ** 2) / 18.0)
    full += 2 * blob[None]
    imgs = np.concatenate([empty, full])
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    out = str(tmp_path / "kept.xmd")
    elim = str(tmp_path / "elim.xmd")
    prog = run_prog("image_eliminate_empty_particles",
                    f"-i {fn} -o {out} -e {elim} -t 10 --addFeatures")
    assert prog.n_kept == 5 and prog.n_eliminated == 5
    kept = MetaData(out)
    names = [str(r["image"]) for r in kept.iterRows()]
    # the 5 blob-bearing particles (indices 6-10) are the kept ones
    assert all(int(n.split("@")[0]) > 5 for n in names)
    r0 = next(kept.iterRows())
    assert len(np.asarray(r0["scoreByVariance"], float)) == 17
    assert float(r0["scoreByEmptiness"]) > 10


def test_tomo_pipeline(tmp_path):
    # particle volume
    n = 16
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    part = np.exp(-((z - 8) ** 2 + (y - 8) ** 2 + (x - 8) ** 2) / 8.0)
    fn_part = str(tmp_path / "part.vol")
    save_image(fn_part, part)
    # simulator coordinates are centered (placeSubtomoInTomo offsets by
    # dim/2, tomo_simulate_tilt_series.cpp:183-186); angles fixed at 0 so
    # the planted particles are unrotated
    coords = [(60, 60, 32), (120, 80, 32), (90, 140, 32)]
    fn_coords = str(tmp_path / "coords.xmd")
    MetaData.fromRows([{"xcoor": cx - 96, "ycoor": cy - 96,
                        "zcoor": cz - 32, "angleRot": 0.0,
                        "angleTilt": 0.0, "anglePsi": 0.0, "itemId": i + 1}
                       for i, (cx, cy, cz) in enumerate(coords)]
                      ).write(fn_coords)
    root = str(tmp_path / "ts")
    run_prog("tomo_simulate_tilt_series",
             f"--coordinates {fn_coords} --vol {fn_part} -o {root} "
             f"--xdim 192 --ydim 192 --zdim 64 --tiltRange -40 40 20")
    ts = Image.read_stack(root + ".mrcs")
    assert ts.shape[0] == 5
    # extract subtomos from the ground-truth tomogram (absolute coords)
    fn_abs = str(tmp_path / "abs.xmd")
    MetaData.fromRows([{"xcoor": cx, "ycoor": cy, "zcoor": cz,
                        "itemId": i + 1}
                       for i, (cx, cy, cz) in enumerate(coords)]
                      ).write(fn_abs)
    sub_root = str(tmp_path / "sub")
    prog = run_prog("tomo_extract_subtomograms",
                    f"--tomogram {root}_tomogram.mrc "
                    f"--coordinates {fn_abs} --boxsize 16 -o {sub_root} -v 0")
    assert prog.n_extracted == 3
    # average them: should match the (negated) particle
    avg_fn = str(tmp_path / "avg.vol")
    run_prog("tomo_average_subtomos", f"-i {sub_root}.xmd -o {avg_fn}")
    avg = np.squeeze(Image(avg_fn).data)
    c = np.corrcoef(avg.ravel(), part.ravel())[0, 1]
    assert c < -0.9  # simulator plants negated (cryo-contrast) densities
    # dose filter runs
    out_ts = str(tmp_path / "dosed.mrcs")
    run_prog("tomo_tiltseries_dose_filter",
             f"-i {root}.mrcs -o {out_ts} --dosePerImage 3 --sampling 2")
    assert Image.read_stack(out_ts).shape == ts.shape


def test_missing_wedge_detection(tmp_path):
    # build a volume with an explicit missing wedge about y
    from xmipp3_tpu.ops.fourier_filter import wedge_mask_3d
    rng = np.random.default_rng(4)
    vol = rng.standard_normal((48, 48, 48)).astype(np.float32)
    import jax.numpy as jnp
    mask = wedge_mask_3d(48, 48, 48, -50, 50)
    wedged = np.asarray(jnp.fft.irfftn(jnp.fft.rfftn(jnp.asarray(vol)) *
                                       jnp.asarray(mask), s=vol.shape))
    fn = str(tmp_path / "w.vol")
    save_image(fn, wedged)
    prog = run_prog("tomo_detect_missing_wedge", f"-i {fn}")
    th0, thF = prog.wedge
    # missing region is outside [-50, 50] -> detected bounds near +-50..90
    assert th0 < -40 or thF > 40


def test_simulate_tilt_series_reference_surface(tmp_path):
    """Full reference flags: minTilt/maxTilt/tiltStep/thickness/sampling/
    fiducialCoordinates/fiducialDiameter/sigmaNoise/tiltseries/tomogram
    (tomo_simulate_tilt_series.cpp:53-72)."""
    n = 16
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    part = np.exp(-((z - 8) ** 2 + (y - 8) ** 2 + (x - 8) ** 2) / 8.0)
    fn_part = str(tmp_path / "part.vol")
    save_image(fn_part, part)
    fn_coords = str(tmp_path / "coords.xmd")
    MetaData.fromRows([{"xcoor": -30, "ycoor": 10, "zcoor": 0,
                        "angleRot": 15.0, "angleTilt": 30.0,
                        "anglePsi": 5.0}]).write(fn_coords)
    fn_fid = str(tmp_path / "fids.xmd")
    MetaData.fromRows([{"xcoor": 40, "ycoor": -40, "zcoor": 5},
                       {"xcoor": -50, "ycoor": 50, "zcoor": -5}]
                      ).write(fn_fid)
    fn_ts = str(tmp_path / "series.mrcs")
    fn_tomo = str(tmp_path / "tomo.mrc")
    run_prog("tomo_simulate_tilt_series",
             f"--coordinates {fn_coords} --vol {fn_part} "
             f"--tiltseries {fn_ts} --tomogram {fn_tomo} "
             f"--xdim 160 --ydim 160 --thickness 48 "
             f"--minTilt -30 --maxTilt 30 --tiltStep 15 --sampling 2 "
             f"--fiducialCoordinates {fn_fid} --fiducialDiameter 16 "
             f"--sigmaNoise 0.05")
    ts = Image.read_stack(fn_ts)
    assert ts.shape == (5, 160, 160)
    tomo = np.squeeze(Image(fn_tomo).data)
    assert tomo.shape == (48, 160, 160)
    # fiducials are the darkest objects in the tomogram (amp 5*sigma)
    zi, yi, xi = np.unravel_index(np.argmin(tomo), tomo.shape)
    assert abs(xi - (80 + 40)) <= 5 and abs(yi - (80 - 40)) <= 5
    # fiducial disk visible in the zero-tilt image at (x+X/2, y+Y/2)
    zero = ts[2]
    assert zero[80 - 40, 80 + 40] < zero.mean() - 3 * zero.std()
    # tilt metadata written next to the series
    md = MetaData(str(tmp_path / "series.xmd"))
    assert len(list(md.iterRows())) == 5
