"""Tests: tomo misc, classify analysis, halves restoration, find_symmetry,
mpi_run, denoising."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, name
    return prog


def test_tomogram_reconstruction(tmp_path):
    n = 48
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - 24, y - 24, x - 24
    vol = (np.exp(-((z) ** 2 + (y - 5) ** 2 + (x + 4) ** 2) / 8.0) +
           np.exp(-((z + 3) ** 2 + (y + 6) ** 2 + (x - 5) ** 2) / 6.0)
           ).astype(np.float32)
    fn_vol = str(tmp_path / "gt.vol")
    save_image(fn_vol, vol)
    run_prog("tomo_project", f"-i {fn_vol} -o {tmp_path}/ts "
             f"--tiltRange -60 60 5")
    out = str(tmp_path / "tomo.mrc")
    run_prog("tomogram_reconstruction",
             f"-i {tmp_path}/ts.xmd -o {out}")
    rec = np.squeeze(Image(out).data)
    # missing wedge smears along z; correlation still substantial
    c = np.corrcoef(rec.ravel(), vol.ravel())[0, 1]
    assert c > 0.6, c


def test_tomo_landmarks_and_filter(tmp_path):
    rng = np.random.default_rng(0)
    ts = rng.standard_normal((3, 128, 128)).astype(np.float32) * 0.1
    y, x = np.mgrid[0:11, 0:11].astype(np.float32)
    bead = -np.exp(-((y - 5) ** 2 + (x - 5) ** 2) / 4.0)
    spots = [(30, 40), (90, 60), (60, 100)]
    for f in range(3):
        for cx, cy in spots:
            ts[f, cy - 5:cy + 6, cx - 5:cx + 6] += 3 * bead
    fn = str(tmp_path / "ts.mrcs")
    save_image(fn, ts)
    out = str(tmp_path / "marks.xmd")
    prog = run_prog("tomo_detect_landmarks",
                    f"-i {fn} -o {out} --fiducialSize 10 --thr 4 -v 0")
    assert prog.n_landmarks >= 6
    # filter by score
    out2 = str(tmp_path / "filtered.xmd")
    p2 = run_prog("tomo_filter_coordinates",
                  f"--coordinates {out} -o {out2} --minScore 0")
    assert p2.n_kept == prog.n_landmarks


def test_classify_evaluate_and_features(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((12, 32, 32)).astype(np.float32)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    md = MetaData.fromRows([
        {"image": f"{i + 1:06d}@{fn}", "itemId": i + 1,
         "ref": 1 + i % 2, "anglePsi": 0.0, "shiftX": 0.0, "shiftY": 0.0}
        for i in range(12)])
    fn_md = str(tmp_path / "cls.xmd")
    md.write(fn_md)
    prog = run_prog("classify_evaluate_classes", f"-i {fn_md} -v 0")
    assert len(prog.metrics) == 2
    out = str(tmp_path / "features.xmd")
    run_prog("classify_extract_features", f"-i {fn} -o {out}")
    md_f = MetaData(out)
    v = md_f.getValue("classificationData", 0)
    assert len(v) == 2 * (32 // 2 - 2 - 2 + 1)


def test_analyze_cluster_outlier(tmp_path):
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((10, 16, 16)).astype(np.float32) * 0.1
    imgs += np.linspace(0, 1, 10)[:, None, None]  # smooth variation
    imgs[7] = rng.standard_normal((16, 16)) * 10  # outlier
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    md = MetaData.fromRows([{"image": f"{i + 1:06d}@{fn}", "itemId": i + 1}
                            for i in range(10)])
    fn_md = str(tmp_path / "c.xmd")
    md.write(fn_md)
    ref = str(tmp_path / "r.mrc")
    save_image(ref, imgs.mean(axis=0))
    prog = run_prog("classify_analyze_cluster",
                    f"-i {fn_md} --ref {ref} -v 0")
    assert np.argmax(prog.distances) == 7


def test_halves_restoration(tmp_path):
    rng = np.random.default_rng(3)
    from xmipp3_tpu.ops.monogenic import bandpass_3d
    signal = np.asarray(bandpass_3d(
        rng.standard_normal((32, 32, 32)).astype(np.float32), 0.0, 0.2))
    h1 = signal + 0.5 * rng.standard_normal(signal.shape).astype(np.float32)
    h2 = signal + 0.5 * rng.standard_normal(signal.shape).astype(np.float32)
    f1, f2 = str(tmp_path / "h1.vol"), str(tmp_path / "h2.vol")
    save_image(f1, h1)
    save_image(f2, h2)
    prog = run_prog(
        "volume_halves_restoration",
        f"--i1 {f1} --i2 {f2} --oroot {tmp_path}/rest "
        f"--filterBank 0.05 0.5 1 3 --difference 1 1.5")
    rest = prog.restored

    def c(a):
        return np.corrcoef(a.ravel(), signal.ravel())[0, 1]
    assert c(rest) > c(0.5 * (h1 + h2)) + 0.2   # real denoising gain
    assert c(rest) > 0.75
    import os
    assert os.path.exists(f"{tmp_path}/rest_filterBank.vol")
    assert os.path.exists(f"{tmp_path}/rest_avgDiff.vol")
    # deconvolution mode: sharper than the raw average, still correlated
    prog2 = run_prog(
        "volume_halves_restoration",
        f"--i1 {f1} --i2 {f2} --oroot {tmp_path}/dec "
        f"--denoising 2 --deconvolution 2 0.2 0.001")
    assert os.path.exists(f"{tmp_path}/dec_deconvolved.vol")
    assert os.path.exists(f"{tmp_path}/dec_convolved.vol")
    assert c(prog2.restored) > 0.3


def test_find_symmetry(tmp_path):
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - 16, y - 16, x - 16
    vol = np.zeros((n, n, n), np.float32)
    for k in range(3):  # c3 object
        a = 2 * np.pi * k / 3
        cx, cy = 7 * np.cos(a), 7 * np.sin(a)
        vol += np.exp(-((x - cx) ** 2 + (y - cy) ** 2 + z ** 2) / 4.0)
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    # reference semantics: --sym rot <n>, search the (rot, tilt) axis grid
    prog = run_prog("volume_find_symmetry",
                    f"-i {fn} --sym rot 3 --rot 0 90 45 --tilt 0 90 30 -v 0")
    assert prog.best_tilt == 0.0        # the c3 axis is the z axis
    assert prog.best_corr > 0.9
    # a wrong order scores lower on the same axis
    prog2 = run_prog("volume_find_symmetry",
                     f"-i {fn} --sym rot 4 --rot 0 0 5 --tilt 0 0 5 -v 0")
    assert prog2.best_corr < prog.best_corr - 0.05


def test_mpi_run(tmp_path):
    cmds = str(tmp_path / "cmds.txt")
    out1 = tmp_path / "a.txt"
    out2 = tmp_path / "b.txt"
    open(cmds, "w").write(f"echo hello > {out1}\necho world > {out2}\n")
    run_prog("run", f"-i {cmds} -j 2 -v 0")
    assert out1.read_text().strip() == "hello"
    assert out2.read_text().strip() == "world"
    # failing command -> nonzero rc
    open(cmds, "w").write("false\n")
    prog = get_program("run")
    assert prog.run_with_args(f"-i {cmds} -v 0") == 1


def test_tv_denoise(tmp_path):
    rng = np.random.default_rng(4)
    y, x = np.mgrid[0:48, 0:48].astype(np.float32)
    clean = ((x > 24).astype(np.float32) + ((y > 24) & (x < 12)))
    noisy = clean + 0.4 * rng.standard_normal((48, 48)).astype(np.float32)
    fn = str(tmp_path / "n.mrc")
    save_image(fn, noisy)
    out = str(tmp_path / "d.mrc")
    run_prog("denoising_tv", f"-i {fn} -o {out} --weight 0.3 --iter 60")
    den = np.squeeze(Image(out).data)
    assert np.abs(den - clean).mean() < np.abs(noisy - clean).mean() * 0.6


def test_wavelet_denoise_op():
    from xmipp3_tpu.ops.denoise import wavelet_denoise_2d
    rng = np.random.default_rng(5)
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    clean = np.sin(2 * np.pi * x / 32) * np.cos(2 * np.pi * y / 16)
    noisy = clean + 0.5 * rng.standard_normal((64, 64)).astype(np.float32)
    den = np.asarray(wavelet_denoise_2d(noisy))
    assert np.abs(den - clean).mean() < np.abs(noisy - clean).mean() * 0.8


def test_monodir(tmp_path):
    rng = np.random.default_rng(7)
    from xmipp3_tpu.ops.monogenic import bandpass_3d
    vol = np.asarray(bandpass_3d(
        rng.standard_normal((32, 32, 32)).astype(np.float32), 0.0, 0.35))
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    prog = run_prog("resolution_directional",
                    f"--vol {fn} --oroot {tmp_path}/md --ndirections 4 "
                    f"--steps 6 -v 0")
    rad = np.squeeze(Image(str(tmp_path / "md_radial.vol")).data)
    assert rad.shape == vol.shape
    assert prog.mean_resolution > 0


def test_arma_psd(tmp_path):
    rng = np.random.default_rng(8)
    # colored noise: lowpassed white noise -> AR spectrum must show the
    # concentration at low frequency
    from xmipp3_tpu.ops.fourier_filter import apply_fourier_mask_2d, low_pass_mask
    mic = np.asarray(apply_fourier_mask_2d(
        rng.standard_normal((512, 512)).astype(np.float32),
        low_pass_mask(512, 512, 0.15)))
    fn = str(tmp_path / "m.mrc")
    save_image(fn, mic)
    out = str(tmp_path / "psd.psd")
    run_prog("ctf_estimate_psd_with_arma",
             f"-i {fn} -o {out} --pieceDim 128 --N_horizontal 6 "
             f"--N_vertical 6")
    psd = np.squeeze(Image(out).data)
    n = psd.shape[0]
    c = n // 2
    center_power = psd[c - 8:c + 8, c - 8:c + 8].mean()
    edge_power = psd[:8, :8].mean()
    assert center_power > 5 * edge_power


def test_cl2d_core_analysis(tmp_path):
    """End-to-end reference pipeline: CL2D writes the level_%02d hierarchy
    with class blocks; core_analysis --computeCore removes PCA outliers
    per class, --computeStableCore intersects coocurrence across levels
    (mpi_classify_CL2D_core_analysis.cpp)."""
    import os
    rng = np.random.default_rng(9)
    # two clearly separated classes of 12 + one gross outlier each
    a = np.zeros((16, 16), np.float32)
    a[4:12, 4:8] = 1.0
    b = np.zeros((16, 16), np.float32)
    b[2:6, 2:14] = 1.0
    imgs = np.concatenate([
        a[None] + 0.05 * rng.standard_normal((12, 16, 16)),
        b[None] + 0.05 * rng.standard_normal((12, 16, 16)),
    ]).astype(np.float32)
    imgs[11] = rng.standard_normal((16, 16)) * 5   # outlier
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    run_prog("classify_CL2D",
             f"-i {fn} --odir {tmp_path} --oroot cl --nref 2 --nref0 1 "
             f"--iter 4 --classifyAllImages -v 0")
    assert os.path.exists(f"{tmp_path}/level_00/cl_classes.xmd")
    assert os.path.exists(f"{tmp_path}/level_01/cl_classes.xmd")
    blocks = MetaData.blocksInFile(f"{tmp_path}/level_01/cl_classes.xmd")
    assert "classes" in blocks and "class000001_images" in blocks

    prog = run_prog("classify_CL2D_core_analysis",
                    f"--root cl --dir {tmp_path} --computeCore 2.0 2 -v 0")
    fn_core = f"{tmp_path}/level_01/cl_classes_core.xmd"
    assert os.path.exists(fn_core)
    # the gross outlier must be removed from its core class
    kept = []
    for blk in MetaData.blocksInFile(fn_core):
        if blk.startswith("class") and blk.endswith("_images"):
            kept += [str(r["image"])
                     for r in MetaData(fn_core, block=blk).iterRows()]
    assert f"000012@{fn}" not in kept
    assert len(kept) >= 18

    prog2 = run_prog("classify_CL2D_core_analysis",
                     f"--root cl --dir {tmp_path} --computeStableCore 0 "
                     f"-v 0")
    fn_st = f"{tmp_path}/level_01/cl_classes_stable_core.xmd"
    assert os.path.exists(fn_st)
    assert prog2.n_core > 0


def test_monodir_full_surface(tmp_path):
    """Full reference flag surface (resolution_directional.cpp:64-83):
    all named output maps, thresholds/radialAvG/prefMin metadata, zScore."""
    rng = np.random.default_rng(9)
    from xmipp3_tpu.ops.monogenic import bandpass_3d
    vol = np.asarray(bandpass_3d(
        rng.standard_normal((32, 32, 32)).astype(np.float32), 0.0, 0.35))
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    mask = np.zeros((32, 32, 32), np.float32)
    mask[8:24, 8:24, 8:24] = 1
    fn_mask = str(tmp_path / "m.vol")
    save_image(fn_mask, mask)
    t = str(tmp_path)
    run_prog("resolution_directional",
             f"--vol {fn} --mask {fn_mask} -o {t}/mono.vol --fast "
             f"--ndirections 6 --steps 5 --sampling_rate 2 --resStep 2 "
             f"--significance 0.9 --volumeRadius 14 "
             f"--radialRes {t}/rad.vol --azimuthalRes {t}/azi.vol "
             f"--highestResolutionVol {t}/hi.vol "
             f"--lowestResolutionVol {t}/lo.vol "
             f"--doa1 {t}/doa1.vol --doa2 {t}/doa2.vol "
             f"--radialAzimuthalThresholds {t}/thr.xmd "
             f"--radialAvG {t}/avg.xmd --prefMin {t}/pref.xmd "
             f"--zScoremap {t}/z.vol -v 0")
    m = mask > 0.5
    hi = np.squeeze(Image(f"{t}/hi.vol").data)
    lo = np.squeeze(Image(f"{t}/lo.vol").data)
    doa1 = np.squeeze(Image(f"{t}/doa1.vol").data)
    doa2 = np.squeeze(Image(f"{t}/doa2.vol").data)
    # percentile ordering: highest (p05) <= lowest (p95); doa identities
    assert (hi[m] <= lo[m] + 1e-4).all()
    assert np.allclose(doa2[m], np.clip(doa2[m], hi[m] - 1e-4,
                                        lo[m] + 1e-4))
    assert (doa1[m] >= -1e-4).all()
    # resolutions live in [2*Ts, D*Ts]
    assert lo[m].max() <= 32 * 2 + 1e-3 and hi[m].min() >= 2 * 2 - 1e-3
    thr = MetaData(f"{t}/thr.xmd")
    assert thr.size() == 1 and float(thr.getColumn("resolutionFreq")[0]) > 0
    pref = MetaData(f"{t}/pref.xmd")
    assert pref.size() == 6
    assert float(np.asarray(pref.getColumn("weight"), float).sum()) > 0
    avg = MetaData(f"{t}/avg.xmd")
    assert avg.size() > 3 and avg.containsLabel("resolutionLocal")
    z = np.squeeze(Image(f"{t}/z.vol").data)
    assert np.isfinite(z).all()
