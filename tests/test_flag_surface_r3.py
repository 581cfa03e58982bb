"""Round-3 flag-surface additions: angular_discrete_assign extras
(angular_discrete_assign.cpp grammar), angular_projection_matching
--search5d_step/--sym, reconstruct_significant extras
(reconstruct_significant.cpp grammar)."""
import os

import numpy as np
import pytest

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.sampling import compute_sampling_points
from xmipp3_tpu.ops.project import FourierProjector
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    prog.read(["x"] + args.split())
    assert prog.tryRun() == 0, f"{name} failed"
    return prog


@pytest.fixture(scope="module")
def gal(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("gal"))
    rng = np.random.default_rng(3)
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = (np.exp(-((z - 2) ** 2 + y ** 2 + (x + 3) ** 2) / 10)
           + 0.8 * np.exp(-((z + 3) ** 2 + (y - 4) ** 2 + x ** 2) / 6)
           ).astype(np.float32)
    angles = compute_sampling_points(25.0)
    refs = np.asarray(FourierProjector(vol).project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        np.zeros(len(angles), np.float32)))
    Image(refs).write(d + "/gal.stk")
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{d}/gal.stk",
         "angleRot": float(angles[i, 0]),
         "angleTilt": float(angles[i, 1])}
        for i in range(len(refs))]).write(d + "/gal.doc")
    pick = rng.integers(0, len(refs), 8)
    imgs = refs[pick] + 0.05 * rng.standard_normal(
        (8, n, n)).astype(np.float32)
    Image(imgs).write(d + "/imgs.stk")
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{d}/imgs.stk", "itemId": i + 1,
         "angleRot": float(angles[pick[i], 0]),
         "angleTilt": float(angles[pick[i], 1]), "anglePsi": 0.0}
        for i in range(8)]).write(d + "/imgs.xmd")
    return dict(dir=d, vol=vol, angles=angles, refs=refs, imgs=imgs,
                pick=pick)


def test_discrete_assign_psi_and_mirror_flags(gal, tmp_path):
    d, angles, pick = gal["dir"], gal["angles"], gal["pick"]
    out = str(tmp_path / "o.xmd")
    run_prog("angular_discrete_assign",
             f"-i {d}/imgs.xmd -o {out} --ref {d}/gal.doc --max_shift 2 "
             f"--psi_step 10 --max_psi_change 15 --dont_check_mirrors "
             f"--shift_step 1 --keep 60 --pick 0 --smax 2 --search5D -v 0")
    md = MetaData(out)
    assert md.size() == 8
    # --max_psi_change 15: output psi stays within the window of psi0=0
    psi = np.asarray(md.getColumn("anglePsi"))
    d_psi = np.abs((psi + 180) % 360 - 180)
    assert (d_psi <= 15.0 + 1e-3).all()
    # --dont_check_mirrors: no flips reported
    assert not np.asarray(md.getColumn("flip")).any()


def test_discrete_assign_max_proj_change(gal, tmp_path):
    d, angles, pick = gal["dir"], gal["angles"], gal["pick"]
    out = str(tmp_path / "o2.xmd")
    run_prog("angular_discrete_assign",
             f"-i {d}/imgs.xmd -o {out} --ref {d}/gal.doc --max_shift 2 "
             f"--max_proj_change 26 --sym c1 -v 0")
    md = MetaData(out)
    A = np.asarray(euler_matrix(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        np.zeros(len(angles), np.float32)))
    dirs = A[:, 2, :]
    for i, r in enumerate(md.iterRows()):
        k = int(r["ref"]) - 1
        cosd = abs(float(dirs[k] @ dirs[pick[i]]))
        err = np.degrees(np.arccos(min(cosd, 1.0)))
        # candidates restricted to within 26 deg of the previous pose
        assert err <= 26.0 + 1e-3


def test_projection_matching_search5d_step(gal, tmp_path):
    d = gal["dir"]
    out = str(tmp_path / "pm.xmd")
    run_prog("angular_projection_matching",
             f"-i {d}/imgs.xmd -o {out} -r {d}/gal.doc --max_shift 3 "
             f"--search5d_step 1 -v 0")
    assert MetaData(out).size() == 8


def test_reconstruct_significant_validation_mode(gal, tmp_path):
    d = gal["dir"]
    fn_vol = str(tmp_path / "v.vol")
    Image(gal["vol"]).write(fn_vol)
    run_prog("reconstruct_significant",
             f"-i {d}/imgs.xmd --odir {tmp_path} --initvolumes {fn_vol} "
             f"--angularSampling 25 --useForValidation 3 -v 0")
    md = MetaData(str(tmp_path / "angles_validation.xmd"))
    assert md.size() == 8 * 3   # n best orientations per particle


def test_reconstruct_significant_dont_reconstruct(gal, tmp_path):
    import os
    d = gal["dir"]
    fn_vol = str(tmp_path / "v.vol")
    Image(gal["vol"]).write(fn_vol)
    run_prog("reconstruct_significant",
             f"-i {d}/imgs.xmd --odir {tmp_path} --initvolumes {fn_vol} "
             f"--angularSampling 25 --iter 2 --dontReconstruct "
             f"--maxShift 2 --alpha0 0.5 --alphaF 0.5 -v 0")
    md = MetaData(str(tmp_path / "significant_images.xmd"))
    assert md.size() == 8
    assert not os.path.exists(str(tmp_path / "significant_volume.vol"))
    # with a perfect init volume the assignments recover the picks
    angles, pick = gal["angles"], gal["pick"]
    A = np.asarray(euler_matrix(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        np.zeros(len(angles), np.float32)))
    dirs = A[:, 2, :]
    errs = []
    for i, r in enumerate(md.iterRows()):
        Ae = np.asarray(euler_matrix(
            np.array([float(r["angleRot"])], np.float32),
            np.array([float(r["angleTilt"])], np.float32),
            np.zeros(1, np.float32)))[0]
        cosd = abs(float(Ae[2] @ dirs[pick[i]]))
        errs.append(np.degrees(np.arccos(min(cosd, 1.0))))
    assert np.median(errs) <= 25.0


@pytest.mark.slow
def test_reconstruct_significant_two_volumes(gal, tmp_path):
    import os
    d = gal["dir"]
    run_prog("reconstruct_significant",
             f"-i {d}/imgs.xmd --odir {tmp_path} --numberOfVolumes 2 "
             f"--angularSampling 25 --iter 2 --maxShift 2 "
             f"--keepIntermediateVolumes -v 0")
    assert os.path.exists(str(tmp_path / "significant_volume_01.vol"))
    assert os.path.exists(str(tmp_path / "significant_volume_02.vol"))
    assert os.path.exists(str(tmp_path / "angles_iter001.xmd"))
    md = MetaData(str(tmp_path / "significant_images.xmd"))
    assert set(md.getColumnValues("ref3d")) <= {1, 2}


def test_resolution_fsc_full_surface(tmp_path):
    """resolution_fsc reference surface (resolution_fsc.cpp:59-210):
    --set_of_images half-split mode, --do_dpr, --max_sam zeroing, rfactor@
    appended block, writeFiles column set."""
    rng = np.random.default_rng(5)
    n, m = 12, 16
    base = rng.standard_normal((m, n)).astype(np.float32)
    imgs = base[None] + 0.1 * rng.standard_normal((6, m, n)).astype(np.float32)
    d = str(tmp_path)
    Image(imgs).write(d + "/set.stk")
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{d}/set.stk", "itemId": i + 1}
        for i in range(6)]).write(d + "/set.xmd")
    run_prog("resolution_fsc",
             f"--set_of_images {d}/set.xmd --oroot {d}/half -s 2.0 --do_dpr")
    md = MetaData(d + "/half.frc")
    for col in ("resolutionFreq", "resolutionFRC", "resolutionDPR",
                "resolutionErrorL2", "resolutionFRCRandomNoise",
                "resolutionFreqReal"):
        assert md.containsLabel(col), col
    frc = md.getColumn("resolutionFRC")
    assert md.size() == n // 2          # shells i=1..X/2
    assert frc[0] > 0.9                 # halves agree at low freq

    # volume pair: rfactor block + max_sam band kill
    vol = rng.standard_normal((n, n, n)).astype(np.float32)
    Image(vol).write(d + "/v1.vol")
    Image((vol + 0.05 * rng.standard_normal(vol.shape))
          .astype(np.float32)).write(d + "/v2.vol")
    run_prog("resolution_fsc",
             f"--ref {d}/v1.vol -i {d}/v2.vol -o {d}/v.frc -s 1.0 "
             f"--do_rfactor --max_sam 4.0")
    md = MetaData(d + "/v.frc")
    freq_real = md.getColumn("resolutionFreqReal")
    frc = md.getColumn("resolutionFRC")
    assert np.all(frc[freq_real < 4.0] == 0.0)
    md_r = MetaData(f"rfactor@{d}/v.frc")
    assert md_r.size() == 1
    assert 0.0 <= md_r.getColumn("resolutionRfactor")[0] <= 1.0


def test_project_library_full_surface(gal, tmp_path):
    """angular_project_library extras (angular_project_library.cpp:100-146):
    --psi_sampling in-plane ladder, --perturb, --experimental_images +
    --closer_sampling_points/--near_exp_data/--only_winner, --groups
    per-block outputs, --sym_neigh."""
    d = gal["dir"]
    root = str(tmp_path / "lib")
    fn_vol = str(tmp_path / "vol.vol")
    Image(gal["vol"]).write(fn_vol)
    # two-block groups file + experimental images with prior angles
    fn_groups = str(tmp_path / "groups.xmd")
    MetaData.fromRows([{"image": f"{i + 1:06d}@{d}/imgs.stk",
                        "itemId": i + 1} for i in range(4)]
                      ).write(fn_groups, block="group000001")
    MetaData.fromRows([{"image": f"{i + 5:06d}@{d}/imgs.stk",
                        "itemId": i + 5} for i in range(4)]
                      ).write(fn_groups, block="group000002", append=True)
    run_prog("angular_project_library",
             f"-i {fn_vol} -o {root} --sampling_rate 25 --sym c1 "
             f"--sym_neigh c1 --psi_sampling 90 --perturb 0.01 "
             f"--experimental_images {d}/imgs.xmd --angular_distance 40 "
             f"--compute_neighbors --closer_sampling_points --only_winner "
             f"--groups {fn_groups}")
    md = MetaData(root + ".doc")
    psis = sorted(set(md.getColumnValues("anglePsi")))
    assert psis == [0.0, 90.0, 180.0, 270.0]      # psi ladder
    n_dirs = md.size() // 4
    assert md.size() == 4 * n_dirs
    # closest sampling point per experimental image
    md_c = MetaData(root + "_closest_sampling_points.xmd")
    assert md_c.size() == 8
    assert all(1 <= r <= n_dirs for r in md_c.getColumnValues("ref"))
    assert all(c > 0.8 for c in md_c.getColumnValues("maxCC"))
    # only_winner: exactly one neighbor per experimental image
    md_n = MetaData(root + "_neighbors.xmd")
    assert md_n.size() == 8
    assert set(md_n.getColumnValues("neighborCount")) == {1}
    # per-group outputs
    for g in (1, 2):
        assert MetaData(
            f"{root}_group{g:06d}_neighbors.xmd").size() == 4
        assert MetaData(
            f"{root}_group{g:06d}_closest_sampling_points.xmd").size() == 4


def test_project_library_near_exp_data_filters(gal, tmp_path):
    d = gal["dir"]
    root = str(tmp_path / "near")
    fn_vol = str(tmp_path / "vol.vol")
    Image(gal["vol"]).write(fn_vol)
    # experimental data clustered at one direction -> gallery shrinks
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{d}/imgs.stk", "itemId": i + 1,
         "angleRot": 0.0, "angleTilt": 0.0} for i in range(3)]
    ).write(str(tmp_path / "exp0.xmd"))
    run_prog("angular_project_library",
             f"-i {fn_vol} -o {root} --sampling_rate 20 --sym c1 "
             f"--experimental_images {tmp_path}/exp0.xmd "
             f"--angular_distance 25 --near_exp_data")
    md = MetaData(root + ".doc")
    full = MetaData(f"{d}/gal.doc")
    assert 0 < md.size() < 30                      # filtered to the cap
    tilts = md.getColumnValues("angleTilt")
    assert max(tilts) <= 25.0 + 1e-6


def test_movie_alignment_flag_surface(tmp_path):
    """movie_alignment_correlation extras (movie_alignment_correlation_
    base.cpp:39-52,121-149): --bin, --frameRange/--frameRangeSum,
    --maxResForCorrelation, --minLocalRes grammar, sum-outside-align
    rejection."""
    from xmipp3_tpu.ops.movie import shift_sum_frames_keep
    rng = np.random.default_rng(7)
    base = rng.standard_normal((128, 128)).astype(np.float32)
    from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                               band_pass_mask)
    base = np.asarray(apply_fourier_mask_2d(
        base, band_pass_mask(128, 128, 0.02, 0.3)))
    true = np.array([[0, 0], [1.5, -1.0], [3.0, -2.0], [4.5, -3.0],
                     [6.0, -4.0], [7.5, -5.0]], np.float32)
    frames = np.asarray(shift_sum_frames_keep(
        np.repeat(base[None], 6, 0).astype(np.float32),
        true[:, 0], true[:, 1])).astype(np.float32)
    d = str(tmp_path)
    Image(frames).write(d + "/movie.mrcs")
    run_prog("movie_alignment_correlation",
             f"-i {d}/movie.mrcs -o {d}/shifts.xmd --sampling 1.0 "
             f"--maxShift 12 --skipLocalAlignment --frameRange 1 4 "
             f"--frameRangeSum 2 3 --bin 2 --maxResForCorrelation 5 "
             f"--minLocalRes 400 --oavg {d}/avg.mrc")
    md = MetaData(d + "/shifts.xmd")
    assert md.size() == 4                      # frames 1..4 aligned
    assert md.getColumnValues("itemId") == [2, 3, 4, 5]
    avg = np.squeeze(Image(d + "/avg.mrc").data)
    assert avg.shape == (64, 64)               # binned output
    # relative shifts between aligned frames recovered at binned scale
    sx = np.array(md.getColumn("shiftX"))
    rel = sx - sx[0]
    expect = (true[1:5, 0] - true[1, 0]) / 2.0
    assert np.all(np.abs(rel - expect) < 0.6)
    # sum range outside align range must be rejected
    prog = get_program("movie_alignment_correlation")
    prog.read(["x"] + (f"-i {d}/movie.mrcs -o {d}/bad.xmd "
                       f"--frameRange 1 4 --frameRangeSum 0 3").split())
    assert prog.tryRun() != 0


def test_cl2d_full_surface(gal, tmp_path):
    """classify_CL2D extras (mpi_classify_CL2D.cpp:1727-1755): nref0/ref0,
    correntropy|correlation distance, classical gates, minsize,
    dontNormalizeImages, useThresholdMask, dontAlign, classifyAllImages."""
    d = gal["dir"]
    o = str(tmp_path)
    rng = np.random.default_rng(11)
    refs = gal["refs"][:2]
    imgs = np.concatenate([
        refs[0][None] + 0.1 * rng.standard_normal((10,) + refs[0].shape),
        refs[1][None] + 0.1 * rng.standard_normal((10,) + refs[1].shape),
    ]).astype(np.float32)
    Image(imgs).write(o + "/parts.stk")
    Image(refs.astype(np.float32)).write(o + "/ref0.stk")
    run_prog("classify_CL2D",
             f"-i {o}/parts.stk --odir {o} --oroot cla --nref 2 "
             f"--ref0 {o}/ref0.stk --iter 4 --distance correntropy "
             f"--minsize 10 --maxSplitTrials 2 --neigh 2 "
             f"--useThresholdMask -10 --maxShift 4")
    md = MetaData(o + "/cla_images.xmd")
    assert md.size() == 20
    a = np.array(md.getColumnValues("ref"))
    # the two planted clusters separate
    assert len(set(a[:10])) == 1 and len(set(a[10:])) == 1
    assert a[0] != a[10]
    # default leaves an enabled column (low-confidence marking)
    assert md.containsLabel("enabled")
    # classical correlation mode + classifyAllImages + dontAlign
    run_prog("classify_CL2D",
             f"-i {o}/parts.stk --odir {o} --oroot clb --nref 2 --nref0 2 "
             f"--iter 3 --distance correlation --classicalMultiref "
             f"--classifyAllImages --dontNormalizeImages --dontAlign "
             f"--dontMirrorImages --maxShift 4")
    md2 = MetaData(o + "/clb_images.xmd")
    assert md2.size() == 20
    # classifyAllImages: nothing marked disabled
    assert not md2.containsLabel("enabled") or \
        set(md2.getColumnValues("enabled")) == {1}
    assert set(md2.getColumnValues("ref")) <= {1, 2}


def test_analyze_cluster_full_surface(gal, tmp_path):
    """classify_analyze_cluster (analyze_cluster.cpp:30-45): optional --ref,
    --NPCA/--iter EM-PCA, --basis stack, --dontMask, --maxDist -1."""
    d = gal["dir"]
    o = str(tmp_path)
    rng = np.random.default_rng(13)
    ref = gal["refs"][0]
    members = (ref[None] + 0.05 * rng.standard_normal((12,) + ref.shape)
               ).astype(np.float32)
    members[-1] += 5.0 * rng.standard_normal(ref.shape).astype(np.float32)
    Image(members).write(o + "/memb.stk")
    Image(ref.astype(np.float32)).write(o + "/rep.xmp")
    MetaData.fromRows([{"image": f"{i + 1:06d}@{o}/memb.stk",
                        "itemId": i + 1} for i in range(12)]
                      ).write(o + "/memb.xmd")
    run_prog("classify_analyze_cluster",
             f"-i {o}/memb.xmd -o {o}/scored.xmd --ref {o}/rep.xmp "
             f"--NPCA 3 --iter 5 --basis {o}/basis.stk --maxDist 3")
    md = MetaData(o + "/scored.xmd")
    assert md.size() == 12
    z = np.array(md.getColumnValues("zScore"))
    assert np.argmax(z) == 11                  # planted outlier
    basis = Image(o + "/basis.stk").data
    assert basis.shape[0] == 2 + 3             # avg, std, 3 PCA images
    # --dontMask + maxDist -1 keeps everything enabled
    run_prog("classify_analyze_cluster",
             f"-i {o}/memb.xmd -o {o}/s2.xmd --dontMask --maxDist -1")
    md2 = MetaData(o + "/s2.xmd")
    assert set(md2.getColumnValues("enabled")) == {1}


def test_reconstruct_art_full_surface(gal, tmp_path):
    """reconstruct_art extras (basic_art.cpp defineParams): start volume,
    max_tilt filter, sym expansion, WLS + kappa, sort_last orthogonal
    ordering, POCS known_volume/sparse/diffusion, -R sphere, ext padding,
    output_size, stop_at, save_intermediate, noisy/variability outputs."""
    d = gal["dir"]
    o = str(tmp_path)
    angles = gal["angles"]
    refs = gal["refs"]
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{d}/gal.stk",
         "angleRot": float(angles[i, 0]), "angleTilt": float(angles[i, 1]),
         "anglePsi": 0.0, "itemId": i + 1}
        for i in range(len(refs))]).write(o + "/proj.xmd")
    run_prog("reconstruct_art",
             f"-i {o}/proj.xmd -o {o}/a.vol -n 2 -l 0.2 --WLS -k 0.7 "
             f"--sort_last 3 --POCS_positivity -R 14 --sparse 0.001 "
             f"--known_volume 20000 --max_tilt 170 --ext 2 "
             f"--output_size 32 32 32 --sampling_rate 1.5 "
             f"--save_intermediate --stop_at 500 --show_error "
             f"--dont_apply_shifts")
    vol = np.squeeze(Image(o + "/a.vol").data)
    assert vol.shape == (32, 32, 32)
    assert vol.min() >= 0.0                       # positivity POCS
    # interest sphere: corners are zero
    assert vol[0, 0, 0] == 0.0
    assert os.path.exists(o + "/ait0.vol")        # intermediate save
    # correlation against the true volume survives all the constraints
    truev = gal["vol"]
    c = np.corrcoef(vol.ravel(), truev.ravel())[0, 1]
    assert c > 0.5
    # symmetry expansion + equation-mode mapping + noisy/variability
    run_prog("reconstruct_art",
             f"-i {o}/proj.xmd -o {o}/b.vol -n 1 -l 0.3 --sym c2 "
             f"--equation_mode CAV --noisy_reconstruction --variability "
             f"--no_sort --goldmask -100")
    assert os.path.exists(o + "/b_noise.vol")
    assert os.path.exists(o + "/b_noise_proj.sel")
    assert os.path.exists(o + "/b_signal_proj.sel")
    assert os.path.exists(o + "/b_variability.vol")
    var = np.squeeze(Image(o + "/b_variability.vol").data)
    assert var.min() >= 0.0
    # start volume + refine path runs
    run_prog("reconstruct_art",
             f"-i {o}/proj.xmd -o {o}/c.vol -n 1 -l 0.2 --start {o}/a.vol "
             f"--refine --ref_trans_step 2 --shiftedTomograms "
             f"--parallel_mode pSART --block_size 8")
    assert os.path.exists(o + "/c.vol")
