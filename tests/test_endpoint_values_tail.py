"""Round-3 tail sweep: value assertions for the last endpoints that had no
direct test (only the registry --help run). Same bar as
test_endpoint_values_r3 — planted-structure recovery / value equality, the
reference's regression style (reference tests/test.py:174-200)."""
import contextlib
import io

import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.ctf import CTFDescription
from xmipp3_tpu.programs import get_program


def run_prog(name, args, rc_ok=(0,)):
    prog = get_program(name)
    prog.read(["x"] + args.split())
    assert prog.tryRun() in rc_ok, f"{name} failed"
    return prog


@pytest.fixture(scope="module")
def blobs(tmp_path_factory):
    """Two distinct 32x32 shapes + noisy copies (8 each, interleaved)."""
    d = str(tmp_path_factory.mktemp("blobs"))
    n = 32
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
    a = np.exp(-((y - 4) ** 2 + x ** 2) / 12).astype(np.float32)
    b = (np.exp(-(y ** 2 + (x - 5) ** 2) / 6)
         + np.exp(-(y ** 2 + (x + 5) ** 2) / 6)).astype(np.float32)
    rng = np.random.default_rng(3)
    imgs = np.stack([(a if i % 2 == 0 else b)
                     + 0.08 * rng.standard_normal((n, n)).astype(np.float32)
                     for i in range(16)])
    save_image(d + "/two.stk", imgs)
    MetaData.fromRows([{"image": f"{i + 1:06d}@{d}/two.stk", "itemId": i + 1}
                       for i in range(16)]).write(d + "/two.xmd")
    return dict(dir=d, imgs=imgs, a=a, b=b, n=n)


# ---------------------------------------------------------------------------
# image / metadata utilities
# ---------------------------------------------------------------------------

def test_image_convert_roundtrips_values(blobs, tmp_path):
    out = str(tmp_path / "conv.mrcs")
    run_prog("image_convert", f"-i {blobs['dir']}/two.stk -o {out}")
    back = np.squeeze(Image(out).data)
    assert np.allclose(back, blobs["imgs"], atol=1e-4)


def test_image_find_center_recovers_planted_offset(tmp_path):
    n = 64
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
    dy, dx = 3.0, -2.0
    ring = np.exp(-((np.hypot(y - dy, x - dx) - 9.0) ** 2) / 4.0)
    fn = str(tmp_path / "ring.spi")
    save_image(fn, ring.astype(np.float32))
    prog = run_prog("image_find_center", f"-i {fn} --oroot {tmp_path}/c")
    cx, cy = prog.centers[0]
    # absolute center = image center + planted offset (half-pixel tol)
    assert np.hypot(cx - (n / 2 + dx), cy - (n / 2 + dy)) < 0.75
    md = MetaData(str(tmp_path / "c_center.xmd"))
    assert md.size() == 1


def test_image_header_prints_true_dimensions(blobs):
    prog = get_program("image_header")
    prog.read(["x", "-i", blobs["dir"] + "/two.stk"])
    buf = io.StringIO()
    with contextlib.redirect_stdout(buf):
        assert prog.tryRun() == 0
    text = buf.getvalue()
    assert "16 x 1 x 32 x 32" in text


def test_image_histogram_counts_are_exact(tmp_path):
    img = np.zeros((16, 16), np.float32)
    img[:8] = 1.0  # exactly half the pixels at 1
    fn = str(tmp_path / "h.spi")
    save_image(fn, img)
    prog = run_prog("image_histogram",
                    f"-i {fn} --steps 2 --range -0.5 1.5 -v 0")
    counts = [r["count"] for r in prog.mdOut.iterRows()]
    assert counts == [128, 128]


def test_metadata_histogram_counts_are_exact(tmp_path):
    MetaData.fromRows([{"anglePsi": float(v), "itemId": i + 1}
                       for i, v in enumerate(range(10))]
                      ).write(str(tmp_path / "m.xmd"))
    out = str(tmp_path / "h.xmd")
    run_prog("metadata_histogram",
             f"-i {tmp_path}/m.xmd --col anglePsi --steps 2 "
             f"--range 0 10 -o {out}")
    md = MetaData(out)
    counts = md.getColumnValues("count")
    assert sorted(int(c) for c in counts) == [5, 5]
    assert sum(int(c) for c in counts) == 10


def test_image_ssnr_ranks_signal_above_noise(tmp_path):
    n = 64
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - n // 2
    rng = np.random.default_rng(0)
    # signal concentrated INSIDE the default mask radius (R = n/2 - Rwidth):
    # the reference metric is in-mask vs out-of-mask spectra, so a
    # full-field pattern would leak into the "noise" estimate
    clean = (np.cos(2 * np.pi * 6 * x / n)
             * np.exp(-(x ** 2 + y ** 2) / (2 * 10.0 ** 2)))
    sig = (clean + 0.05 * rng.standard_normal((n, n))).astype(np.float32)
    noise = rng.standard_normal((n, n)).astype(np.float32)
    save_image(str(tmp_path / "s.stk"), np.stack([sig, noise]))
    out = str(tmp_path / "ssnr.xmd")
    prog = run_prog("image_ssnr", f"-i {tmp_path}/s.stk -o {out}")
    # dB scale: signal image must clear the pure-noise image's mask-area
    # bias (~10*log10(areaS/areaN) ~ 2.6 dB) by a wide margin
    assert prog.ssnr[0] > prog.ssnr[1] + 5.0
    md = MetaData(out)
    assert md.size() == 2 and "cumulativeSSNR" in md.getActiveLabels()


def test_volume_structure_factor_gaussian_falls_off(tmp_path):
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = np.exp(-(z ** 2 + y ** 2 + x ** 2) / 18).astype(np.float32)
    save_image(str(tmp_path / "g.vol"), vol)
    out = str(tmp_path / "sf.xmd")
    run_prog("volume_structure_factor",
             f"-i {tmp_path}/g.vol -o {out} --sampling 1.5")
    md = MetaData(out)
    sf = np.asarray([float(v) for v in
                     md.getColumnValues("resolutionLogStructure")]
                    if "resolutionLogStructure" in md.getActiveLabels()
                    else [float(v) for v in md.getColumnValues(
                        md.getActiveLabels()[1])])
    # Gaussian FT is monotone decreasing: first bin strongest
    assert sf[0] == max(sf)
    assert sf[0] > sf[len(sf) // 2] > sf[-1]


def test_angular_rotate_inverse_composition_is_identity(tmp_path):
    from xmipp3_tpu.core.geometry import euler_matrix
    rows = [{"angleRot": 10.0 * i, "angleTilt": 15.0 + 10.0 * i,
             "anglePsi": 5.0 * i, "itemId": i + 1} for i in range(5)]
    MetaData.fromRows(rows).write(str(tmp_path / "a.xmd"))
    run_prog("angular_rotate", f"-i {tmp_path}/a.xmd -o {tmp_path}/b.xmd "
             f"--rotate 30 40 50")
    run_prog("angular_rotate", f"-i {tmp_path}/b.xmd -o {tmp_path}/c.xmd "
             f"--rotate -50 -40 -30")
    md = MetaData(str(tmp_path / "c.xmd"))
    for r0, r1 in zip(rows, md.iterRows()):
        A0 = np.asarray(euler_matrix(
            np.float32(r0["angleRot"]), np.float32(r0["angleTilt"]),
            np.float32(r0["anglePsi"])))
        A1 = np.asarray(euler_matrix(
            np.float32(r1["angleRot"]), np.float32(r1["angleTilt"]),
            np.float32(r1["anglePsi"])))
        assert np.allclose(A0, A1, atol=1e-4)


def test_transform_downsample_preserves_low_freq_tone(tmp_path):
    n = 32
    i = np.arange(n, dtype=np.float32)
    tone = np.cos(2 * np.pi * 3 * i / n)[None, :] * np.ones((n, 1),
                                                            np.float32)
    save_image(str(tmp_path / "t.spi"), tone)
    out = str(tmp_path / "d.spi")
    run_prog("transform_downsample", f"-i {tmp_path}/t.spi -o {out} --step 2")
    small = np.squeeze(Image(out).data)
    assert small.shape == (16, 16)
    j = np.arange(16, dtype=np.float32)
    expected = np.cos(2 * np.pi * 3 * j / 16)[None, :] * np.ones(
        (16, 1), np.float32)
    assert np.allclose(small, expected, atol=1e-3)


def test_transform_randomize_phases_keeps_low_kills_high(tmp_path):
    rng = np.random.default_rng(5)
    n = 64
    img = rng.standard_normal((n, n)).astype(np.float32)
    save_image(str(tmp_path / "r.spi"), img)
    out = str(tmp_path / "p.spi")
    run_prog("transform_randomize_phases",
             f"-i {tmp_path}/r.spi -o {out} --freq 0.2")
    got = np.squeeze(Image(out).data)
    F0, F1 = np.fft.rfft2(img), np.fft.rfft2(got)
    fy = np.fft.fftfreq(n)[:, None]
    fx = np.fft.rfftfreq(n)[None, :]
    r = np.hypot(fy, fx)
    lo, hi = r < 0.15, r > 0.25
    # low frequencies untouched
    assert np.allclose(F0[lo], F1[lo], atol=1e-2)
    # high-frequency POWER preserved (per-pixel amplitudes can shift at the
    # self-conjugate rfft columns where Hermitian symmetry is re-imposed),
    # phases scrambled
    p0, p1 = (np.abs(F0[hi]) ** 2).sum(), (np.abs(F1[hi]) ** 2).sum()
    assert p1 == pytest.approx(p0, rel=0.02)
    ph = np.vdot(F0[hi], F1[hi]) / max(np.linalg.norm(F0[hi]) *
                                       np.linalg.norm(F1[hi]), 1e-12)
    assert abs(ph) < 0.2


# ---------------------------------------------------------------------------
# CTF family
# ---------------------------------------------------------------------------

def test_ctf_sort_psds_criteria_match_analytic_model(tmp_path):
    ctf = CTFDescription(sampling_rate=1.5, voltage=300, Cs=2.7, Q0=0.07,
                         defocusU=18000, defocusV=12000,
                         azimuthal_angle=30.0, K=1.0)
    fn_ctf = str(tmp_path / "m.ctfparam")
    ctf.write(fn_ctf)
    MetaData.fromRows([{"image": "dummy", "ctfModel": fn_ctf,
                        "itemId": 1}]).write(str(tmp_path / "in.xmd"))
    out = str(tmp_path / "out.xmd")
    run_prog("ctf_sort_psds", f"-i {tmp_path}/in.xmd -o {out}")
    row = next(iter(MetaData(out).iterRows()))
    assert float(row["ctfCritFirstZero"]) == pytest.approx(
        ctf.first_zero_freq(), rel=1e-3)
    assert float(row["ctfCritFirstZeroRatio"]) == pytest.approx(1.5, rel=1e-6)
    assert float(row["ctfCritFirstZeroDisagreement"]) > 0  # astigmatic


def test_ctf_enhance_psd_is_bandlimited(tmp_path):
    ctf = CTFDescription(sampling_rate=1.0, voltage=300, Cs=2.7, Q0=0.07,
                         defocusU=15000, defocusV=15000, K=1.0)
    n = 128
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None]
    fx = np.fft.fftfreq(n).astype(np.float32)[None, :]
    c = np.asarray(ctf.pure_at(np.hypot(fy, fx).ravel(),
                               np.zeros(n * n, np.float32))).reshape(n, n)
    psd = np.fft.fftshift(c ** 2).astype(np.float32)
    save_image(str(tmp_path / "psd.spi"), psd)
    out = str(tmp_path / "enh.spi")
    run_prog("ctf_enhance_psd",
             f"-i {tmp_path}/psd.spi -o {out} --f1 0.05 --f2 0.2")
    enh = np.squeeze(Image(out).data)
    assert np.isfinite(enh).all()
    E = np.abs(np.fft.fft2(enh)) ** 2
    r = np.hypot(np.fft.fftfreq(n)[:, None], np.fft.fftfreq(n)[None, :])
    in_band = E[(r >= 0.04) & (r <= 0.22)].sum()
    out_band = E[r > 0.35].sum()
    assert in_band > 20 * out_band


@pytest.mark.slow
def test_ctf_estimate_from_psd_fast_recovers_defocus(tmp_path):
    true = CTFDescription(sampling_rate=1.5, voltage=300, Cs=2.7, Q0=0.07,
                          defocusU=16000, defocusV=16000, K=1.0)
    n = 256
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / 1.5
    fx = np.fft.fftfreq(n).astype(np.float32)[None, :] / 1.5
    c = np.asarray(true.pure_at(np.hypot(fy, fx).ravel(),
                                np.zeros(n * n, np.float32))).reshape(n, n)
    psd = np.fft.fftshift(c ** 2 + 0.05).astype(np.float32)
    save_image(str(tmp_path / "psd.spi"), psd)
    out = str(tmp_path / "f.ctfparam")
    run_prog("ctf_estimate_from_psd_fast",
             f"--psd {tmp_path}/psd.spi -o {out} --sampling_rate 1.5 "
             f"--voltage 300 --spherical_aberration 2.7 --Q0 0.07 "
             f"--defocusU 14000 --defocus_range 6000 -v 0")
    got = CTFDescription.from_metadata(out)
    assert got.defocusU == pytest.approx(16000, rel=0.05)


# ---------------------------------------------------------------------------
# classification / alignment engines
# ---------------------------------------------------------------------------

def test_classify_kerdensom_separates_two_clusters(tmp_path):
    rng = np.random.default_rng(7)
    ca = rng.normal(0.0, 0.1, (10, 6)) + np.array([3, 0, 0, 0, 0, 0])
    cb = rng.normal(0.0, 0.1, (10, 6)) + np.array([0, 0, 0, 3, 0, 0])
    X = np.concatenate([ca, cb]).astype(np.float64)
    MetaData.fromRows([
        {"itemId": i + 1, "classificationData": X[i]}
        for i in range(20)]).write(str(tmp_path / "v.xmd"))
    run_prog("classify_kerdensom",
             f"-i {tmp_path}/v.xmd --oroot {tmp_path}/som --xdim 2 --ydim 1 "
             f"--iter 60 --reg0 5 --regF 0.05 -v 0")
    md = MetaData(str(tmp_path / "som_images.xmd"))
    ref = np.asarray([int(r["ref"]) for r in md.iterRows()])
    assert set(ref) == {1, 2}
    # each planted cluster maps to one SOM node
    assert len(set(ref[:10])) == 1 and len(set(ref[10:])) == 1
    assert ref[0] != ref[10]
    code = np.load(str(tmp_path / "som_codebook.npy"))
    assert code.shape[-1] == 6
    # deterministic-annealing mode + HEXA topology + --norm still separates
    run_prog("classify_kerdensom",
             f"-i {tmp_path}/v.xmd --oroot {tmp_path}/da --xdim 2 --ydim 1 "
             f"--iter 40 --deterministic_annealing 5 5 0.05 --eps 1e-9 "
             f"--topology HEXA --norm -v 0")
    md = MetaData(str(tmp_path / "da_images.xmd"))
    ref = np.asarray([int(r["ref"]) for r in md.iterRows()])
    assert len(set(ref[:10])) == 1 and len(set(ref[10:])) == 1
    assert ref[0] != ref[10]


@pytest.mark.slow
def test_mlf_align2d_separates_two_shapes(blobs, tmp_path):
    run_prog("mlf_align2d",
             f"-i {blobs['dir']}/two.xmd --nref 2 --iter 6 "
             f"--oroot {tmp_path}/mlf --maxShift 2 --no_ctf -v 0")
    md = MetaData(str(tmp_path / "mlf_images.xmd"))
    ref = np.asarray([int(r["ref"]) for r in md.iterRows()])
    even, odd = ref[0::2], ref[1::2]
    # majority purity: the two planted shapes land in different classes
    ma = np.bincount(even).argmax()
    mb = np.bincount(odd).argmax()
    assert ma != mb
    assert (even == ma).mean() >= 0.75
    assert (odd == mb).mean() >= 0.75


@pytest.mark.slow
def test_angular_assignment_mag_recovers_orientation(tmp_path):
    from xmipp3_tpu.core.geometry import euler_matrix
    from xmipp3_tpu.core.sampling import compute_sampling_points
    from xmipp3_tpu.ops.project import FourierProjector
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = (np.exp(-((z - 2) ** 2 + y ** 2 + (x + 3) ** 2) / 10)
           + 0.7 * np.exp(-((z + 3) ** 2 + (y - 4) ** 2 + x ** 2) / 6)
           ).astype(np.float32)
    angles = compute_sampling_points(20.0)
    proj = FourierProjector(vol)
    refs = np.asarray(proj.project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        np.zeros(len(angles), np.float32)))
    save_image(str(tmp_path / "gal.stk"), refs)
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{tmp_path}/gal.stk",
         "angleRot": float(angles[i, 0]), "angleTilt": float(angles[i, 1]),
         "anglePsi": 0.0, "itemId": i + 1}
        for i in range(len(refs))]).write(str(tmp_path / "gal.doc"))
    rng = np.random.default_rng(11)
    pick = rng.integers(0, len(refs), 6)
    parts = (refs[pick] + 0.05 * rng.standard_normal((6, n, n))
             ).astype(np.float32)
    save_image(str(tmp_path / "p.stk"), parts)
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{tmp_path}/p.stk", "itemId": i + 1}
        for i in range(6)]).write(str(tmp_path / "p.xmd"))
    run_prog("angular_assignment_mag",
             f"-i {tmp_path}/p.xmd -o {tmp_path}/o.xmd "
             f"--ref {tmp_path}/gal.doc --max_shift 2 -v 0")
    md = MetaData(str(tmp_path / "o.xmd"))
    ok = 0
    for i, r in enumerate(md.iterRows()):
        At = np.asarray(euler_matrix(
            np.float32(angles[pick[i], 0]), np.float32(angles[pick[i], 1]),
            np.float32(0.0)))
        Ag = np.asarray(euler_matrix(
            np.float32(r["angleRot"]), np.float32(r["angleTilt"]),
            np.float32(0.0)))
        cosang = np.clip(abs(np.dot(At[2], Ag[2])), -1, 1)
        if np.degrees(np.arccos(cosang)) < 25.0:
            ok += 1
    assert ok >= 5


@pytest.mark.slow
def test_flexible_alignment_finds_mode_amplitude(tmp_path):
    from xmipp3_tpu.core.pdb import AtomicModel, rasterize, write_pdb
    from xmipp3_tpu.models.nma import elastic_network_modes
    from xmipp3_tpu.ops.project import FourierProjector
    rng = np.random.default_rng(0)
    c1 = rng.normal(0, 1.2, (12, 3)) + [-5.0, 0, 0]
    c2 = rng.normal(0, 1.2, (12, 3)) + [5.0, 0, 0]
    coords = np.vstack([c1, c2])
    model = AtomicModel(coords, ["C"] * 24, np.zeros(24, np.float32),
                        np.ones(24, np.float32))
    fn_pdb = str(tmp_path / "m.pdb")
    write_pdb(fn_pdb, model)
    run_prog("nma_modes", f"-i {fn_pdb} --oroot {tmp_path}/nm --nmodes 2")
    modes, _ = elastic_network_modes(model.coords, n_modes=2)
    import dataclasses
    deformed = dataclasses.replace(model,
                                   coords=model.coords + 2.5 * modes[0])
    size = 32
    vol_t = rasterize(deformed, size, 1.0, sigma_a=1.5, center=False)
    img = np.asarray(FourierProjector(vol_t).project_euler(
        np.zeros(1, np.float32), np.zeros(1, np.float32),
        np.zeros(1, np.float32)))[0]
    save_image(str(tmp_path / "p.stk"), img[None])
    MetaData.fromRows([
        {"image": f"000001@{tmp_path}/p.stk", "itemId": 1,
         "angleRot": 0.0, "angleTilt": 0.0, "anglePsi": 0.0}]
    ).write(str(tmp_path / "p.xmd"))
    # nma_alignment/flexible_alignment take a PLAIN mode-list file
    md_modes = MetaData(str(tmp_path / "nm_modes.xmd"))
    with open(tmp_path / "modes.lst", "w") as fh:
        for r in md_modes.iterRows():
            fh.write(str(r["nmaModefile"]) + "\n")
    prog = run_prog("flexible_alignment",
                    f"-i {tmp_path}/p.xmd --pdb {fn_pdb} "
                    f"--modes {tmp_path}/modes.lst -o {tmp_path}/o.xmd "
                    f"--steps 40 -v 0")
    md = MetaData(str(tmp_path / "o.xmd"))
    row = next(iter(md.iterRows()))
    amps = np.asarray(row["nmaDisplacements"], np.float64)
    assert np.isfinite(amps).all()
    assert abs(amps[0]) > abs(amps[1])  # the deformed mode dominates


# ---------------------------------------------------------------------------
# movie / resolution programs
# ---------------------------------------------------------------------------

def test_movie_estimate_gain_recovers_gain_field(tmp_path):
    """Rank-histogram gain estimation (movie_estimate_gain.cpp:67-530):
    the method is designed for detector row/column-stripe gain defects;
    the output is the correction field (Ideal = Observed * Corr)."""
    rng = np.random.default_rng(9)
    n, F = 64, 16
    gj = 1.0 + 0.3 * rng.standard_normal(n)
    gi = 1.0 + 0.2 * rng.standard_normal(n)
    gain = np.clip(np.outer(gi, np.ones(n)) * np.outer(np.ones(n), gj),
                   0.3, 3.0).astype(np.float32)
    frames = np.stack([
        rng.poisson(200.0, (n, n)).astype(np.float32) * gain
        for _ in range(F)])
    save_image(str(tmp_path / "mov.mrcs"), frames)
    run_prog("movie_estimate_gain",
             f"-i {tmp_path}/mov.mrcs --oroot {tmp_path}/g --iter 1")
    est = np.squeeze(Image(str(tmp_path / "g_gain.xmp")).data)
    cc = np.corrcoef(est.ravel(), (1.0 / gain).ravel())[0, 1]
    assert cc > 0.9
    assert est.mean() == pytest.approx(1.0, abs=0.05)
    # --applyGain with an external gain image corrects the movie
    save_image(str(tmp_path / "ext.xmp"), gain)
    run_prog("movie_estimate_gain",
             f"-i {tmp_path}/mov.mrcs --gainImage {tmp_path}/ext.xmp "
             f"--applyGain {tmp_path}/corr.mrcs")
    corr = Image.read_stack(str(tmp_path / "corr.mrcs"))
    np.testing.assert_allclose(corr, frames / gain[None], rtol=1e-4)
    # fixed sigma + frameStep + singleRef exercise the full grammar
    run_prog("movie_estimate_gain",
             f"-i {tmp_path}/mov.mrcs --oroot {tmp_path}/g2 --iter 1 "
             f"--sigma 1 --frameStep 2 --singleRef")
    est2 = np.squeeze(Image(str(tmp_path / "g2_gain.xmp")).data)
    assert np.corrcoef(est2.ravel(), (1.0 / gain).ravel())[0, 1] > 0.8


def test_resolution_fso_curve_tracks_half_map_agreement(tmp_path):
    rng = np.random.default_rng(13)
    n = 48
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    sig = np.exp(-(z ** 2 + y ** 2 + x ** 2) / 60).astype(np.float32)
    # band-limit the common signal so high shells are pure noise
    F = np.fft.rfftn(sig)
    fz = np.fft.fftfreq(n)[:, None, None]
    fy = np.fft.fftfreq(n)[None, :, None]
    fx = np.fft.rfftfreq(n)[None, None, :]
    F *= (np.sqrt(fz ** 2 + fy ** 2 + fx ** 2) < 0.15)
    sig = np.fft.irfftn(F, s=(n, n, n)).astype(np.float32)
    h1 = sig + 0.002 * rng.standard_normal((n, n, n)).astype(np.float32)
    h2 = sig + 0.002 * rng.standard_normal((n, n, n)).astype(np.float32)
    save_image(str(tmp_path / "h1.vol"), h1)
    save_image(str(tmp_path / "h2.vol"), h2)
    out = str(tmp_path / "fso.xmd")
    prog = run_prog("resolution_fso",
                    f"--half1 {tmp_path}/h1.vol --half2 {tmp_path}/h2.vol "
                    f"-o {out} --sampling 2.0")
    fso = np.asarray(prog.fso, np.float64)
    freqs = (np.arange(len(fso)) + 0.5) * (0.5 / len(fso))
    # mid-band signal shells fully occupied (the innermost 1-2 shells hold
    # too few voxels per 20-deg cone for a stable directional FSC)
    band = (freqs >= 0.06) & (freqs <= 0.12)
    assert fso[band].mean() > 0.9
    assert fso[-1] < 0.5     # noise shells unoccupied
    assert MetaData(out).size() == len(fso)


def test_resolution_localfilter_uniform_map_equals_global_lowpass(tmp_path):
    rng = np.random.default_rng(15)
    n = 32
    vol = rng.standard_normal((n, n, n)).astype(np.float32)
    res = np.full((n, n, n), 6.0, np.float32)  # uniform 6 A
    save_image(str(tmp_path / "v.vol"), vol)
    save_image(str(tmp_path / "r.vol"), res)
    out = str(tmp_path / "f.vol")
    run_prog("resolution_localfilter",
             f"--vol {tmp_path}/v.vol --resvol {tmp_path}/r.vol "
             f"-o {out} --sampling 2.0")
    got = np.squeeze(Image(out).data)
    # reference semantics (resolution_localfilter.cpp run loop): the
    # output is a Gaussian-weighted sum of raised-cosine BANDS centered
    # at each local cutoff, NOT a cumulative low-pass; a uniform 6 A map
    # therefore yields the single band at f = Ts/res = 1/3 (+-0.02)
    # applied to the boundary-apodized volume
    n_s = 10
    apo = np.ones((n, n, n), np.float32)
    for ax in range(3):
        u = np.abs(np.arange(n) - n // 2)
        lim = n // 2 - n_s
        a = np.where(u >= lim, 0.5 * (1 + np.cos(np.pi * (lim - u) / n_s)),
                     1.0).astype(np.float32)
        shp = [1, 1, 1]
        shp[ax] = n
        apo = apo * a.reshape(shp)
    F = np.fft.rfftn(vol * apo)
    fz = np.fft.fftfreq(n)[:, None, None]
    fy = np.fft.fftfreq(n)[None, :, None]
    fx = np.fft.rfftfreq(n)[None, None, :]
    r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
    f = 2.0 / 6.0
    f_l, f_h = max(f - 0.02, 0.001), min(f + 0.02, 0.5)
    win = np.where((r >= f) & (r <= f_h),
                   0.5 * (1 + np.cos(np.pi * (r - f) / (f_h - f))), 0.0)
    win += np.where((r >= f_l) & (r < f),
                    0.5 * (1 + np.cos(np.pi * (r - f) / (f - f_l))), 0.0)
    ref = np.fft.irfftn(F * win, s=(n, n, n), axes=(0, 1, 2))
    cc = np.corrcoef(got.ravel(), ref.ravel())[0, 1]
    assert cc > 0.99


def test_resolution_monotomo_values_in_band_and_signal_ordering(tmp_path):
    rng = np.random.default_rng(17)
    n = 48
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    sig = np.exp(-(z ** 2 + y ** 2 + x ** 2) / 40).astype(np.float32)
    h1 = sig + 0.02 * rng.standard_normal((n, n, n)).astype(np.float32)
    h2 = sig + 0.02 * rng.standard_normal((n, n, n)).astype(np.float32)
    mask = (np.sqrt(z ** 2 + y ** 2 + x ** 2) < 12).astype(np.float32)
    for name, v in [("h1.vol", h1), ("h2.vol", h2), ("m.vol", mask)]:
        save_image(str(tmp_path / name), v)
    out = str(tmp_path / "res.vol")
    run_prog("resolution_monotomo",
             f"--vol {tmp_path}/h1.vol --vol2 {tmp_path}/h2.vol "
             f"--mask {tmp_path}/m.vol -o {out} --sampling_rate 2.0 "
             f"--minRes 4 --maxRes 20 --step 1.5")
    res = np.squeeze(Image(out).data)
    inside = res[mask > 0]
    inside = inside[inside > 0]
    assert len(inside) > 0
    assert inside.min() >= 4 - 1e-3 and inside.max() <= 20 + 1e-3


# ---------------------------------------------------------------------------
# deep / reconstruction tails
# ---------------------------------------------------------------------------

@pytest.mark.slow
def test_deepres_resolution_regresses_training_labels(tmp_path):
    rng = np.random.default_rng(19)
    n = 32

    def vol_with_cutoff(cut):
        v = rng.standard_normal((n, n, n)).astype(np.float32)
        F = np.fft.rfftn(v)
        fz = np.fft.fftfreq(n)[:, None, None]
        fy = np.fft.fftfreq(n)[None, :, None]
        fx = np.fft.rfftfreq(n)[None, None, :]
        r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
        return np.fft.irfftn(F * (r <= cut), s=(n, n, n)).astype(np.float32)

    sharp, blurry = vol_with_cutoff(0.45), vol_with_cutoff(0.12)
    save_image(str(tmp_path / "sharp.vol"), sharp)
    save_image(str(tmp_path / "blur.vol"), blurry)
    MetaData.fromRows([
        {"image": f"{tmp_path}/sharp.vol", "resolution": 3.0, "itemId": 1},
        {"image": f"{tmp_path}/blur.vol", "resolution": 9.0, "itemId": 2},
    ]).write(str(tmp_path / "train.xmd"))
    run_prog("deepRes_resolution",
             f"-i {tmp_path}/sharp.vol --train --trainVols {tmp_path}/train.xmd "
             f"--model {tmp_path}/m.pkl --epochs 30 --patch 8 -v 0")
    run_prog("deepRes_resolution",
             f"-i {tmp_path}/sharp.vol -o {tmp_path}/rs.mrc "
             f"--model {tmp_path}/m.pkl --patch 8 -v 0")
    run_prog("deepRes_resolution",
             f"-i {tmp_path}/blur.vol -o {tmp_path}/rb.mrc "
             f"--model {tmp_path}/m.pkl --patch 8 -v 0")
    rs = float(np.mean(np.squeeze(Image(str(tmp_path / "rs.mrc")).data)))
    rb = float(np.mean(np.squeeze(Image(str(tmp_path / "rb.mrc")).data)))
    assert rs < rb  # sharper volume predicted at better resolution
    # alias endpoint resolves to the same engine
    assert type(get_program("deep_res_resolution")) is \
        type(get_program("deepRes_resolution"))


@pytest.mark.slow
def test_reconstruct_fourier_accel_endpoint_reconstructs(tmp_path):
    from xmipp3_tpu.core.sampling import compute_sampling_points
    from xmipp3_tpu.ops.project import FourierProjector
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = (np.exp(-((z - 2) ** 2 + y ** 2 + (x + 3) ** 2) / 10)
           + 0.6 * np.exp(-((z + 4) ** 2 + (y - 3) ** 2 + x ** 2) / 8)
           ).astype(np.float32)
    angles = compute_sampling_points(12.0)
    proj = FourierProjector(vol)
    imgs = np.asarray(proj.project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        np.zeros(len(angles), np.float32)))
    save_image(str(tmp_path / "p.stk"), imgs)
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{tmp_path}/p.stk",
         "angleRot": float(angles[i, 0]), "angleTilt": float(angles[i, 1]),
         "anglePsi": 0.0, "itemId": i + 1}
        for i in range(len(imgs))]).write(str(tmp_path / "p.xmd"))
    out = str(tmp_path / "rec.vol")
    run_prog("reconstruct_fourier_accel",
             f"-i {tmp_path}/p.xmd -o {out} --mesh none -v 0")
    rec = np.squeeze(Image(out).data)
    m = np.sqrt(z ** 2 + y ** 2 + x ** 2) < n // 2 - 2
    cc = np.corrcoef(rec[m].ravel(), vol[m].ravel())[0, 1]
    assert cc > 0.95
