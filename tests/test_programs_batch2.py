"""Tests for CTF correction, picking/extraction, ART/WBP/significant."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.ctf import CTFDescription, apply_ctf
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, name
    return prog


def make_phantom(n=32):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for cz, cy, cx, s, a in [(0, 0, 0, 2.5, 1.0), (4, -3, 3, 1.5, 0.8),
                             (-3, 3, -2, 1.8, 0.6), (-5, -4, 1, 1.0, 1.1),
                             (5, 2, -1, 1.1, 0.7), (2, 5, 4, 1.3, 0.9)]:
        vol += a * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                          / (2 * s ** 2))
    return vol


@pytest.fixture(scope="module")
def proj_set(tmp_path_factory):
    tmp = tmp_path_factory.mktemp("projs")
    vol = make_phantom()
    from xmipp3_tpu.core.sampling import compute_sampling_points
    from xmipp3_tpu.ops.project import FourierProjector
    angles = compute_sampling_points(12.0)
    proj = FourierProjector(vol)
    imgs = np.asarray(proj.project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        np.zeros(len(angles), np.float32)))
    fn = str(tmp / "projs.mrcs")
    save_image(fn, imgs)
    md = MetaData.fromRows([
        {"image": f"{i + 1:06d}@{fn}", "angleRot": float(angles[i, 0]),
         "angleTilt": float(angles[i, 1]), "anglePsi": 0.0, "itemId": i + 1}
        for i in range(len(imgs))])
    fn_md = str(tmp / "projs.xmd")
    md.write(fn_md)
    return vol, fn_md, imgs


def corr(a, b):
    a, b = a - a.mean(), b - b.mean()
    return float((a * b).sum() / np.sqrt((a * a).sum() * (b * b).sum()))


def test_ctf_phase_flip_program(tmp_path):
    ctf = CTFDescription(sampling_rate=1.5, voltage=300, defocusU=15000,
                         defocusV=15000, Cs=2.7, Q0=0.07)
    fn_ctf = str(tmp_path / "c.ctfparam")
    ctf.write(fn_ctf)
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((4, 32, 32)).astype(np.float32)
    fn = str(tmp_path / "in.mrcs")
    save_image(fn, imgs)
    out = str(tmp_path / "flipped.mrcs")
    run_prog("ctf_phase_flip", f"-i {fn} -o {out} --ctf {fn_ctf}")
    out2 = str(tmp_path / "double.mrcs")
    run_prog("ctf_phase_flip", f"-i {out} -o {out2} --ctf {fn_ctf}")
    np.testing.assert_allclose(Image.read_stack(out2), imgs, atol=1e-3)


def test_wiener_program_restores(tmp_path):
    ctf = CTFDescription(sampling_rate=1.5, voltage=300, defocusU=18000,
                         defocusV=18000, Cs=2.7, Q0=0.07)
    fn_ctf = str(tmp_path / "c.ctfparam")
    ctf.write(fn_ctf)
    rng = np.random.default_rng(1)
    clean = rng.standard_normal((2, 64, 64)).astype(np.float32)
    corrupted = np.asarray(apply_ctf(clean, ctf))
    fn = str(tmp_path / "in.mrcs")
    save_image(fn, corrupted)
    out = str(tmp_path / "wiener.mrcs")
    # the degradation includes the damping envelope, so ask the Wiener
    # filter to invert it too (reference default is without envelope,
    # wiener2d.cpp:55-58). The fixture corrupts by CIRCULAR convolution
    # (apply_ctf multiplies in the unpadded Fourier domain), so padding
    # would discard the wrapped CTF energy — use --pad 1 here.
    run_prog("ctf_correct_wiener2d",
             f"-i {fn} -o {out} --ctf {fn_ctf} --wc 0.05 --pad 1 "
             "--correct_envelope")
    rest = Image.read_stack(out)
    assert corr(rest[0], clean[0]) > 0.85
    # without --correct_envelope the pure-CTF Wiener still helps
    out2 = str(tmp_path / "wiener2.mrcs")
    run_prog("ctf_correct_wiener2d",
             f"-i {fn} -o {out2} --ctf {fn_ctf} --pad 1")
    rest2 = Image.read_stack(out2)
    assert corr(rest2[0], clean[0]) > corr(corrupted[0], clean[0])


def test_ctf_group_program(tmp_path):
    rows = [{"itemId": i + 1, "ctfDefocusU": 10000.0 + 3000 * (i // 5),
             "ctfDefocusV": 10000.0 + 3000 * (i // 5)} for i in range(15)]
    fn = str(tmp_path / "ctfs.xmd")
    MetaData.fromRows(rows).write(fn)
    prog = run_prog("ctf_group", f"--ctfdat {fn} --oroot {tmp_path}/grp "
                    f"--maxdiff 1000 -v 0")
    assert prog.n_groups == 3
    md = MetaData(str(tmp_path) + "/grp.xmd")
    assert set(md.getColumn("defGroup")) == {1, 2, 3}


def test_ctf_group_full_surface(tmp_path):
    """Reference surface ctf_group.cpp:116-790: auto grouping by CTF
    profile error, simple bins, per-group filter stacks + Wiener."""
    rng = np.random.default_rng(0)
    imgs = rng.standard_normal((12, 32, 32)).astype(np.float32)
    fn_img = str(tmp_path / "imgs.mrcs")
    save_image(fn_img, imgs)
    rows = []
    for i in range(12):
        # two well-separated defocus clusters with tiny intra-cluster jitter
        base = 12000.0 if i < 6 else 26000.0
        d = base + 20.0 * (i % 3)
        rows.append({"image": f"{i + 1:06d}@{fn_img}", "itemId": i + 1,
                     "ctfDefocusU": d, "ctfDefocusV": d,
                     "ctfDefocusAngle": 0.0, "ctfVoltage": 300.0,
                     "ctfSphericalAberration": 2.7, "ctfQ0": 0.07,
                     "ctfSamplingRate": 2.0})
    fn = str(tmp_path / "ctfs.xmd")
    MetaData.fromRows(rows).write(fn)
    prog = run_prog("ctf_group",
                    f"--ctfdat {fn} --oroot {tmp_path}/auto --wiener "
                    f"--error 0.5 --resol 8 --pad 1 -v 0")
    # the two clusters cannot merge (profiles differ >0.5 within 8 A)
    assert prog.n_groups == 2
    md = MetaData(str(tmp_path / "auto.xmd"))
    g = np.asarray(md.getColumn("defGroup"), int)
    assert len(set(g[:6])) == 1 and len(set(g[6:])) == 1 and g[0] != g[-1]
    ctfs = Image.read_stack(str(tmp_path / "auto_ctf.mrcs"))
    assert ctfs.shape == (2, 32, 32)
    # group-average CTF at DC is ~ -K*Q0 contribution, bounded by 1
    assert np.abs(ctfs).max() <= 1.0 + 1e-3
    assert (tmp_path / "auto_wien.mrcs").exists()
    assert (tmp_path / "autoInfo.xmd").exists()
    assert (tmp_path / "auto_split.doc").exists()
    info = MetaData(f"groups@{tmp_path}/autoInfo.xmd")
    assert info.size() == 2
    assert float(info.getColumn("sum").sum()) == 12.0
    # simple mode: fixed defocus bins on defocusU
    prog = run_prog("ctf_group",
                    f"--ctfdat {fn} --oroot {tmp_path}/simp --simple 4 "
                    f"-v 0")
    md = MetaData(str(tmp_path / "simp.xmd"))
    g = np.asarray(md.getColumn("defGroup"), int)
    assert g.min() == 1 and g.max() >= 4
    # manual mode: split at 19000 A
    MetaData.fromRows([{"ctfDefocusA": 19000.0}]).write(
        str(tmp_path / "split.doc"))
    prog = run_prog("ctf_group",
                    f"--ctfdat {fn} --oroot {tmp_path}/man "
                    f"--split {tmp_path}/split.doc -v 0")
    md = MetaData(str(tmp_path / "man.xmd"))
    g = np.asarray(md.getColumn("defGroup"), int)
    assert prog.n_groups == 2
    assert len(set(g[:6])) == 1 and g[0] != g[-1]


def test_scissor_and_picking(tmp_path):
    rng = np.random.default_rng(2)
    mic = rng.standard_normal((256, 256)).astype(np.float32) * 0.1
    # plant dark blobs (particles) at known positions
    y, x = np.mgrid[0:21, 0:21].astype(np.float32)
    blob = -np.exp(-((y - 10) ** 2 + (x - 10) ** 2) / (2 * 9.0))
    coords = [(40, 60), (120, 200), (200, 100), (60, 180)]
    for cx, cy in coords:
        mic[cy - 10:cy + 11, cx - 10:cx + 11] += 3 * blob
    fn_mic = str(tmp_path / "mic.mrc")
    save_image(fn_mic, mic)
    # picking
    fn_pos = str(tmp_path / "picked.xmd")
    prog = run_prog("micrograph_automatic_picking",
                    f"-i {fn_mic} -o {fn_pos} --particleSize 20 --thr 4 "
                    f"--max_peaks 10 -v 0")
    md = MetaData(fn_pos)
    picked = set()
    for i in md:
        r = md.getRow(i)
        for cx, cy in coords:
            if abs(r["xcoor"] - cx) < 8 and abs(r["ycoor"] - cy) < 8:
                picked.add((cx, cy))
    assert len(picked) >= 3, f"picked {picked}"
    # extraction at true coords
    fn_true = str(tmp_path / "true.xmd")
    MetaData.fromRows([{"xcoor": cx, "ycoor": cy, "itemId": i + 1}
                       for i, (cx, cy) in enumerate(coords)]).write(fn_true)
    run_prog("micrograph_scissor",
             f"-i {fn_mic} --pos {fn_true} -o {tmp_path}/parts.mrcs "
             f"--Xdim 32 -v 0")
    parts = Image.read_stack(str(tmp_path / "parts.mrcs"))
    assert parts.shape == (4, 32, 32)
    # particle center is dark
    assert parts[0][16, 16] < -1.0
    md_out = MetaData(str(tmp_path / "parts.xmd"))
    r0 = md_out.getRow(next(iter(md_out)))
    assert r0["micrograph"] == fn_mic and int(r0["enabled"]) == 1
    # --invert: normalized inverse contrast makes the center bright
    run_prog("micrograph_scissor",
             f"-i {fn_mic} --pos {fn_true} -o {tmp_path}/inv.mrcs "
             f"--Xdim 32 --invert -v 0")
    inv = Image.read_stack(str(tmp_path / "inv.mrcs"))
    assert inv[0][16, 16] > inv[0].mean()
    # border particle: blank+disabled by default, filled with --fillBorders
    fn_edge = str(tmp_path / "edge.xmd")
    MetaData.fromRows([{"xcoor": 5, "ycoor": 5, "itemId": 1}]).write(fn_edge)
    run_prog("micrograph_scissor",
             f"-i {fn_mic} --pos {fn_edge} -o {tmp_path}/edgecut.mrcs "
             f"--Xdim 32 -v 0")
    run_prog("micrograph_scissor",
             f"-i {fn_mic} --pos {fn_edge} -o {tmp_path}/fill.mrcs "
             f"--Xdim 32 --fillBorders -v 0")
    blank = Image.read_stack(str(tmp_path / "edgecut.mrcs"))
    filled = Image.read_stack(str(tmp_path / "fill.mrcs"))
    assert np.abs(blank[0]).max() == 0.0
    assert np.abs(filled[0]).max() > 0.0
    # --extractNoise rewrites the pos file away from the particles
    fn_noise_pos = str(tmp_path / "noise.xmd")
    MetaData.fromRows([{"xcoor": cx, "ycoor": cy, "itemId": i + 1}
                       for i, (cx, cy) in enumerate(coords)]
                      ).write(fn_noise_pos)
    run_prog("micrograph_scissor",
             f"-i {fn_mic} --pos {fn_noise_pos} -o {tmp_path}/noise.mrcs "
             f"--Xdim 32 --extractNoise -1 -v 0")
    md_noise = MetaData(fn_noise_pos)
    assert md_noise.size() == 4
    for i in md_noise:
        r = md_noise.getRow(i)
        for cx, cy in coords:
            assert abs(r["xcoor"] - cx) >= 16 or abs(r["ycoor"] - cy) >= 16


@pytest.mark.slow
def test_wbp_reconstruction(proj_set):
    """Default path = the Radermacher arbitrary-geometry filter
    (reconstruct_wbp.cpp:437-492)."""
    vol, fn_md, imgs = proj_set
    import tempfile, os
    with tempfile.TemporaryDirectory() as td:
        out = os.path.join(td, "wbp.vol")
        run_prog("reconstruct_wbp", f"-i {fn_md} -o {out} -v 0")
        rec = np.squeeze(Image(out).data)
    assert corr(rec, vol) > 0.8


def test_wbp_arbitrary_filter_identity_direction():
    """A single image at identity pose with itself as the only filter
    direction: g=(0,0,1) projects to f=(0,0), so the weight map is flat
    sinc(0)*count=1 and the filter is an exact division by the diameter
    (filterOneImage, reconstruct_wbp.cpp:465-489)."""
    from xmipp3_tpu.ops.art import wbp_arbitrary_filter, wbp_direction_set
    rng = np.random.default_rng(0)
    img = rng.normal(size=(1, 32, 32)).astype(np.float32)
    zeros = np.zeros(1, np.float32)
    g, c = wbp_direction_set(zeros, zeros, psi=zeros, use_each_image=True)
    assert np.allclose(g, [[0, 0, 1]], atol=1e-6) and c.tolist() == [1.0]
    out = np.asarray(wbp_arbitrary_filter(img, zeros, zeros, zeros, g, c,
                                          diameter=32.0))
    assert np.abs(out - img / 32.0).max() < 1e-5


def test_wbp_arbitrary_filter_dc_weight_is_total_count():
    """At DC every direction contributes sinc(0)=1, so the DC weight is
    the total (symmetry-expanded) image count: mean(filtered) =
    mean(img) / (totimgs * diameter)."""
    from xmipp3_tpu.ops.art import wbp_arbitrary_filter, wbp_direction_set
    rng = np.random.default_rng(1)
    B, N = 4, 32
    imgs = rng.normal(size=(B, N, N)).astype(np.float32) + 1.0
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = rng.uniform(0, 90, B).astype(np.float32)
    psi = rng.uniform(0, 360, B).astype(np.float32)
    g, c = wbp_direction_set(rot, tilt, psi=psi, use_each_image=True)
    out = np.asarray(wbp_arbitrary_filter(imgs, rot, tilt, psi, g, c,
                                          diameter=float(N)))
    exp = imgs.mean(axis=(1, 2)) / (c.sum() * N)
    assert np.abs(out.mean(axis=(1, 2)) - exp).max() < 1e-5


def test_wbp_direction_set_binning_and_symmetry():
    """Sampled mode bins images onto the even distribution (counts sum to
    the image count) and c2 symmetry doubles the direction table
    (getSampledMatrices, reconstruct_wbp.cpp:265-301)."""
    from xmipp3_tpu.ops.art import wbp_direction_set
    rng = np.random.default_rng(2)
    B = 12
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = rng.uniform(10, 80, B).astype(np.float32)
    g1, c1 = wbp_direction_set(rot, tilt, filsam=15.0, sym="c1")
    assert c1.sum() <= B and len(g1) == len(c1)
    assert np.allclose(np.linalg.norm(g1, axis=1), 1.0, atol=1e-5)
    g2, c2 = wbp_direction_set(rot, tilt, filsam=15.0, sym="c2")
    assert len(g2) % 2 == 0 and len(g2) <= 2 * len(g1)


def test_art_reconstruction_improves(proj_set):
    vol, fn_md, imgs = proj_set
    import tempfile, os
    from xmipp3_tpu.ops.art import sirt_reconstruct
    md = MetaData(fn_md)
    rows = list(md.iterRows())
    rot = np.array([r["angleRot"] for r in rows], np.float32)
    tilt = np.array([r["angleTilt"] for r in rows], np.float32)
    psi = np.zeros(len(rows), np.float32)
    rec, hist = sirt_reconstruct(imgs, rot, tilt, psi, n_iters=4, lam=0.8)
    assert corr(rec, vol) > 0.97
    assert hist[-1] < hist[0]  # residual decreases


@pytest.mark.slow
def test_reconstruct_significant_ab_initio(proj_set, tmp_path):
    vol, fn_md, imgs = proj_set
    prog = run_prog("reconstruct_significant",
                    f"-i {fn_md} --odir {tmp_path} --iter 4 "
                    f"--angularSampling 15 -v 0")
    rec = prog.volume
    # ab initio has arbitrary orientation; check strong central correlation
    # after aligning via brute global rotation search over the gallery trick:
    # just require the reconstruction to be structured (not noise): its
    # radial power profile should match the phantom's closely at low freq
    def radial_power(v):
        F = np.abs(np.fft.rfftn(v)) ** 2
        from xmipp3_tpu.ops.fourier import freq_grid_3d
        fz, fy, fx = freq_grid_3d(*v.shape)
        r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
        bins = np.minimum((r / 0.5 * 16).astype(int), 15)
        num = np.bincount(bins.ravel(), F.ravel(), minlength=16)
        den = np.bincount(bins.ravel(), minlength=16)
        return num / np.maximum(den, 1)
    p1 = radial_power(rec / rec.std())
    p2 = radial_power(vol / vol.std())
    ratio = p1[1:8] / p2[1:8]
    assert (ratio > 0.1).all() and (ratio < 10).all()
