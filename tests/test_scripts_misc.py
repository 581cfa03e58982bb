"""Script-program equivalents (programs/scripts_misc.py)."""
import os

import numpy as np
import pytest

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def _run(name, args):
    prog = get_program(name)
    prog.read(["xmipp_" + name] + args)
    prog.run()
    return prog


@pytest.fixture(scope="module")
def picking_data(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("pick"))
    rng = np.random.default_rng(0)
    H = W = 200
    mic = rng.normal(0, 0.1, (H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    truth = []
    while len(truth) < 10:
        x, y = rng.integers(25, W - 25), rng.integers(25, H - 25)
        if truth and np.min(np.linalg.norm(
                np.asarray(truth, float) - [x, y], axis=1)) < 25:
            continue                          # keep particles separable
        truth.append((x, y))
        mic -= 0.5 * np.exp(-(((xx - x) ** 2 + (yy - y) ** 2) / 32.0)
                            ).astype(np.float32)
    Image(mic).write(f"{d}/mic.mrc")
    truth = np.array(truth, float)
    for i in range(3):
        pts = truth + rng.normal(0, 1.5, truth.shape)
        fp = np.array([[float(rng.integers(20, W - 20)),
                        float(rng.integers(20, H - 20))]])
        MetaData.fromRows([{"xcoor": int(x), "ycoor": int(y)}
                           for x, y in np.vstack([pts, fp])]
                          ).write(f"{d}/p{i}.xmd")
    open(f"{d}/list.txt", "w").write("\n".join(f"{d}/p{i}.xmd"
                                               for i in range(3)))
    np.save(f"{d}/truth.npy", truth)
    return d


def test_coordinates_consensus(picking_data):
    d = picking_data
    _run("coordinates_consensus",
         ["-i", f"{d}/list.txt", "-s", "12", "-c", "2",
          "-o", f"{d}/cons.xmd", "-d", "0.5"])
    truth = np.load(f"{d}/truth.npy")
    md = MetaData(f"{d}/cons.xmd")
    pts = np.stack([np.asarray(md.getColumn("xcoor"), float),
                    np.asarray(md.getColumn("ycoor"), float)], 1)
    dd = np.linalg.norm(pts[:, None] - truth[None], axis=-1).min(axis=1)
    assert (dd < 5).sum() == len(truth)      # every particle recovered
    assert (dd >= 5).sum() == 0              # single-picker FPs voted out


def test_pick_noise_and_extract(picking_data):
    d = picking_data
    _run("coordinates_consensus",
         ["-i", f"{d}/list.txt", "-s", "12", "-c", "2",
          "-o", f"{d}/cons.xmd", "-d", "0.5"])
    _run("pick_noise", ["-i", f"{d}/mic.mrc", "-c", f"{d}/cons.xmd",
                        "-o", f"{d}/noise.xmd", "-s", "14"])
    truth = np.load(f"{d}/truth.npy")
    md = MetaData(f"{d}/noise.xmd")
    pts = np.stack([np.asarray(md.getColumn("xcoor"), float),
                    np.asarray(md.getColumn("ycoor"), float)], 1)
    dd = np.linalg.norm(pts[:, None] - truth[None], axis=-1).min(axis=1)
    assert dd.min() > 14                     # noise boxes avoid particles
    MetaData.fromRows([{"micrograph": f"{d}/mic.mrc",
                        "coordinates": f"{d}/cons.xmd"}]
                      ).write(f"{d}/mics.xmd")
    _run("extract_particles", ["-i", f"{d}/mics.xmd", "-s", "20",
                               "-o", f"{d}/parts", "--invert",
                               "--normalize"])
    pmd = MetaData(f"{d}/parts/particles.xmd")
    assert pmd.size() == len(truth)
    stk = Image(pmd.getValue("image", 0)).data
    assert np.squeeze(stk).shape == (20, 20)


def test_pdb_center_select(tmp_path):
    pdb = str(tmp_path / "t.pdb")
    open(pdb, "w").write(
        "ATOM      1  CA  ALA A   1      10.000  20.000  30.000"
        "  1.00 10.00           C\n"
        "ATOM      2  CB  ALA A   1      12.000  22.000  34.000"
        "  1.00 10.00           C\nEND\n")
    cent = str(tmp_path / "c.pdb")
    _run("pdb_center", ["-i", pdb, "-o", cent])
    vals = [l for l in open(cent) if l.startswith("ATOM")]
    xyz = np.array([[float(l[30:38]), float(l[38:46]), float(l[46:54])]
                    for l in vals])
    np.testing.assert_allclose(xyz.mean(axis=0), 0.0, atol=1e-3)
    sel = str(tmp_path / "s.pdb")
    _run("pdb_select", ["-i", cent, "-o", sel, "--atom", "CA"])
    assert sum(1 for l in open(sel) if l.startswith("ATOM")) == 1


def test_volume_consensus(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(5)
    N = 32
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N] - N // 2
    sig = np.exp(-((xx ** 2 + yy ** 2 + zz ** 2) / 72.0)).astype(np.float32)
    for i in range(3):
        Image((sig + rng.normal(0, 0.3, sig.shape)).astype(np.float32)
              ).write(f"{d}/v{i}.vol")
    open(f"{d}/vols.txt", "w").write("\n".join(f"{d}/v{i}.vol"
                                               for i in range(3)))
    _run("volume_consensus", ["-i", f"{d}/vols.txt", "-o", f"{d}/c.vol"])
    cons = np.squeeze(Image(f"{d}/c.vol").data)
    v0 = np.squeeze(Image(f"{d}/v0.vol").data)
    assert np.std(cons - sig) < 0.6 * np.std(v0 - sig)


@pytest.fixture(scope="module")
def class_avgs(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("avgs"))
    rng = np.random.default_rng(3)
    yy, xx = np.mgrid[0:48, 0:48] - 24
    base = [np.exp(-((xx ** 2 + yy ** 2) / 40)),
            np.exp(-((xx ** 2 / 8 + yy ** 2) / 40)),
            (np.abs(xx) < 3).astype(float) * np.exp(-yy ** 2 / 200)]
    imgs, labels = [], []
    for bi, b in enumerate(base):
        for _ in range(6):
            imgs.append(b + rng.normal(0, 0.05, b.shape))
            labels.append(bi)
    Image(np.asarray(imgs, np.float32)).write(f"{d}/avgs.mrcs")
    np.save(f"{d}/labels.npy", np.asarray(labels))
    return d


def test_cl2d_clustering(class_avgs):
    d = class_avgs
    p = _run("cl2d_clustering", ["-i", f"{d}/avgs.mrcs", "-o", f"{d}/cl",
                                 "-m", "2", "-M", "6"])
    gt = np.load(f"{d}/labels.npy")
    lab = np.asarray(MetaData(f"{d}/cl/clusters.xmd").getColumn("ref"), int)
    purity = sum(max(np.sum((lab == c) & (gt == g)) for g in range(3))
                 for c in set(lab)) / len(lab)
    assert p.n_clusters == 3 and purity == 1.0


def test_align_pca_2d(class_avgs):
    d = class_avgs
    _run("align_pca_2d", ["-i", f"{d}/avgs.mrcs", "-o", f"{d}/pca",
                          "--ncomp", "4"])
    assert Image(f"{d}/pca/eigenimages.mrcs").data.shape == (4, 48, 48)
    assert MetaData(f"{d}/pca/pca.xmd").size() == 18


def test_graph_max_cut(tmp_path):
    W = np.array([[0, 5, .1, .1], [5, 0, .1, .1],
                  [.1, .1, 0, 5], [.1, .1, 5, 0]])
    fn = str(tmp_path / "W.txt")
    np.savetxt(fn, W)
    out = str(tmp_path / "cut.txt")
    p = _run("graph_max_cut", ["-i", fn, "-o", out])
    lab = np.loadtxt(out).astype(int)
    # optimal cut separates both heavy pairs
    assert lab[0] != lab[1] and lab[2] != lab[3]
    assert p.cut_value == pytest.approx(10.2)


def test_metadata_selfile_create(tmp_path, class_avgs):
    out = str(tmp_path / "sel.xmd")
    _run("metadata_selfile_create",
         ["-p", f"{class_avgs}/*.mrcs", "-o", out, "-s"])
    md = MetaData(out)
    assert md.size() == 18                   # stack expanded to n@ rows
    assert md.getValue("image", 0).startswith("000001@")


def test_swiftalign_wiener_and_classify(class_avgs, tmp_path):
    import jax.numpy as jnp
    from xmipp3_tpu.ops.ctf import CTFDescription, apply_ctf
    d = str(tmp_path)
    imgs = Image.read_stack(f"{class_avgs}/avgs.mrcs")
    rng = np.random.default_rng(9)
    out = np.empty_like(imgs)
    rows = []
    for i in range(len(imgs)):
        dU = float(rng.uniform(8000, 25000))
        ctf = CTFDescription(sampling_rate=1.5, voltage=300, defocusU=dU,
                             defocusV=dU, Cs=2.7, Q0=0.07)
        out[i] = np.asarray(apply_ctf(imgs[i][None], ctf))[0]
        rows.append({"image": f"{i+1:06d}@{d}/ctf.mrcs", "itemId": i + 1,
                     "ctfVoltage": 300.0, "ctfDefocusU": dU,
                     "ctfDefocusV": dU, "ctfSphericalAberration": 2.7,
                     "ctfQ0": 0.07})
    Image(out.astype(np.float32)).write(f"{d}/ctf.mrcs")
    MetaData.fromRows(rows).write(f"{d}/ctf.xmd")
    _run("swiftalign_wiener_2d", ["-i", f"{d}/ctf.xmd", "-o",
                                  f"{d}/wiener.mrcs", "--sampling", "1.5"])
    wien = Image.read_stack(f"{d}/wiener.mrcs")
    c_ctf = np.mean([np.corrcoef(imgs[i].ravel(), out[i].ravel())[0, 1]
                     for i in range(len(imgs))])
    c_w = np.mean([np.corrcoef(imgs[i].ravel(), wien[i].ravel())[0, 1]
                   for i in range(len(imgs))])
    assert c_w > c_ctf + 0.1                 # correction restores signal
    _run("swiftalign_aligned_2d_classification",
         ["-i", f"{d}/wiener.xmd", "-o", f"{d}/cls", "--nClasses", "3"])
    gt = np.load(f"{class_avgs}/labels.npy")
    lab = np.asarray(MetaData(f"{d}/cls/classes.xmd").getColumn("ref"), int)
    purity = sum(max(np.sum((lab == c) & (gt == g)) for g in range(3))
                 for c in set(lab)) / len(lab)
    assert purity > 0.9
