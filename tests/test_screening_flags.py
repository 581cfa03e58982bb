"""Value tests for the round-4 screening-flag surfaces: image_ssnr,
image_find_center, image_sort_by_statistics."""
import numpy as np

from tests.test_dimred_tomo import run_prog
from xmipp3_tpu.core.image import save_image
from xmipp3_tpu.core.metadata import MetaData


def test_image_ssnr_reference_surface(tmp_path):
    rng = np.random.default_rng(0)
    n = 64
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    blob = np.exp(-((y - 32) ** 2 + (x - 32) ** 2) / 60.0)
    good = np.stack([3 * blob + 0.3 * rng.standard_normal((n, n))
                     for _ in range(4)]).astype(np.float32)
    bad = 0.3 * rng.standard_normal((4, n, n)).astype(np.float32)
    imgs = np.concatenate([good, bad])
    fn = str(tmp_path / "in.mrcs")
    save_image(fn, imgs)
    out = str(tmp_path / "out.xmd")
    prog = run_prog("image_ssnr",
                    f"-i {fn} -o {out} -R 20 --Rwidth 3 --fmin 40 "
                    f"--fmax 3 --sampling 1 --normalizessnr "
                    f"--ssnrpercent 50")
    ssnr = prog.ssnr
    # particles with signal have higher SSNR than pure noise
    assert ssnr[:4].min() > ssnr[4:].max()
    md = MetaData(out)
    en = np.asarray(md.getColumn("enabled"), int)
    assert (en[4:] == -1).all() and (en[:4] == 1).all()
    w = np.asarray(md.getColumn("weightSSNR"), float)
    assert abs(w.max() - 1.0) < 1e-6


def test_image_find_center_harmonic(tmp_path):
    n = 96
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    cx, cy = 51.0, 45.0
    # c4 object centered at (51, 45): harmonic-4 energy peaks there
    img = np.zeros((n, n), np.float32)
    for k in range(4):
        a = 2 * np.pi * k / 4
        bx, by = cx + 14 * np.cos(a), cy + 14 * np.sin(a)
        img += np.exp(-((x - bx) ** 2 + (y - by) ** 2) / 6.0)
    fn = str(tmp_path / "c4.xmp")
    save_image(fn, img)
    root = str(tmp_path / "res")
    prog = run_prog("image_find_center",
                    f"-i {fn} --oroot {root} --harm 4 --opt 1 "
                    f"--r1 20 --r2 40 --x0 48 --y0 48 -v 0")
    fx, fy = prog.center
    assert abs(fx - cx) <= 1.0 and abs(fy - cy) <= 1.0
    md = MetaData(root + "_center.xmd")
    r = next(md.iterRows())
    assert abs(float(r["X"]) - cx) <= 1.0


def test_sort_by_statistics_flags(tmp_path):
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((12, 32, 32)).astype(np.float32)
    imgs[2] *= 40.0
    imgs[7] += 25.0
    fn = str(tmp_path / "in.mrcs")
    save_image(fn, imgs)
    out = str(tmp_path / "sorted.xmd")
    prog = run_prog("image_sort_by_statistics",
                    f"-i {fn} -o {out} --percent 20 --addFeatures "
                    f"--dim 16 -v 0")
    md = MetaData(out)
    rows = list(md.iterRows())
    # ~20% = at least the two planted outliers disabled
    bad = {int(str(r["image"]).split("@")[0]) - 1
           for r in rows if int(r["enabled"]) == -1}
    assert {2, 7} <= bad
    assert len(np.asarray(rows[0]["scoreByScreening"], float)) == 5
    # training mode: stats from a clean set make outliers stand out more
    fn_train = str(tmp_path / "train.mrcs")
    save_image(fn_train, np.delete(imgs, [2, 7], axis=0))
    prog2 = run_prog("image_sort_by_statistics",
                     f"-i {fn} -o {out} -t {fn_train} --zcut 10 -v 0")
    z_trained = prog2.zscores
    assert z_trained[2] > 10 and z_trained[7] > 10
