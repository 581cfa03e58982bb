"""End-to-end test of the reference picking mode protocol
(buildinv -> train -> try/autoselect with --model persistence),
micrograph_automatic_picking2.cpp:1778-1824."""
import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def run_pick(args):
    p = get_program("micrograph_automatic_picking")
    p.read(["xmipp_micrograph_automatic_picking"] + args.split())
    p.run()
    return p


def make_mic(rng, truth, H=256, W=256, amp=3.0):
    mic = 0.15 * rng.standard_normal((H, W)).astype(np.float32)
    yy, xx = np.mgrid[0:H, 0:W]
    for (x, y) in truth:
        mic -= amp * np.exp(-(((xx - x) ** 2 + (yy - y) ** 2) / 20.0)
                            ).astype(np.float32)
    return mic


def test_picking_mode_protocol(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(4)
    truth1 = [(48, 48), (200, 64), (120, 128), (64, 192), (192, 208)]
    truth2 = [(80, 60), (180, 120), (60, 150), (150, 210)]
    mic1, mic2 = make_mic(rng, truth1), make_mic(rng, truth2)
    save_image(f"{d}/mic1.mrc", mic1)
    save_image(f"{d}/mic2.mrc", mic2)
    MetaData.fromRows([{"xcoor": x, "ycoor": y} for x, y in truth1]).write(
        f"{d}/manual1.pos")
    MetaData.fromRows([{"xcoor": x, "ycoor": y} for x, y in truth2]).write(
        f"{d}/manual2.pos")

    common = "--particleSize 28 --filter_num 4 --NPCA 3 --NCORR 2"
    # accumulate invariants from two manually picked micrographs
    run_pick(f"-i {d}/mic1.mrc --mode buildinv {d}/manual1.pos "
             f"--model {d}/model --outputRoot {d}/mic1 {common}")
    run_pick(f"-i {d}/mic2.mrc --mode buildinv {d}/manual2.pos "
             f"--model {d}/model --outputRoot {d}/mic2 {common}")
    z = np.load(f"{d}/model_training.npz")
    assert len(z["inv_pos"]) == len(truth1) + len(truth2)

    # train the classifier
    tr = run_pick(f"-i {d}/mic1.mrc --mode train --model {d}/model "
                  f"--outputRoot {d}/mic1 {common} --autoPercent 90")
    assert tr.train_accuracy > 0.9
    import os
    for suffix in ("_pca.npz", "_svm.npz", "_particle_avg.mrc"):
        assert os.path.exists(f"{d}/model{suffix}"), suffix
    assert os.path.exists(f"{d}/config.xmd")

    # autoselect on a fresh micrograph
    truth3 = [(70, 70), (190, 90), (110, 170), (210, 200)]
    mic3 = make_mic(rng, truth3)
    save_image(f"{d}/mic3.mrc", mic3)
    pk = run_pick(f"-i {d}/mic3.mrc --mode autoselect --model {d}/model "
                  f"--outputRoot {d}/mic3 {common} --autoPercent 90")
    md = MetaData(f"particles_auto@{d}/mic3.pos")
    pts = np.stack([np.asarray(md.getColumn("xcoor"), float),
                    np.asarray(md.getColumn("ycoor"), float)], 1)
    t = np.asarray(truth3, float)
    dmin = np.linalg.norm(pts[:, None] - t[None], axis=-1).min(axis=1)
    hits = {tuple(t[i]) for i in
            np.linalg.norm(pts[:, None] - t[None], axis=-1).argmin(axis=1)
            [dmin < 10]}
    assert len(hits) >= 3, f"found {len(hits)} of 4 particles: {pts}"
    # precision: most picks must be real particles
    assert (dmin < 10).sum() >= 0.6 * len(pts), pts

    # try mode also writes the feature-vector file
    run_pick(f"-i {d}/mic3.mrc --mode try --model {d}/model "
             f"--outputRoot {d}/mic3 {common}")
    assert os.path.exists(f"{d}/mic3_auto_feature_vectors.txt")

    # false-positive correction retrains a second classifier
    MetaData.fromRows([{"xcoor": 20, "ycoor": 230},
                       {"xcoor": 230, "ycoor": 20}]).write(
        f"{d}/mic3_false_positives.xmd")
    run_pick(f"-i {d}/mic3.mrc --mode train --model {d}/model "
             f"--outputRoot {d}/mic3 {common}")
    assert os.path.exists(f"{d}/model_svm2.npz")
