"""De-aliased algorithms (VERDICT #9): image_eliminate_byEnergy variance
z-test (reference image_eliminate_byEnergy.cpp), classify_first_split3
stochastic 2-volume K-means (classify_first_split3.cpp), and the
wavelet-space angular_continuous_assign (angular_continuous_assign.h:39)."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def test_eliminate_by_energy(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(0)
    imgs = 0.95 * rng.standard_normal((20, 16, 16)).astype(np.float32)
    imgs[3] *= 8.0
    imgs[7] *= 0.01
    Image(imgs).write(d + "/e.stk")
    MetaData.fromRows([{"image": f"{i+1:06d}@{d}/e.stk"}
                       for i in range(20)]).write(d + "/e.xmd")
    p = get_program("image_eliminate_byEnergy")
    p.read(["x", "-i", d + "/e.xmd", "-o", d + "/eo.xmd"])
    assert p.tryRun() == 0
    kept = [str(r["image"]) for r in MetaData(d + "/eo.xmd").iterRows()]
    assert f"{4:06d}@{d}/e.stk" not in kept
    assert f"{8:06d}@{d}/e.stk" not in kept
    assert len(kept) >= 16


def test_classify_first_split3(tmp_path):
    from xmipp3_tpu.core.sampling import compute_sampling_points
    from xmipp3_tpu.ops.project import FourierProjector
    d = str(tmp_path)
    rng = np.random.default_rng(0)
    n = 24
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vA = np.exp(-((x - 3) ** 2 + y ** 2 + z ** 2) / 10).astype(np.float32)
    vB = np.exp(-((x + 3) ** 2 + (y - 2) ** 2 + z ** 2) / 6).astype(np.float32)
    angles = compute_sampling_points(30.0)
    projs = []
    for v in (vA, vB):
        P = np.asarray(FourierProjector(v).project_euler(
            angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
            np.zeros(len(angles), np.float32)))
        projs.append(P + 0.02 * rng.standard_normal(P.shape)
                     .astype(np.float32))
    allp = np.concatenate(projs)
    Image(allp).write(d + "/cls.stk")
    labels = np.array([0] * len(angles) + [1] * len(angles))
    MetaData.fromRows([
        {"image": f"{i+1:06d}@{d}/cls.stk",
         "angleRot": float(angles[i % len(angles), 0]),
         "angleTilt": float(angles[i % len(angles), 1]), "anglePsi": 0.0}
        for i in range(len(allp))]).write(d + "/cls.xmd")
    p = get_program("classify_first_split3")
    p.read(["x", "-i", d + "/cls.xmd", "--oroot", d + "/sp",
            "--Niter", "3000"])
    assert p.tryRun() == 0
    m1 = MetaData(d + "/sp_avg1.xmd")
    m2 = MetaData(d + "/sp_avg2.xmd")
    i1 = [int(str(r["image"]).split("@")[0]) - 1 for r in m1.iterRows()]
    i2 = [int(str(r["image"]).split("@")[0]) - 1 for r in m2.iterRows()]
    pur = max(np.mean(labels[i1] == 0) + np.mean(labels[i2] == 1),
              np.mean(labels[i1] == 1) + np.mean(labels[i2] == 0)) / 2
    assert pur >= 0.8


def test_wavelet_continuous_assign(tmp_path):
    from xmipp3_tpu.ops.project import FourierProjector
    d = str(tmp_path)
    n = 24
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = np.exp(-((x - 3) ** 2 + y ** 2 + z ** 2) / 10).astype(np.float32)
    Pr = np.asarray(FourierProjector(vol).project_euler(
        np.array([30., 70.], np.float32), np.array([40., 20.], np.float32),
        np.array([0., 0.], np.float32)))
    Image(Pr).write(d + "/w.stk")
    MetaData.fromRows([
        {"image": f"{i+1:06d}@{d}/w.stk", "angleRot": [33., 67.][i],
         "angleTilt": [37., 23.][i], "anglePsi": 2.0}
        for i in range(2)]).write(d + "/w.xmd")
    Image(vol).write(d + "/v.vol")
    p = get_program("angular_continuous_assign")
    p.read(["x", "-i", d + "/w.xmd", "-o", d + "/wo.xmd",
            "--ref", d + "/v.vol", "--steps", "40"])
    assert p.tryRun() == 0
    out = MetaData(d + "/wo.xmd")
    r0 = out.getRow(out.firstObject())
    assert abs(float(r0["angleRot"]) - 30) < 2.5
    assert float(r0["cost"]) > 0.99
