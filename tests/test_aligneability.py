"""Reference-surface tests for multireference_aligneability and
validation_nontilt (multireference_aligneability.cpp, validation_nontilt.cpp):
clustered Significant orientation clouds must score better than scattered
ones."""
import os

import numpy as np

from tests.test_batch3 import run_prog
from xmipp3_tpu.core.metadata import MetaData


def make_world(tmp_path, spread_good=3.0, spread_bad=60.0, n_parts=6,
               n_orient=8, seed=0):
    rng = np.random.default_rng(seed)
    true_rot = rng.uniform(0, 360, n_parts)
    true_tilt = rng.uniform(20, 160, n_parts)

    def cloud(spread):
        rows = []
        for i in range(n_parts):
            for _ in range(n_orient):
                rows.append({"imageIndex": i,
                             "image": f"{i + 1:06d}@parts.stk",
                             "angleRot": float(true_rot[i]
                                               + rng.normal(0, spread)),
                             "angleTilt": float(np.clip(
                                 true_tilt[i] + rng.normal(0, spread),
                                 1, 179)),
                             "anglePsi": float(rng.uniform(0, 360)),
                             "maxCC": float(rng.uniform(0.5, 1.0))})
        return rows

    gal = [{"angleRot": float(r), "angleTilt": float(t), "anglePsi": 0.0}
           for r in np.linspace(0, 350, 36)
           for t in np.linspace(10, 170, 9)]
    parts = [{"image": f"{i + 1:06d}@parts.stk",
              "angleRot": float(true_rot[i]),
              "angleTilt": float(true_tilt[i]), "anglePsi": 0.0,
              "maxCC": 1.0, "itemId": i + 1} for i in range(n_parts)]
    d = str(tmp_path)
    MetaData.fromRows(cloud(spread_good)).write(f"{d}/ang_ref.xmd")
    MetaData.fromRows(cloud(spread_bad)).write(f"{d}/ang_bad.xmd")
    MetaData.fromRows(gal).write(f"{d}/gallery.xmd")
    MetaData.fromRows(parts).write(f"{d}/parts.xmd")
    return d


def test_aligneability_reference_path(tmp_path):
    d = make_world(tmp_path)
    os.makedirs(f"{d}/good", exist_ok=True)
    os.makedirs(f"{d}/bad", exist_ok=True)
    # experimental cloud as clustered as the reference cloud -> precision ~1
    pg = run_prog("multireference_aligneability",
                  f"-i {d}/parts.xmd -i2 {d}/parts.xmd "
                  f"--angles_file {d}/ang_ref.xmd "
                  f"--angles_file_ref {d}/ang_ref.xmd "
                  f"--gallery {d}/gallery.xmd --odir {d}/good "
                  f"--sym c1 --check_mirrors -v 0")
    assert os.path.exists(f"{d}/good/pruned_particles_alignability.xmd")
    assert os.path.exists(f"{d}/good/validationAlignability.xmd")
    assert pg.summary["weightAlignabilityPrecision"] > 0.8
    assert pg.summary["weightAlignability"] > 0.8
    # scattered experimental cloud vs clustered reference -> low scores
    pb = run_prog("multireference_aligneability",
                  f"-i {d}/parts.xmd -i2 {d}/parts.xmd "
                  f"--angles_file {d}/ang_bad.xmd "
                  f"--angles_file_ref {d}/ang_ref.xmd "
                  f"--gallery {d}/gallery.xmd --odir {d}/bad "
                  f"--sym c1 --dontUseWeights -v 0")
    # scattered cloud scores below the >0.5 alignability threshold
    assert pb.precision.mean() < pg.precision.mean()
    assert pb.summary["weightAlignabilityPrecision"] < \
        pg.summary["weightAlignabilityPrecision"]
    md = MetaData(f"{d}/good/pruned_particles_alignability.xmd")
    r = next(md.iterRows())
    for lab in ("scoreByAlignabilityPrecision", "scoreByAlignabilityAccuracy",
                "scoreByMirror", "scoreByAlignabilityNoise"):
        assert np.isfinite(float(r[lab])), lab


def test_validation_nontilt_reference_path(tmp_path):
    d = make_world(tmp_path, n_parts=4)
    os.makedirs(f"{d}/vg", exist_ok=True)
    os.makedirs(f"{d}/vb", exist_ok=True)
    pg = run_prog("validation_nontilt",
                  f"--i {d}/ang_ref.xmd --volume vol.vol --odir {d}/vg "
                  f"--sym c1 --useSignificant --significance_noise 0.95 "
                  f"-v 0")
    pb = run_prog("validation_nontilt",
                  f"--i {d}/ang_bad.xmd --volume vol.vol --odir {d}/vb "
                  f"--sym c1 --useSignificant -v 0")
    assert os.path.exists(f"{d}/vg/clusteringTendency.xmd")
    assert os.path.exists(f"{d}/vg/validation.xmd")
    # clustered orientation clouds have higher clustering tendency
    assert pg.P.mean() > pb.P.mean()
    assert pg.score >= pb.score
