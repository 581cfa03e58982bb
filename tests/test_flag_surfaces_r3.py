"""Value tests for the round-3 long-tail flag surfaces.

Each test drives the real CLI with flags from the reference grammars
(docs/FLAG_AUDIT.md gaps closed this round): image_header geometry modes
(image_header.cpp:52-67), image_statistics save/print modes
(image_statistics.cpp:60-260), image_convert depth/append/swap
(xmipp_image_convert.cpp:85-134), metadata_split --use_correlation
(metadata_split.cpp:52-200), metadata_histogram 2D
(metadata_histogram.cpp:46-58), metadata_xml --extractParticlesMD
(metadata_xml.cpp:56-120), transform_add_noise limits
(transform_add_noise.cpp:56-57), pdb_analysis distance_histogram
(pdb_analysis.cpp:35-39), pdb_reduce_pseudoatoms intensity selection
(pdb_reduce_pseudoatoms.cpp:43-46).
"""
from __future__ import annotations

import numpy as np
import pytest

from xmipp3_tpu.core.image import (Image, get_image_sampling, read_spider_geo,
                                   save_image, write_spider)
from xmipp3_tpu.core.metadata import MetaData


def run_prog(name, args):
    from xmipp3_tpu.programs import get_program
    p = get_program(name)
    p.read([name] + args.split() if isinstance(args, str) else [name] + args)
    assert p.tryRun() == 0
    return p


@pytest.fixture()
def stack(tmp_path):
    rng = np.random.default_rng(0)
    stk = rng.normal(2.0, 3.0, (4, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "a.stk")
    write_spider(fn, stk)
    return fn, stk


def test_image_header_assign_extract_reset(stack, tmp_path):
    fn, _ = stack
    md = MetaData.fromRows(
        [{"image": f"{i + 1:06d}@{fn}", "angleRot": 10.0 * i,
          "angleTilt": 5.0, "anglePsi": 1.5, "shiftX": 2.7,
          "shiftY": -1.2} for i in range(4)])
    geo = str(tmp_path / "geo.xmd")
    md.write(geo)
    run_prog("image_header", f"-i {geo} --assign --round_shifts")
    g = read_spider_geo(fn)
    assert g[2]["angleRot"] == 20.0 and g[2]["shiftX"] == 3.0  # rounded
    out = str(tmp_path / "geo2.xmd")
    run_prog("image_header", f"-i {fn} --extract -o {out}")
    md2 = MetaData(out)
    assert abs(float(md2.getValue("angleRot", 3)) - 30.0) < 1e-5
    run_prog("image_header", f"-i {fn} --reset")
    assert read_spider_geo(fn)[2]["angleRot"] == 0.0


def test_image_header_sampling_rate(tmp_path):
    fn = str(tmp_path / "v.mrc")
    save_image(fn, np.zeros((8, 8), np.float32), sampling=1.0)
    run_prog("image_header", f"-i {fn} --sampling_rate 2.5")
    assert abs(get_image_sampling(fn) - 2.5) < 1e-5


def test_image_statistics_save_stats(stack, tmp_path):
    fn, stk = stack
    p = run_prog("image_statistics",
                 f"-i {fn} -o {tmp_path}/st.xmd --short_format "
                 f"--save_image_stats {tmp_path}/st_ -v 0")
    avg = Image(str(tmp_path / "st_average.xmp")).data
    assert abs(avg - stk.mean(0)).max() < 1e-4
    std = Image(str(tmp_path / "st_stddev.xmp")).data
    n = len(stk)
    expect = np.sqrt((stk.astype(np.float64) ** 2).mean(0)
                     - stk.mean(0) ** 2) * np.sqrt(n / (n - 1))
    assert abs(std - expect).max() < 1e-3
    md = MetaData(str(tmp_path / "st.xmd"))
    assert md.size() == 4 and md.containsLabel("stddev")
    assert abs(p.stats["avg"] - stk.mean()) < 1e-4


def test_image_statistics_masked(stack, tmp_path):
    fn, stk = stack
    p = run_prog("image_statistics",
                 f"-i {fn} --mask circular 6 --save_mask {tmp_path}/m.spi "
                 "-v 0")
    mask = Image(str(tmp_path / "m.spi")).data > 0
    expect = stk[:, mask].mean()
    assert abs(p.stats["avg"] - expect) < 1e-4


def test_image_convert_depth_and_append(stack, tmp_path):
    fn, _ = stack
    out = str(tmp_path / "b.mrcs")
    run_prog("image_convert", f"-i {fn} -o {out} --depth uint8 "
                              "--range_adjust")
    b = Image(out).data
    assert b.max() - b.min() >= 253          # full int8 container range
    out2 = str(tmp_path / "c.mrcs")
    run_prog("image_convert", f"-i {fn} -o {out2}")
    run_prog("image_convert", f"-i {fn} -o {out2} --append")
    assert Image(out2).header.n_images == 8


def test_image_convert_swap_roundtrips(stack, tmp_path):
    fn, stk = stack
    out = str(tmp_path / "d.mrc")
    run_prog("image_convert", f"-i {fn} -o {out} --swap big")
    data = Image(out).data                    # reader autodetects BE
    assert abs(np.squeeze(data) - stk).max() < 1e-5


def test_image_convert_oroot_oext(stack, tmp_path):
    fn, _ = stack
    run_prog("image_convert", f"-i {fn} --oroot {tmp_path}/p_ --oext spi")
    import os
    outs = sorted(f for f in os.listdir(tmp_path) if f.startswith("p_"))
    assert outs == [f"p_{i + 1:06d}.spi" for i in range(4)]


def test_metadata_split_use_correlation(tmp_path):
    # two clean correlation blocks -> the AHC coocurrence split recovers them
    cc = np.zeros((12, 8), np.float32)
    cc[:6, :4] = 1.0
    cc[6:, 4:] = 1.0
    fn_cc = str(tmp_path / "cc.vol")
    save_image(fn_cc, cc)
    md = MetaData.fromRows([{"image": f"p{i:03d}.spi"} for i in range(12)])
    fn = str(tmp_path / "in.xmd")
    md.write(fn)
    run_prog("metadata_split",
             f"-i {fn} -n 2 --oroot {tmp_path}/cc_ "
             f"--use_correlation {fn_cc} 20 4")
    a = set(MetaData(str(tmp_path / "cc_000001.xmd")).getColumn("image"))
    b = set(MetaData(str(tmp_path / "cc_000002.xmd")).getColumn("image"))
    assert {f"p{i:03d}.spi" for i in range(6)} in (a, b)


def test_metadata_histogram_2d(tmp_path):
    md = MetaData.fromRows([{"x1": float(i % 7), "x2": float(i % 3)}
                            for i in range(100)])
    fn = str(tmp_path / "h.xmd")
    md.write(fn)
    p = run_prog("metadata_histogram",
                 f"-i {fn} --col x1 --col2 x2 --steps 7 --steps2 3 "
                 f"--write_as_image {tmp_path}/h2.spi -o {tmp_path}/h2.xmd")
    assert p.hist2d.sum() == 100
    assert Image(str(tmp_path / "h2.spi")).data.shape == (7, 3)
    p1 = run_prog("metadata_histogram",
                  f"-i {fn} --col x1 --percentil 50 -v 0")
    assert p1.percentil == float(np.percentile(
        [float(i % 7) for i in range(100)], 50))


def test_metadata_xml_extract_particles(tmp_path):
    md = MetaData.fromRows(
        [{"micrograph": "mics/m1.mrc", "xcoor": 10, "ycoor": 20,
          "enabled": 1},
         {"micrograph": "mics/m2.mrc", "xcoor": 30, "ycoor": 40,
          "enabled": 1},
         {"micrograph": "mics/m2.mrc", "xcoor": 50, "ycoor": 60,
          "enabled": -1}])
    fn = str(tmp_path / "pick.xmd")
    md.write(fn)
    out = str(tmp_path / "pick.xml")
    run_prog("metadata_xml", f"-i {fn} -o {out} --extractParticlesMD")
    t = open(out).read()
    assert '<micrograph id="m1">' in t and 'x="30"' in t
    assert 'x="50"' not in t                   # disabled row dropped


def test_transform_add_noise_limits(tmp_path):
    fn = str(tmp_path / "z.spi")
    save_image(fn, np.zeros((32, 32), np.float32))
    out = str(tmp_path / "n.spi")
    run_prog("transform_add_noise",
             f"-i {fn} -o {out} --type gaussian 10 0 "
             "--limit0 -1 --limitF 2 --seed 7")
    d = Image(out).data
    assert d.min() >= -1.0 - 1e-5 and d.max() <= 2.0 + 1e-5


def test_pdb_analysis_distance_histogram(tmp_path):
    pdb = str(tmp_path / "m.pdb")
    with open(pdb, "w") as f:
        for i, (x, y, z) in enumerate([(0., 0., 0.), (1.5, 0., 0.),
                                       (0., 1.5, 0.), (10., 10., 10.)]):
            f.write(f"ATOM  {i + 1:5d}  CA  ALA A{i + 1:4d}    "
                    f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00  0.00           C\n")
    hist = str(tmp_path / "d.hist")
    p = run_prog("pdb_analysis",
                 f"-i {pdb} --operation distance_histogram {hist} 1 -1")
    centers, counts = p.hist
    # each of the three close atoms has a ~1.5A nearest neighbour
    peak = centers[np.argmax(counts)]
    assert 1.0 < peak < 3.0


def test_pdb_reduce_pseudoatoms_by_intensity(tmp_path):
    pdb = str(tmp_path / "ps.pdb")
    with open(pdb, "w") as f:
        for i in range(10):
            occ = (i + 1) / 10.0
            f.write(f"ATOM  {i + 1:5d}  CA  ALA A{i + 1:4d}    "
                    f"{float(i):8.3f}{0.0:8.3f}{0.0:8.3f}{occ:6.2f}"
                    f"  0.00           C\n")
    out = str(tmp_path / "red.pdb")
    run_prog("pdb_reduce_pseudoatoms", f"-i {pdb} -o {out} --number 3")
    from xmipp3_tpu.core.pdb import read_pdb
    m = read_pdb(out)
    assert len(m) == 3
    assert sorted(np.asarray(m.coords)[:, 0].tolist()) == [7.0, 8.0, 9.0]
    out2 = str(tmp_path / "red2.pdb")
    run_prog("pdb_reduce_pseudoatoms", f"-i {pdb} -o {out2} --threshold 0.55")
    assert len(read_pdb(out2)) == 5
