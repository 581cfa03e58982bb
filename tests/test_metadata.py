import os

import numpy as np
import pytest

from xmipp3_tpu.core.metadata import MetaData, compare_two_metadata_files
from xmipp3_tpu.core.star import read_star


def test_read_simple(reference_resources):
    fn = os.path.join(reference_resources, "metadata", "mDsource.xmd")
    md = MetaData(fn)
    assert md.size() == 2
    assert md.getActiveLabels() == ["x", "y"]
    assert md.getValue("x", md.firstObject()) == 1.0
    assert list(md.getColumn("y")) == [2.0, 4.0]


def test_read_blocks(reference_resources):
    fn = os.path.join(reference_resources, "metadata", "ReadWriteAppendBlock.xmd")
    assert MetaData.blocksInFile(fn) == ["one", "two", "three"]
    md = MetaData(f"two@{fn}")
    assert md.size() == 2
    assert md.getValue("x", 1) == 3.0


def test_row_format_block(reference_resources):
    fn = os.path.join(reference_resources, "sampling", "ref_sampling.xmd")
    md = MetaData(f"extra@{fn}")
    assert md.row_format
    assert md.getValue("sampling_rate", 0) == pytest.approx(0.0523599)
    assert md.getValue("pointsAsymmetricUnit", 0) == 4412
    md2 = MetaData(f"projectionDirectionsSphere@{fn}")
    assert md2.size() > 100
    assert md2.getValue("angleTilt", 2) == pytest.approx(3.020713)


def test_write_roundtrip(tmp_path):
    md = MetaData()
    for i in range(3):
        md.addRow({"image": f"{i+1:06d}@stack.mrcs", "angleRot": 10.0 * i,
                   "enabled": 1, "itemId": i + 1})
    out = str(tmp_path / "out.xmd")
    md.write(out)
    md2 = MetaData(out)
    assert md2.size() == 3
    assert md2.getColumnValues("image")[2] == "000003@stack.mrcs"
    assert md2.getValue("angleRot", 1) == 10.0
    assert md2.getValue("enabled", 0) == 1
    assert compare_two_metadata_files(out, out)


def test_write_multiblock_append(tmp_path):
    out = str(tmp_path / "blocks.xmd")
    md = MetaData()
    md.addRow({"x": 1.0})
    md.write(f"one@{out}")
    md2 = MetaData()
    md2.addRow({"x": 2.0})
    md2.write(f"two@{out}", append=True)
    assert MetaData.blocksInFile(out) == ["one", "two"]
    assert MetaData(f"two@{out}").getValue("x", 0) == 2.0


def test_union_sort_gather_semantics(tmp_path):
    # models the MPI gather contract: per-rank partial MDs merged + sorted by
    # itemId give a deterministic result independent of worker count
    parts = []
    for rank in range(3):
        md = MetaData()
        for i in range(rank, 9, 3):
            md.addRow({"itemId": i + 1, "cost": float(i)})
        parts.append(md)
    merged = MetaData()
    for p in parts:
        merged.unionAll(p)
    merged.sort("itemId")
    assert list(merged.getColumn("itemId")) == list(range(1, 10))


def test_vector_labels(tmp_path):
    md = MetaData()
    md.addRow({"sphCoefficients": np.array([1.5, -2.0, 3.0]), "itemId": 1})
    out = str(tmp_path / "vec.xmd")
    md.write(out)
    md2 = MetaData(out)
    np.testing.assert_allclose(md2.getValue("sphCoefficients", 0),
                               [1.5, -2.0, 3.0])


def test_unknown_labels_tolerated(reference_resources):
    fn = os.path.join(reference_resources, "metadata", "noXmipp.xmd")
    md = MetaData(fn)  # must not raise
    assert md.size() >= 1


def test_legacy_sel_and_doc(tmp_path):
    sel = str(tmp_path / "old.sel")
    open(sel, "w").write("img0001.xmp 1\nimg0002.xmp -1\n")
    md = MetaData(sel)
    assert md.size() == 2
    assert md.getValue("image", 0) == "img0001.xmp"
    assert md.getValue("enabled", 1) == -1
    doc = str(tmp_path / "old.doc")
    open(doc, "w").write("; psi rot tilt\n 1 3 10.5 20.0 30.0\n"
                         " 2 3 -5.0 0.0 90.0\n")
    md2 = MetaData(doc)
    assert md2.size() == 2
    assert md2.getValue("anglePsi", 0) == 10.5
    assert md2.getValue("angleTilt", 1) == 90.0
