"""Full reference surface of xmipp_metadata_utilities.

Reference twin: libraries/reconstruction/metadata_utilities.cpp (grammar at
:54-142, semantics at :218-520) — set ops keyed on a join label, SQLite
modify_values / select expressions (MDSql::activateMathExtensions),
fill generators, file ops, and query aggregates.
"""
import math
import os

import numpy as np
import pytest

from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def run_prog(args):
    prog = get_program("metadata_utilities")
    rc = prog.run_with_args(args)
    assert rc == 0
    return prog


@pytest.fixture
def mds(tmp_path):
    a = str(tmp_path / "a.xmd")
    b = str(tmp_path / "b.xmd")
    MetaData.fromRows([
        {"image": f"img{i:03d}.spi", "angleRot": 10.0 * i, "cost": float(i)}
        for i in range(1, 7)]).write(a)
    MetaData.fromRows([
        {"image": f"img{i:03d}.spi", "weight": 0.5 * i}
        for i in (2, 4, 9)]).write(b)
    return a, b, str(tmp_path / "out.xmd")


# ---------------------------------------------------------------- set ops
def test_set_union_dedups_on_label(mds, tmp_path):
    a, _, out = mds
    c = str(tmp_path / "c.xmd")
    MetaData.fromRows([{"image": "img002.spi", "angleRot": 20.0,
                        "cost": 2.0},
                       {"image": "img099.spi", "angleRot": 0.0,
                        "cost": 9.0}]).write(c)
    run_prog(f"-i {a} -o {out} --set union {c} image")
    md = MetaData(out)
    assert md.size() == 7          # img002 duplicated value appears once
    run_prog(f"-i {a} -o {out} --set union_all {c} image")
    assert MetaData(out).size() == 8


def test_set_intersection_subtraction(mds):
    a, b, out = mds
    run_prog(f"-i {a} -o {out} --set intersection {b} image")
    assert MetaData(out).getColumnValues("image") == \
        ["img002.spi", "img004.spi"]
    run_prog(f"-i {a} -o {out} --set subtraction {b} image")
    assert MetaData(out).size() == 4


def test_set_join_and_natural_join(mds):
    a, b, out = mds
    run_prog(f"-i {a} -o {out} --set join {b} image")
    md = MetaData(out)
    assert md.size() == 2 and md.getColumnValues("weight") == [1.0, 2.0]
    run_prog(f"-i {a} -o {out} --set natural_join {b}")
    assert MetaData(out).size() == 2


def test_set_inner_join_two_labels(mds, tmp_path):
    a, _, out = mds
    c = str(tmp_path / "c.xmd")
    MetaData.fromRows([{"ref": f"img{i:03d}.spi", "score": float(i)}
                       for i in (1, 3)]).write(c)
    run_prog(f"-i {a} -o {out} --set inner_join {c} image ref")
    md = MetaData(out)
    assert md.size() == 2 and "ref" not in md.getActiveLabels()
    assert md.getColumnValues("score") == [1.0, 3.0]


def test_set_merge(mds, tmp_path):
    a, _, out = mds
    c = str(tmp_path / "c.xmd")
    MetaData.fromRows([{"extra": float(i)} for i in range(6)]).write(c)
    run_prog(f"-i {a} -o {out} --set merge {c}")
    assert MetaData(out).getColumnValues("extra") == [float(i)
                                                      for i in range(6)]


# ---------------------------------------------------------------- operate
def test_operate_sort_desc_and_percentile(mds):
    a, _, out = mds
    run_prog(f"-i {a} -o {out} --operate sort cost desc")
    assert MetaData(out).getValue("cost", 0) == 6.0
    run_prog(f"-i {a} -o {out} --operate percentile cost pmax")
    md = MetaData(out)
    assert np.allclose(md.getColumnValues("pmax"),
                       (np.arange(6) + 1) / 6.0)


def test_operate_modify_values_sqlite(mds):
    """The reference's own doc examples: radians(), sqrt(), replace(), ||
    (metadata_utilities.cpp:174-180)."""
    a, _, out = mds
    run_prog(f'-i {a} -o {out} --operate modify_values "angleRot=sin(radians(angleRot))"')
    got = MetaData(out).getColumnValues("angleRot")
    assert np.allclose(got, [math.sin(math.radians(10.0 * i))
                             for i in range(1, 7)])
    run_prog(f'-i {a} -o {out} --operate modify_values "image=replace(image, \'spi\', \'xmp\')"')
    assert MetaData(out).getValue("image", 0) == "img001.xmp"
    run_prog(f'-i {a} -o {out} --operate modify_values "image=\'dir/\'||image"')
    assert MetaData(out).getValue("image", 0) == "dir/img001.spi"


def test_operate_modify_values_where_clause(mds):
    a, _, out = mds
    run_prog(f'-i {a} -o {out} --operate modify_values "cost=0 WHERE angleRot>30"')
    assert MetaData(out).getColumnValues("cost") == [1.0, 2.0, 3.0, 0, 0, 0]


def test_operate_subsets(mds):
    a, _, out = mds
    run_prog(f"-i {a} -o {out} --operate random_subset 3")
    md = MetaData(out)
    assert md.size() == 3
    assert md.getColumnValues("image") == sorted(md.getColumnValues("image"))
    run_prog(f"-i {a} -o {out} --operate bootstrap")
    assert MetaData(out).size() == 6
    run_prog(f"-i {a} -o {out} --operate expand 3")
    assert MetaData(out).size() == 18
    run_prog(f"-i {out} -o {out} --operate remove_duplicates image")
    assert MetaData(out).size() == 6


def test_operate_columns(mds):
    a, _, out = mds
    run_prog(f"-i {a} -o {out} --operate keep_column \"image cost\"")
    assert MetaData(out).getActiveLabels() == ["image", "cost"]
    run_prog(f"-i {a} -o {out} --operate drop_column cost")
    assert "cost" not in MetaData(out).getActiveLabels()
    run_prog(f"-i {a} -o {out} --operate rename_column \"cost wRobust\"")
    labs = MetaData(out).getActiveLabels()
    assert "wRobust" in labs and "cost" not in labs


def test_operate_sort_vector_component(mds, tmp_path):
    a = str(tmp_path / "v.xmd")
    MetaData.fromRows([
        {"image": "a", "nmaDisplacements": np.array([3.0, 0.0])},
        {"image": "b", "nmaDisplacements": np.array([1.0, 5.0])},
        {"image": "c", "nmaDisplacements": np.array([2.0, 1.0])},
    ]).write(a)
    out = str(tmp_path / "o.xmd")
    run_prog(f"-i {a} -o {out} --operate sort nmaDisplacements:0")
    assert MetaData(out).getColumnValues("image") == ["b", "c", "a"]


# ------------------------------------------------------------------ query
def test_query_select_sql_and(mds):
    a, _, out = mds
    run_prog(f'-i {a} -o {out} --query select "angleRot > 15 AND cost < 5"')
    assert MetaData(out).getColumnValues("cost") == [2.0, 3.0, 4.0]


def test_query_count_and_sum(mds, tmp_path):
    a = str(tmp_path / "g.xmd")
    MetaData.fromRows([{"defocusGroup": i % 2, "count": 1.0 + i}
                       for i in range(6)]).write(a)
    out = str(tmp_path / "o.xmd")
    run_prog(f"-i {a} -o {out} --query count defocusGroup")
    md = MetaData(out)
    assert md.getColumnValues("count") == [3, 3]
    run_prog(f"-i {a} -o {out} --query sum defocusGroup count")
    assert MetaData(out).getColumnValues("sum") == [9.0, 12.0]


def test_query_prints(mds, capsys):
    a, _, _ = mds
    run_prog(f"-i {a} --query size")
    assert "size is: 6" in capsys.readouterr().out
    run_prog(f"-i {a} --query labels")
    assert "angleRot" in capsys.readouterr().out
    run_prog(f"-i {a} --query blocks")
    assert "noname" in capsys.readouterr().out
    assert MetaData(a).size() == 6   # print-only queries don't rewrite


# ------------------------------------------------------------------- fill
def test_fill_multi_label_and_student(mds):
    a, _, out = mds
    run_prog(f'-i {a} -o {out} --fill "shiftX shiftY" constant 5')
    md = MetaData(out)
    assert (md.getColumn("shiftX") == 5).all()
    assert (md.getColumn("shiftY") == 5).all()
    run_prog(f"-i {a} -o {out} --fill w lineal 1 2")
    assert MetaData(out).getColumnValues("w") == [1, 3, 5, 7, 9, 11]
    run_prog(f"-i {a} -o {out} --fill r rand_student 0 1 3")
    assert MetaData(out).size() == 6


def test_fill_expand(mds, tmp_path):
    ctf = str(tmp_path / "ctf.xmd")
    MetaData.fromRows([{"ctfDefocusU": 15000.0,
                        "ctfVoltage": 300.0}]).write(ctf)
    a = str(tmp_path / "parts.xmd")
    MetaData.fromRows([{"image": f"i{i}", "ctfModel": ctf}
                       for i in range(3)]).write(a)
    out = str(tmp_path / "o.xmd")
    run_prog(f"-i {a} -o {out} --fill ctfModel expand")
    md = MetaData(out)
    assert md.getColumnValues("ctfDefocusU") == [15000.0] * 3


# ------------------------------------------------------------------- file
def test_file_import_txt(tmp_path):
    txt = str(tmp_path / "cols.txt")
    with open(txt, "w") as fh:
        fh.write("# comment\n1 4.5 a.spi\n2 6.5 b.spi\n")
    out = str(tmp_path / "o.xmd")
    run_prog(f'-i {txt} -o {out} --file import_txt "itemId cost image"')
    md = MetaData(out)
    assert md.getColumnValues("itemId") == [1, 2]
    assert md.getColumnValues("image") == ["a.spi", "b.spi"]


def test_file_copy_rewrites_paths(tmp_path):
    src = tmp_path / "data"
    src.mkdir()
    for i in range(2):
        (src / f"f{i}.spi").write_bytes(b"x" * 8)
    a = str(tmp_path / "a.xmd")
    MetaData.fromRows([{"image": str(src / f"f{i}.spi")}
                       for i in range(2)]).write(a)
    dest = str(tmp_path / "new")
    out = str(tmp_path / "o.xmd")
    run_prog(f"-i {a} -o {out} --file copy {dest} image")
    assert sorted(os.listdir(dest)) == ["f0.spi", "f1.spi"]
    assert MetaData(out).getColumnValues("image") == ["f0.spi", "f1.spi"]


def test_file_delete(tmp_path):
    f = tmp_path / "kill.spi"
    f.write_bytes(b"x")
    a = str(tmp_path / "a.xmd")
    MetaData.fromRows([{"image": str(f)}]).write(a)
    run_prog(f"-i {a} --file delete image")
    assert not f.exists()


# -------------------------------------------------------------- mode/print
def test_mode_append_new_block(mds, tmp_path):
    a, _, _ = mds
    out = str(tmp_path / "multi.xmd")
    run_prog(f"-i {a} -o {out} --operate sort cost")
    run_prog(f"-i {a} -o b2@{out} --operate sort cost --mode append")
    assert MetaData.blocksInFile(out) == ["noname", "b2"]


def test_print(mds, capsys):
    a, _, _ = mds
    run_prog(f"-i {a} -o {a} --print")
    assert "img001.spi" in capsys.readouterr().out
