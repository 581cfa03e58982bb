"""Transliteration of the MetaDataDb-only gtests
(applications/tests/function_tests/test_metadata_db_main.cpp — the 24
cases absent from test_metadata_vec_main.cpp): relational joins, set
operations, aggregates, operate expressions, fillExpand, and the sqlite
block container. Fixtures mirror the gtest SetUp exactly:
mDsource = {(x,y)} = (1,2),(3,4); mDjoin = {(x,z)} = (1,222),(3,444);
mDanotherSource = (11,22),(33,44); mDunion = source + anotherSource."""
import numpy as np
import pytest

from xmipp3_tpu.core.metadata import MetaData


def _md(rows):
    md = MetaData()
    for r in rows:
        md.addRow(r)
    return md


@pytest.fixture
def fx():
    src = _md([{"x": 1.0, "y": 2.0}, {"x": 3.0, "y": 4.0}])
    join = _md([{"x": 1.0, "z": 222.0}, {"x": 3.0, "z": 444.0}])
    another = _md([{"x": 11.0, "y": 22.0}, {"x": 33.0, "y": 44.0}])
    union = _md([{"x": 1.0, "y": 2.0}, {"x": 3.0, "y": 4.0},
                 {"x": 11.0, "y": 22.0}, {"x": 33.0, "y": 44.0}])
    return src, join, another, union


def _rows(md, labels):
    return [tuple(md.getValue(lb, i) for lb in labels) for i in md]


def test_left_join(fx):
    # MetadataTest.LeftJoin: join1 on x adds z = 222, 444
    src, join, _, _ = fx
    out = MetaData().join1(src, join, "x")
    assert _rows(out, ["x", "y", "z"]) == [(1, 2, 222), (3, 4, 444)]


def test_inner_join1(fx):
    # InnerJoin1: left.x == right.z, right's psi carried over
    src, _, _, _ = fx
    right = _md([{"z": 1.0, "anglePsi": 11.0}])
    out = MetaData().join2(src, right, "x", "z", "inner")
    assert _rows(out, ["x", "y", "anglePsi"]) == [(1, 2, 11)]


def test_inner_join2_collision_left_wins(fx):
    # InnerJoin2: right.y collides with left.y -> dropped
    src, _, _, _ = fx
    right = _md([{"z": 1.0, "y": 11.0}])
    out = MetaData().join2(src, right, "x", "z", "inner")
    assert sorted(out.getActiveLabels()) == ["x", "y"]
    assert _rows(out, ["x", "y"]) == [(1, 2)]


def test_natural_join(fx):
    # NaturalJoin: join on all common labels (x, y)
    src, _, _, _ = fx
    other = _md([{"x": 1.0, "y": 2.0, "z": 222.0},
                 {"x": 3.0, "y": 4.0, "z": 333.0},
                 {"x": 5.0, "y": 6.0, "z": 444.0}])
    out = MetaData().joinNatural(src, other)
    assert _rows(out, ["x", "y", "z"]) == [(1, 2, 222), (3, 4, 333)]


def test_join_vector_multi_label_duplicates(fx):
    # JoinVector: join1 on [x, y]; one left row matches two right rows,
    # and the right's colliding z column loses to the left's
    left = _md([{"x": 1.0, "y": 2.0, "z": 3.0, "angleRot": 0.0},
                {"x": 3.0, "y": 4.0, "z": 5.0, "angleRot": 180.0}])
    right = _md([{"x": 1.0, "y": 2.0, "z": 222.0},
                 {"x": 3.0, "y": 4.0, "z": 333.0},
                 {"x": 3.0, "y": 4.0, "z": 444.0}])
    out = MetaData().join1(left, right, ["x", "y"], "left")
    assert _rows(out, ["x", "y", "z", "angleRot"]) == [
        (1, 2, 3, 0), (3, 4, 5, 180), (3, 4, 5, 180)]


def test_intersection(fx):
    src, _, _, union = fx
    union.intersection(src, "x")
    assert _rows(union, ["x", "y"]) == [(1, 2), (3, 4)]


def test_subtraction(fx):
    src, _, another, union = fx
    union.subtraction(another, "x")
    assert _rows(union, ["x", "y"]) == [(1, 2), (3, 4)]


def test_union(fx):
    src, _, another, union = fx
    src.unionAll(another)
    assert _rows(src, ["x", "y"]) == _rows(union, ["x", "y"])


def test_merge(fx):
    # Merge: column-zip z onto source == join1 result
    src, join, _, _ = fx
    z = _md([{"z": 222.0}, {"z": 444.0}])
    src.merge(z)
    ref = MetaData().join1(_md([{"x": 1.0, "y": 2.0},
                                {"x": 3.0, "y": 4.0}]), join, "x")
    assert _rows(src, ["x", "y", "z"]) == _rows(ref, ["x", "y", "z"])


def test_operate(fx):
    _, _, _, union = fx
    expected = [2 * v for v in union.getColumnValues("x")]
    union.operate("x=2*x")
    assert union.getColumnValues("x") == expected


def test_operate_math_extension(fx):
    _, _, _, union = fx
    expected = np.sqrt(np.array(union.getColumnValues("x")))
    union.operate("x=sqrt(x)")
    assert np.allclose(union.getColumnValues("x"), expected)


def test_select_import_objects(fx):
    src, _, _, _ = fx
    out = MetaData()
    out.importObjects(src, "x>2")
    assert _rows(out, ["x", "y"]) == [(3, 4)]


def test_distinct():
    src = _md([{"x": 1.0, "y": 2.0}, {"x": 3.0, "y": 4.0},
               {"x": 1.0, "y": 2.0}])
    out = MetaData().distinct(src, "x")
    assert out.getActiveLabels() == ["x"]
    assert out.getColumnValues("x") == [1, 3]


def test_aggregate1():
    md = _md([{"order_": 1, "y": 2.0, "defGroup": 2},
              {"order_": 1, "y": 4.0, "defGroup": 23}])
    out = MetaData().aggregateOn(md, "count", "order_", "order_", "count")
    assert out.getValue("count", out.firstObject()) == 2
    out2 = MetaData().aggregateOn(md, "count", "y", "y", "count")
    assert out2.getValue("count", out2.firstObject()) == 1
    # aggregateSingle variants
    assert md.aggregate("max", "y") == 4
    assert md.aggregate("max", "order_") == 1
    assert md.aggregate("max", "defGroup") == 23


def test_aggregate2_multi():
    md = _md([{"order_": 1, "y": 2.0}, {"order_": 1, "y": 4.0},
              {"order_": 2, "y": 2.0}])
    out = MetaData().aggregateMulti(
        md, ["count", "sum", "min", "max", "mean"],
        ["order_", "order_", "y", "y", "y"],
        ["order_", "count", "sum", "min", "max", "avg"])
    assert _rows(out, ["order_", "count", "sum", "min", "max", "avg"]) == [
        (1, 2, 2, 2, 4, 3), (2, 1, 2, 2, 2, 2)]


def test_aggregate_group_by():
    md = _md([{"order_": 1, "defGroup": 2, "y": 2.0},
              {"order_": 1, "defGroup": 2, "y": 4.0},
              {"order_": 2, "defGroup": 2, "y": 2.0}])
    out = MetaData().aggregateGroupBy(md, "count", ["order_", "defGroup"],
                                      "y", "count")
    assert _rows(out, ["order_", "defGroup", "count"]) == [
        (1, 2, 2), (2, 2, 1)]


def test_fill_expand(tmp_path):
    # FillExpand: rows referencing per-row CTF metadata files
    ctf1 = str(tmp_path / "ctf1.xmd")
    ctf2 = str(tmp_path / "ctf2.xmd")
    for fn, defu in ((ctf1, 1000.0), (ctf2, 1500.0)):
        m = _md([{"ctfSamplingRate": 1.0, "ctfVoltage": 100.0,
                  "ctfDefocusU": defu}])
        m.row_format = False
        m.write(fn)
    md = _md([{"image": "image1", "ctfModel": ctf1},
              {"image": "image2", "ctfModel": ctf1},
              {"image": "image3", "ctfModel": ctf2}])
    md.fillExpand("ctfModel")
    assert md.getColumnValues("ctfDefocusU") == [1000.0, 1000.0, 1500.0]
    assert md.getColumnValues("ctfVoltage") == [100.0] * 3
    assert md.getColumnValues("image") == ["image1", "image2", "image3"]


def test_add_index_noop(fx):
    _, _, _, union = fx
    union.addIndex("x")          # AddIndex gtest: just must not fail
    assert len(union) == 4


def test_exists_block(tmp_path, fx):
    src, _, _, _ = fx
    fn = str(tmp_path / "t.xmd")
    src.write(f"kk@{fn}")
    assert MetaData.existsBlock(f"kk@{fn}") is True
    assert MetaData.existsBlock(f"kk2@{fn}") is False


def test_multi_write_sqlite(tmp_path):
    # multiWriteSqlite: block tables, append keeps others, rewrite
    # replaces, block list in insertion order
    fn = str(tmp_path / "m.sqlite")
    md = _md([{"order_": 1, "defGroup": 2, "y": 2.0},
              {"order_": 1, "defGroup": 2, "y": 4.0},
              {"order_": 2, "defGroup": 2, "y": 2.0}])
    md.setValue("order_", 11, md.firstObject())
    md.write(f"block001@{fn}")
    back = MetaData(f"block001@{fn}")
    assert _rows(back, ["order_", "y"]) == _rows(md, ["order_", "y"])

    md.setValue("order_", 22, md.firstObject())
    md.write(f"block002@{fn}", append=True)
    assert _rows(MetaData(f"block002@{fn}"), ["order_", "y"]) == \
        _rows(md, ["order_", "y"])

    md.setValue("order_", 33, md.firstObject())
    md.write(f"block003@{fn}", append=True)
    md.setValue("order_", 44, md.firstObject())
    md.write(f"block003@{fn}", append=True)     # replaces block003
    assert _rows(MetaData(f"block003@{fn}"), ["order_", "y"]) == \
        _rows(md, ["order_", "y"])
    assert MetaData.blocksInFile(fn) == ["block001", "block002", "block003"]


def test_add_rows_equals_source(fx):
    # AddRows: batch row insertion equals per-value construction
    src, _, _, _ = fx
    md = _md([{"x": 1.0, "y": 2.0}, {"x": 3.0, "y": 4.0}])
    assert _rows(md, ["x", "y"]) == _rows(src, ["x", "y"])
