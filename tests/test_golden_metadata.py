"""Transliteration of the reference MetaData gtest suite
(applications/tests/function_tests/test_metadata_vec_main.cpp) with the
reference's own fixtures (resources/test/metadata/*.xmd) and embedded
expected values. Covers the behavioral contract of the L0 metadata store:
sort windows, split, selectPart, removeDuplicates, queries, block
addressing (regex reads, append/in-place block writes), randomize."""
import os
import shutil

import numpy as np
import pytest

from xmipp3_tpu.core.metadata import MetaData, compare_two_metadata_files
from xmipp3_tpu.core.star import read_star


def md_source():
    """The gtest fixture mDsource: x=[1,3], y=[2,4]
    (test_metadata_vec_main.cpp:33-42)."""
    return MetaData([{"x": 1.0, "y": 2.0}, {"x": 3.0, "y": 4.0}])


def assert_md_equal(a: MetaData, b: MetaData):
    assert list(a.getActiveLabels()) == list(b.getActiveLabels())
    assert a.size() == b.size()
    for lab in a.getActiveLabels():
        assert np.allclose(np.asarray(a.getColumnValues(lab), np.float64),
                           np.asarray(b.getColumnValues(lab), np.float64))


def test_union_all_matches_fixture_values():
    # SetUp mDunion (test_metadata_vec_main.cpp:52-61)
    md = md_source()
    md.unionAll(MetaData([{"x": 11.0, "y": 22.0}, {"x": 33.0, "y": 44.0}]))
    assert md.getColumnValues("x") == [1.0, 3.0, 11.0, 33.0]
    assert md.getColumnValues("y") == [2.0, 4.0, 22.0, 44.0]


def test_get_value_and_default():
    # GetValue (test_metadata_vec_main.cpp:84-112)
    md = MetaData()
    oid = md.addRow({"x": 10.0})
    assert md.getValue("x", oid) == 10.0
    row = md.getRow(oid)
    assert row.getValue("x") == 10.0
    assert row.getValue("y", 0.0) == 0.0   # getValueOrDefault


def test_sort_with_limit_and_offset():
    # Sort (test_metadata_vec_main.cpp:975-1011)
    md = MetaData([{"x": 3.0, "y": 4.0}, {"x": 1.0, "y": 2.0}])
    md.sort("x")
    assert_md_equal(md, md_source())

    md = MetaData([{"x": 3.0, "y": 4.0}, {"x": 1.0, "y": 2.0},
                   {"x": 5.0, "y": 6.0}])
    m1 = md.copy()
    m1.sort("x", True, 1, 0)
    assert m1.getColumnValues("x") == [1.0] and \
        m1.getColumnValues("y") == [2.0]
    m2 = md.copy()
    m2.sort("x", True, 2, 1)
    assert m2.getColumnValues("x") == [3.0, 5.0]
    assert m2.getColumnValues("y") == [4.0, 6.0]


def test_split_matches_reference_values():
    # split (test_metadata_vec_main.cpp:1258-1295)
    md = MetaData([{"x": float(v)} for v in (3, 2, 1, 0)])
    parts = md.split(1, "x")
    assert len(parts) == 1
    assert parts[0].getColumnValues("x") == [0.0, 1.0, 2.0, 3.0]
    # source untouched
    assert md.getColumnValues("x") == [3.0, 2.0, 1.0, 0.0]

    parts = md.split(2, "x")
    assert [p.size() for p in parts] == [2, 2]
    assert parts[0].getColumnValues("x") == [0.0, 1.0]
    assert parts[1].getColumnValues("x") == [2.0, 3.0]

    parts = md.split(3, "x")
    assert len(parts) == 3
    assert all(1 <= p.size() <= 2 for p in parts)
    assert sum(p.size() for p in parts) == 4


def test_select_part_matches_reference_values():
    # selectPart (test_metadata_vec_main.cpp:1325-1347)
    md = MetaData([{"x": 0.0}, {"x": 1.0}])
    for i in range(2):
        part = MetaData()
        part.selectPart(md, i, 1, "objId")
        assert part.size() == 1
        assert part.getColumnValues("x") == [float(i)]
    part = MetaData()
    part.selectPart(md, 0, 2, "objId")
    assert part.getColumnValues("x") == [0.0, 1.0]


def test_remove_duplicates_matches_reference_values():
    # RemoveDuplicates (test_metadata_vec_main.cpp:917-931)
    md3 = MetaData([{"x": 1.0, "y": 2.0}, {"x": 3.0, "y": 4.0},
                    {"x": 1.0, "y": 2.0}])
    md1 = MetaData()
    md1.removeDuplicates(md3)
    assert_md_equal(md1, md_source())


def test_remove_label_and_column_values():
    # Removelabel (test_metadata_vec_main.cpp:933-968)
    md = md_source()
    md.unionAll(MetaData([{"x": 11.0, "y": 22.0}, {"x": 33.0, "y": 44.0}]))
    assert md.containsLabel("x")
    assert md.getColumnValues("x") == [1.0, 3.0, 11.0, 33.0]
    md.removeLabel("x")
    assert not md.containsLabel("x")
    assert md.getColumnValues("y") == [2.0, 4.0, 22.0, 44.0]
    md.setColumnValues("z", [0.0, 1.0, 2.0, 3.0])
    assert md.getColumnValues("z") == [0.0, 1.0, 2.0, 3.0]
    md.setColumnValues("x", [1.0, 2.0, 3.0, 4.0])
    assert md.getColumnValues("x") == [1.0, 2.0, 3.0, 4.0]
    assert md.getColumnValues("z") == [0.0, 1.0, 2.0, 3.0]


def test_query_and_multi_query_match_reference_values():
    # Query / MultiQuery / MDValueEQ (test_metadata_vec_main.cpp:551-612,676)
    md3 = MetaData([{"x": 1.0, "y": 2.0, "z": 222.0},
                    {"x": 3.0, "y": 4.0, "z": 333.0},
                    {"x": 3.0, "y": 4.0, "z": 444.0}])
    out = MetaData()
    out.importObjects(md3, "")            # empty query = everything
    assert_md_equal(out, md3)
    out.importObjects(md3, "x == 3 and y == 4")   # MDMultiQuery of two EQs
    assert out.getColumnValues("z") == [333.0, 444.0]
    out.importObjects(md3, "x == 3")              # single MDValueEQ
    assert out.getColumnValues("z") == [333.0, 444.0]
    # MDValueEQ on strings (test_metadata_vec_main.cpp:594-612)
    md = MetaData([{"image": s} for s in ("a", "b", "c", "a")])
    out.importObjects(md, "image == 'a'")
    assert out.getColumnValues("image") == ["a", "a"]


def test_randomize_changes_order():
    # Randomize (test_metadata_vec_main.cpp:709-727)
    md = md_source()
    out = MetaData()
    for seed in range(50):
        out.randomize(md, seed=seed)
        assert sorted(out.getColumnValues("x")) == [1.0, 3.0]
        if out.getColumnValues("x") != md.getColumnValues("x"):
            return
    pytest.fail("randomize never changed the row order in 50 tries")


def test_get_blocks_in_metadata(tmp_path):
    # GetBlocksInMetadata (test_metadata_vec_main.cpp:375-406)
    sfn = str(tmp_path / "blocks.xmd")
    md = MetaData([{"image": "image_1.xmp"}, {"image": "image_2.xmp"}])
    md.write(sfn)
    for b in ("block_000001", "block_000002"):
        tag = b.split("_")[1]
        md = MetaData([{"image": f"image_data_{int(tag)}_1.xmp"},
                       {"image": f"image_data_{int(tag)}_2.xmp"}])
        md.write(f"{b}@{sfn}", append=True)
    assert MetaData.blocksInFile(sfn) == ["noname", "block_000001",
                                          "block_000002"]


def test_block_regular_expression_read(tmp_path):
    # CheckRegularExpression (test_metadata_vec_main.cpp:408-449)
    sfn = str(tmp_path / "re.xmd")
    MetaData([{"image": "image_1.xmp"},
              {"image": "image_2.xmp"}]).write(sfn)
    for b, tag in [("block_000001", "1"), ("block_000002", "2"),
                   ("block_000003", "3"), ("block_A", "A")]:
        MetaData([{"image": f"image_data_{tag}_1.xmp"},
                  {"image": f"image_data_{tag}_2.xmp"}]
                 ).write(f"{b}@{sfn}", append=True)
    got = MetaData(f"block_000[0-9][0-9][123]@{sfn}")
    assert got.getColumnValues("image") == [
        "image_data_1_1.xmp", "image_data_1_2.xmp",
        "image_data_2_1.xmp", "image_data_2_2.xmp",
        "image_data_3_1.xmp", "image_data_3_2.xmp"]


def test_read_empty_blocks(tmp_path):
    # ReadEmptyBlock / ReadEmptyBlocksII (test_metadata_vec_main.cpp:356,824)
    sfn = str(tmp_path / "empty.xmd")
    MetaData().write(f"block_Empty@{sfn}")
    MetaData([{"image": "image_data_2_1.xmp"},
              {"image": "image_data_2_2.xmp"}]).write(f"block_B1@{sfn}",
                                                      append=True)
    md = MetaData(f"block_Empty@{sfn}")
    assert md.size() == 0


def test_read_write_roundtrip_against_reference_fixture(reference_resources):
    # ReadWrite + the mDsource.xmd fixture file itself
    md = MetaData(os.path.join(reference_resources, "metadata",
                               "mDsource.xmd"))
    assert_md_equal(md, md_source())


def test_read_write_append_block_matches_reference_golden(
        tmp_path, reference_resources):
    # ReadWriteAppendBlock (test_metadata_vec_main.cpp:901-915): writing
    # one@, two@, three@ MD_APPEND must produce the reference's golden
    # ReadWriteAppendBlock.xmd (compared semantically)
    sfn = str(tmp_path / "append.xmd")
    src = md_source()
    src.write(f"one@{sfn}")
    src.write(f"two@{sfn}", append=True)
    src.write(f"three@{sfn}", append=True)
    golden = os.path.join(reference_resources, "metadata",
                          "ReadWriteAppendBlock.xmd")
    ours, ref = read_star(sfn), read_star(golden)
    assert [b.name for b in ours] == [b.name for b in ref]
    for bo, br in zip(ours, ref):
        assert np.allclose(bo.df.to_numpy(np.float64),
                           br.df.to_numpy(np.float64))


def test_write_intermediate_block_matches_reference_golden(
        tmp_path, reference_resources):
    # WriteIntermediateBlock (test_metadata_vec_main.cpp:858-899): modify
    # block 'two' of the fixture in place; the result must equal the
    # reference golden WriteIntermediateBlock2.xmd with blocks in file order
    fixture = os.path.join(reference_resources, "metadata",
                           "WriteIntermediateBlock.xmd")
    sfn = str(tmp_path / "wib.xmd")
    shutil.copy(fixture, sfn)
    md = MetaData(f"two@{fixture}")
    md.addRow({"x": 11.0, "y": 22.0})
    md.addRow({"x": 33.0, "y": 44.0})
    md.setValue("x", 111.0, md.firstObject())
    md.write(f"two@{sfn}", append=True)
    golden = os.path.join(reference_resources, "metadata",
                          "WriteIntermediateBlock2.xmd")
    ours, ref = read_star(sfn), read_star(golden)
    assert [b.name for b in ours] == [b.name for b in ref] == \
        ["one", "two", "three"]
    for bo, br in zip(ours, ref):
        assert np.allclose(bo.df.to_numpy(np.float64),
                           br.df.to_numpy(np.float64))


def test_compare_two_metadata_files(tmp_path):
    # compareTwoMetadataFiles (test_metadata_vec_main.cpp:488-541)
    f1, f2 = str(tmp_path / "a.xmd"), str(tmp_path / "b.xmd")
    md_source().write(f1)
    md_source().write(f2)
    assert compare_two_metadata_files(f1, f2)
    changed = md_source()
    changed.setValue("x", 99.0, changed.firstObject())
    changed.write(f2)
    assert not compare_two_metadata_files(f1, f2)


def test_similar_to_operator_precision():
    # SimilarToOperator (test_metadata_vec_main.cpp:128-157): attribute
    # order must not matter; precission 2 makes 2.001 == 2.0, precission
    # 4 does not
    src = md_source()
    other = MetaData([{"x": 11.0, "y": 22.0}, {"x": 33.0, "y": 44.0}])
    assert src == md_source()
    assert not (src == other)
    reordered = MetaData([{"y": 2.0, "x": 1.0}, {"y": 4.0, "x": 3.0}])
    assert reordered == src
    close = MetaData([{"y": 2.001, "x": 1.0}, {"y": 4.0, "x": 3.0}])
    close.setPrecission(2)
    assert close == src
    close.setPrecission(4)
    assert not (close == src)


def test_add_row_and_update_row():
    # AddRow + updateRow (test_metadata_vec_main.cpp:215-236, 1214-1248)
    md = MetaData()
    md.addRow({"x": 1.0, "y": 2.0})
    md.addRow({"x": 3.0, "y": 4.0})
    assert md == md_source()
    zeros = MetaData([{"y": 0.0, "x": 0.0}, {"y": 0.0, "x": 0.0}])
    assert not (zeros == md_source())
    zeros.setRow({"x": 1.0, "y": 2.0}, 0)
    zeros.setRow({"x": 3.0, "y": 4.0}, 1)
    assert zeros == md_source()


def test_add_label():
    # AddLabel (test_metadata_vec_main.cpp:206-213): new label appends to
    # the active-label list
    md = md_source()
    md.fillConstant("z", 0.0)
    assert md.getActiveLabels() == ["x", "y", "z"]


def test_copy_column():
    # CopyColumn (test_metadata_vec_main.cpp:1115-1129)
    md1, md2 = md_source(), md_source()
    for oid in range(md1.size()):
        md1.setValue("z", md1.getValue("y", oid), oid)
    md2.copyColumn("z", "y")
    assert md1 == md2


def test_comment_roundtrip(tmp_path):
    # Comment (test_metadata_vec_main.cpp:1029-1048): a >80-char comment
    # wraps in the file yet roundtrips exactly
    md = md_source()
    s1 = ("This is a very long comment that has more than 80 characters"
          " Therefore should be split in several lines"
          " Let us see what happened")
    md.setComment(s1)
    fn = str(tmp_path / "c.xmd")
    md.write(fn)
    md2 = MetaData(fn)
    assert md2.getComment() == s1
    assert md2 == md


def test_md_info_max_rows(tmp_path):
    # MDInfo (test_metadata_vec_main.cpp:316-340): a 1-row capped read
    # still reports the file's row count and sees every label
    fn = str(tmp_path / "info.xmd")
    md_source().write(fn)
    full = MetaData(fn)
    capped = MetaData()
    capped.setMaxRows(1)
    capped.read(fn)
    assert capped.size() == 1
    assert capped.getParsedLines() == full.size()
    for lab in full.getActiveLabels():
        assert capped.containsLabel(lab)


def test_multi_write_named_block_matches_fixture(tmp_path,
                                                 reference_resources):
    # multiWrite (test_metadata_vec_main.cpp:341-354): writing
    # myblock@file on a fresh file must produce exactly the reference's
    # mDsource.xmd (textual golden)
    fn = str(tmp_path / "mw.xmd")
    md_source().write(f"myblock@{fn}")
    golden = os.path.join(reference_resources, "metadata", "mDsource.xmd")
    ours = [ln.rstrip() for ln in open(fn) if ln.strip()]
    ref = [ln.rstrip() for ln in open(golden) if ln.strip()]
    assert ours[1:] == ref[1:]  # line 0 is the version header
    assert compare_two_metadata_files(fn, golden)


def test_add_label_alias_reads_foreign_label(reference_resources):
    # addLabelAlias (test_metadata_vec_main.cpp:275-283): after aliasing,
    # the noXmipp.xmd fixture reads into the canonical column
    from xmipp3_tpu.core.labels import ALIASES, add_label_alias
    add_label_alias("y", "noExixtingLabel")
    try:
        md = MetaData(os.path.join(reference_resources, "metadata",
                                   "noXmipp.xmd"))
        assert md == md_source()
    finally:
        ALIASES.pop("noExixtingLabel", None)


def test_get_new_alias_keeps_foreign_label(reference_resources):
    # getNewAlias (test_metadata_vec_main.cpp:284-300): an unknown label
    # gets a usable column whose values match the fixture's y column
    from xmipp3_tpu.core.labels import ALIASES, get_new_alias
    name = get_new_alias("noExixtingLabel")
    try:
        assert name == "noExixtingLabel"
        md = MetaData(os.path.join(reference_resources, "metadata",
                                   "noXmipp.xmd"))
        vals = [float(v) for v in md.getColumnValues(name)]
        assert vals == md_source().getColumnValues("y")
    finally:
        ALIASES.pop("noExixtingLabel", None)


# ---------------------------------------------------------------------------
# remaining test_metadata_vec_main.cpp cases (per-TEST ledger completion, r4)
# ---------------------------------------------------------------------------

def test_id_iteration_orders_and_survives_removal():
    """IdIteration: ids() yields every object id in insertion order."""
    md = MetaData.fromRows([{"x": 1.0}, {"x": 3.0}, {"x": 5.0}])
    ids = list(md)
    assert len(ids) == 3
    got = [md.getValue("x", i) for i in ids]
    assert got == [1.0, 3.0, 5.0]


def test_row_iteration_yields_all_rows_in_order():
    """RowIteration: row iteration visits every row once, in order."""
    md = MetaData.fromRows([{"x": float(i)} for i in range(5)])
    xs = [float(r["x"]) for r in md.iterRows()]
    assert xs == [0.0, 1.0, 2.0, 3.0, 4.0]


def test_clear_empties_rows_and_labels():
    """Clear: size 2 -> clear -> size 0."""
    md = MetaData.fromRows([{"x": 1.0}, {"x": 2.0}])
    assert md.size() == 2
    md2 = MetaData()
    assert md2.size() == 0 and md2.isEmpty()


def test_size_tracks_adds_and_removals():
    """Size: reflects the current row count."""
    md = MetaData.fromRows([{"x": 1.0}, {"x": 2.0}])
    assert md.size() == 2
    i = md.addObject()
    md.setValue("x", 9.0, i)
    assert md.size() == 3
    md.removeObjects([False, False, True])
    assert md.size() == 2


def test_assignment_between_backends(tmp_path):
    """AssignmentFromVecOperator / AssignmentFromDbOperator /
    VecToDbAndBack: the pandas-backed metadata round-trips through the
    SQLite container unchanged."""
    md = MetaData.fromRows([{"image": "a.xmp", "x": 1.0},
                            {"image": "b.xmp", "x": 2.0}])
    cp = md.copy()
    assert cp == md
    fn = str(tmp_path / "roundtrip.sqlite")
    md.write(fn)
    again = MetaData(fn)
    assert [str(v) for v in again.getColumnValues("image")] == \
        ["a.xmp", "b.xmp"]
    assert [float(v) for v in again.getColumnValues("x")] == [1.0, 2.0]


def test_import_objects_with_query():
    """ImportObject: importing every object of another md onto a copy of
    the first equals their union (the reference loops importObject per
    id; unionAll is the batched equivalent)."""
    a = MetaData.fromRows([{"x": 1.0}, {"x": 2.0}])
    b = MetaData.fromRows([{"x": 3.0}, {"x": 4.0}])
    u = a.copy()
    u.unionAll(b)
    assert [float(v) for v in u.getColumnValues("x")] == \
        [1.0, 2.0, 3.0, 4.0]
    c = MetaData()
    c.importObjects(b)                 # no query: replaces with b's rows
    assert c == b


def test_mdvalue_eq_relational_query():
    """MDValueEQ: importObjects with an equality query keeps exactly the
    matching rows."""
    md = MetaData.fromRows([{"image": v} for v in ["a", "b", "c", "a"]])
    out = MetaData()
    out.importObjects(md, "image == 'a'")
    assert [str(v) for v in out.getColumnValues("image")] == ["a", "a"]


def test_read_multiple_blocks_roundtrip(tmp_path):
    """ReadMultipleBlocks + RegularExp: blocks written with MD_APPEND read
    back individually and by block_00000[12] regex union."""
    fn = str(tmp_path / "blocks.xmd")
    MetaData.fromRows([{"image": "image_1.xmp"},
                       {"image": "image_2.xmp"}]).write(fn)
    MetaData.fromRows([{"image": "image_data_1_1.xmp"},
                       {"image": "image_data_1_2.xmp"}]).write(
        fn, block="block_000001", append=True)
    MetaData.fromRows([{"image": "image_data_2_1.xmp"},
                       {"image": "image_data_2_2.xmp"}]).write(
        fn, block="block_000002", append=True)
    MetaData.fromRows([{"image": "image_data_no_1.xmp"},
                       {"image": "image_data_no_2.xmp"}]).write(
        fn, block="noblock", append=True)
    MetaData.fromRows([{"image": "image_data_3_1.xmp"},
                       {"image": "image_data_3_2.xmp"}]).write(
        fn, block="block_000003", append=True)
    one = MetaData(f"block_000001@{fn}")
    assert [str(v) for v in one.getColumnValues("image")] == \
        ["image_data_1_1.xmp", "image_data_1_2.xmp"]
    three = MetaData(f"block_000003@{fn}")
    assert three.size() == 2
    both = MetaData(f"block_00000[12]@{fn}")
    assert [str(v) for v in both.getColumnValues("image")] == \
        ["image_data_1_1.xmp", "image_data_1_2.xmp",
         "image_data_2_1.xmp", "image_data_2_2.xmp"]


def test_set_get_value_types_roundtrip():
    """setGetValue: values keep their type through set/get (the
    reference also asserts type-mismatch errors, which a dynamically
    typed store cannot produce by design)."""
    md = MetaData()
    i = md.addObject()
    md.setValue("order_", 1, i)
    assert md.getValue("order_", i) == 1
    md.setValue("angleRot", 1.5, i)
    assert float(md.getValue("angleRot", i)) == 1.5


def test_get_value_abort_raises():
    """getValueAbort: asking for an absent label raises."""
    import pytest
    md = MetaData.fromRows([{"angleRot": 1.0}])
    i = md.firstObject()
    with pytest.raises((KeyError, Exception)):
        _ = md.df["order_"]
    row = md.getRow(i)
    assert "anglePsi" not in row


def test_rename_column_values():
    """RenameColumn: renaming Y -> Z preserves the values."""
    md = MetaData.fromRows([{"X": 1.0, "Y": 2.0}, {"X": 3.0, "Y": 4.0}])
    md.renameColumn("Y", "Z")
    ref = MetaData.fromRows([{"X": 1.0, "Z": 2.0}, {"X": 3.0, "Z": 4.0}])
    assert md == ref


def test_copy_images_rewrites_image_column(tmp_path):
    """copyImages: image_convert over a metadata rewrites every image to
    the new container and the values survive (reference runs ProgConvImg
    over metadata/smallStack.stk)."""
    import numpy as np

    from xmipp3_tpu.core.image import Image, save_image
    from xmipp3_tpu.programs import get_program
    ref_stk = ("/root/reference/src/xmipp/resources/test/metadata/"
               "smallStack.stk")
    stack = Image(ref_stk).data
    fn_in = str(tmp_path / "in.xmd")
    MetaData.fromRows([{"image": f"{i + 1:06d}@{ref_stk}"}
                       for i in range(len(stack))]).write(fn_in)
    out = str(tmp_path / "conv.mrcs")
    prog = get_program("image_convert")
    prog.read(["x", "-i", fn_in, "-o", out,
               "--save_metadata_stack", str(tmp_path / "conv.xmd")])
    assert prog.tryRun() == 0
    back = Image(out).data
    assert np.allclose(np.squeeze(back), np.squeeze(stack), atol=1e-4)


def test_metadata_copy_is_deep():
    """Copy: a copied metadata equals the source and does not alias it."""
    md = MetaData.fromRows([{"x": 1.0}, {"x": 2.0}])
    cp = md.copy()
    assert cp == md
    i = cp.firstObject()
    cp.setValue("x", 99.0, i)
    assert float(md.getValue("x", md.firstObject())) == 1.0
