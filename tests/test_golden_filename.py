"""Transliteration of the reference FileName gtest
(applications/tests/function_tests/test_filename_main.cpp): the compound
'slice,block@path' addressing contract, asserted with the reference's own
expected values."""
from xmipp3_tpu.core.filename import FileName


def test_get_block_name_matches_reference_values():
    # test_filename_main.cpp:24-44 (getBlockName)
    fn = FileName("")
    assert fn.is_empty()
    fn = FileName("abc.xmd")
    assert not fn.is_empty()
    assert fn.get_block_name() == ""
    assert FileName("@abc.xmd").get_block_name() == ""
    assert FileName("1@abc.xmd").get_block_name() == ""
    assert FileName("a@abc.xmd").get_block_name() == "a"
    assert FileName("1,a@abc.xmd").get_block_name() == "a"
    assert FileName("1,@abc.xmd").get_block_name() == ""


def test_remove_block_name_matches_reference_values():
    # test_filename_main.cpp:47-65 (removeBlockName)
    assert FileName("abc.xmd").remove_block_name().raw == "abc.xmd"
    assert FileName("@abc.xmd").remove_block_name().raw == "abc.xmd"
    assert FileName("1@abc.xmd").remove_block_name().raw == "1@abc.xmd"
    assert FileName("a@abc.xmd").remove_block_name().raw == "abc.xmd"
    assert FileName("1,a@abc.xmd").remove_block_name().raw == "1@abc.xmd"
    assert FileName("1,@abc.xmd").remove_block_name().raw == "1@abc.xmd"


def test_compound_prefix_decomposition():
    # the 'n,block@file' form must split into BOTH a slice and a block
    fn = FileName("3,particles@run1.xmd")
    assert fn.slice_index == 3
    assert fn.block == "particles"
    assert fn.path == "run1.xmd"
    # plain numeric prefix: slice only
    fn = FileName("000002@stack.stk")
    assert fn.slice_index == 2 and fn.block is None
