"""Golden parity with the reference function_tests/test_symmetries_main.cpp
and test_sampling_main.cpp symmetry pieces: group classification, true
symmetry counts, the embedded i3h angular distance, and breakSymmetry
zero-distance invariance."""
import numpy as np

from xmipp3_tpu.core.sym import SymList, is_symmetry_group


def test_is_symmetry_group():
    assert is_symmetry_group("i3h") == ("I3H", -1)
    assert is_symmetry_group("c5") == ("CN", 5)


def test_true_syms_no_i3h():
    assert SymList("i3h").true_syms_no() == 119


def test_compute_distance_i3h():
    d, _ = SymList("i3h").compute_distance(1., 2., 3., 6., 5., 4.)
    assert abs(d - 5.23652) < 1e-4


def test_break_symmetry_zero_distance():
    SL = SymList("i3")
    rng = np.random.default_rng(7)
    for _ in range(20):
        r2, t2, p2 = SL.break_symmetry(0., 5., 0., rng=rng)
        d, _ = SL.compute_distance(0., 5., 0., r2, t2, p2)
        assert d < 1e-3
