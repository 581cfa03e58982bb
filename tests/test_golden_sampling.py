"""Golden parity with function_tests/test_sampling_main.cpp against the
reference's OWN fixture files (resources/test/sampling/*): the exact
4412-point icosahedral-subdivision sampling, the C1 and I3H asymmetric
units, experimental-data pruning (swap-delete order included) and C1
neighborhoods — all point-for-point."""
import os
import re

import numpy as np
import pytest

from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.sampling import (compute_neighbors_reference,
                                      compute_sampling_points_reference,
                                      exp_directions_by_symmetry,
                                      remove_points_far_from_exp,
                                      remove_redundant_points_reference)


def _load_fixture(path):
    rows = []
    for line in open(path):
        t = line.split()
        if len(t) == 7 and re.match(r"^-?\d+$", t[0]):
            rows.append([float(x) for x in t[1:]])
    return np.array(rows)


@pytest.fixture(scope="module")
def sampling_dir(reference_resources):
    return os.path.join(reference_resources, "sampling")


@pytest.fixture(scope="module")
def base_sampling():
    return compute_sampling_points_reference(3.0, False, 180.0, 0.0)


@pytest.fixture(scope="module")
def exp_angles(sampling_dir):
    md = MetaData(os.path.join(sampling_dir, "experimental_images.xmd"))
    return np.stack([md.df["angleRot"].to_numpy(float),
                     md.df["angleTilt"].to_numpy(float),
                     md.df["anglePsi"].to_numpy(float)], axis=1)


def test_compute_sampling_points(sampling_dir, base_sampling):
    ref = _load_fixture(os.path.join(sampling_dir, "ref_sampling.xmd"))
    ang, vec = base_sampling
    assert len(ang) == len(ref) == 4412
    assert np.abs(ang[:, :2] - ref[:, :2]).max() < 1e-5
    assert np.abs(vec - ref[:, 3:6]).max() < 1e-5


@pytest.mark.parametrize("name,sym", [("ref_c1", "c1"), ("ref_i3h", "i3h")])
def test_remove_redundant_points(sampling_dir, base_sampling, name, sym):
    ref = _load_fixture(os.path.join(sampling_dir, f"{name}_sampling.xmd"))
    ang, vec = base_sampling
    a2, v2 = remove_redundant_points_reference(ang, vec, sym)
    assert len(a2) == len(ref)
    assert np.abs(v2 - ref[:, 3:6]).max() < 1e-5


@pytest.mark.parametrize("name,sym", [("ref_c1_exp", "c1"),
                                      ("ref_i3h_exp", "i3h")])
def test_remove_points_far_from_exp(sampling_dir, base_sampling, exp_angles,
                                    name, sym):
    ref = _load_fixture(os.path.join(sampling_dir, f"{name}_sampling.xmd"))
    ang, vec = base_sampling
    a2, v2 = remove_redundant_points_reference(ang, vec, sym)
    dirs = exp_directions_by_symmetry(exp_angles, sym)
    a3, v3 = remove_points_far_from_exp(a2, v2, dirs, 5.0)
    assert len(a3) == len(ref)
    assert np.abs(v3 - ref[:, 3:6]).max() < 1e-5


def test_compute_neighbors_c1(sampling_dir, base_sampling, exp_angles):
    """neigh_ref_c1_exp: the quoted per-image neighbor index lists (original
    asymmetric-unit indices, descending) match exactly."""
    path = os.path.join(sampling_dir, "neigh_ref_c1_exp_sampling.xmd")
    text = open(path).read()
    m = re.search(r"data_neighbors(.*?)data_\w+", text, re.S)
    assert m
    fixture = []
    for line in m.group(1).splitlines():
        q = re.search(r"'([\d\s]+)'", line)
        if q:
            fixture.append([int(v) for v in q.group(1).split()])
    assert len(fixture) == 3
    ang, vec = base_sampling
    a2, v2 = remove_redundant_points_reference(ang, vec, "c1")
    dirs = exp_directions_by_symmetry(exp_angles, "c1")
    a3, v3, idx = remove_points_far_from_exp(a2, v2, dirs, 5.0,
                                             return_index=True)
    got = compute_neighbors_reference(v3, idx, exp_angles, 5.0)
    assert got == fixture
