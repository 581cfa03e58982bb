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


def test_compute_neighbors_i3h(sampling_dir, base_sampling, exp_angles):
    """computeNeighborsI3H (test_sampling_main.cpp): the i3h fixture's
    per-image neighbor lists, with experimental directions expanded by
    the symmetry LR repository."""
    import re as _re
    path = os.path.join(sampling_dir, "neigh_ref_i3h_exp_sampling.xmd")
    text = open(path).read()
    m = _re.search(r"data_neighbors(.*?)data_\w+", text, _re.S)
    assert m
    fixture = []
    for line in m.group(1).splitlines():
        q = _re.search(r"'([\d\s]+)'", line)
        if q:
            fixture.append(sorted(int(v) for v in q.group(1).split()))
    assert len(fixture) == 3
    ang, vec = base_sampling
    a2, v2 = remove_redundant_points_reference(ang, vec, "i3h")
    dirs = exp_directions_by_symmetry(exp_angles, "i3h")
    a3, v3, idx = remove_points_far_from_exp(a2, v2, dirs, 5.0,
                                             return_index=True)
    # per-image neighbors: ASU indices within the radius of ANY
    # symmetry-expanded direction of that image
    from xmipp3_tpu.core.geometry import euler_matrix
    cosr = np.cos(np.deg2rad(5.0))
    got = []
    for k in range(len(exp_angles)):
        orbit = exp_directions_by_symmetry(exp_angles[k:k + 1], "i3h")
        sel = np.where((v3 @ orbit.T > cosr).any(axis=1))[0]
        got.append(sorted(int(idx[s]) for s in sel))
    assert got == fixture


def test_save_read_sampling_file_roundtrip(tmp_path, base_sampling,
                                           sampling_dir):
    """saveReadSamplingFile: write + read our own sampling file and get
    the same points back; the reader also parses the reference's own
    fixture files."""
    from xmipp3_tpu.core.sampling import (read_sampling_file,
                                          save_sampling_file)
    ang, vec = base_sampling
    a2, v2 = remove_redundant_points_reference(ang, vec, "c1")
    root = str(tmp_path / "samp")
    save_sampling_file(root, a2, v2, np.deg2rad(3.0), np.deg2rad(5.0),
                       neighbors=[[3, 2, 1], [7, 6]])
    back = read_sampling_file(root)
    assert abs(back["sampling_rate"] - np.deg2rad(3.0)) < 1e-6
    assert abs(back["neighborhood_radius"] - np.deg2rad(5.0)) < 1e-6
    assert back["neighbors"] == [[3, 2, 1], [7, 6]]
    assert np.abs(back["angles"][:, :2] - a2[:, :2]).max() < 1e-5
    assert np.abs(back["vectors"] - v2).max() < 1e-5
    # the reference's own fixture parses too
    ref = read_sampling_file(
        os.path.join(sampling_dir, "neigh_ref_c1_exp_sampling.xmd"))
    assert len(ref["angles"]) > 0 and ref["neighbors"] is not None
