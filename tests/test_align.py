import numpy as np
import pytest

from xmipp3_tpu.ops.align import (align_considering_mirrors, iterative_align,
                                  multireference_align)
from xmipp3_tpu.ops.geo import apply_alignment_2d, rotate_2d, shift_2d_real
from xmipp3_tpu.ops.polar import best_rotation, cartesian_to_polar
from xmipp3_tpu.ops.shift import best_shift, correlation_index


def make_ref(n=64, seed=0):
    """Smooth random test pattern (band-limited, asymmetric)."""
    rng = np.random.default_rng(seed)
    img = rng.standard_normal((n, n)).astype(np.float32)
    from xmipp3_tpu.ops.fourier_filter import apply_fourier_mask_2d, band_pass_mask
    img = np.asarray(apply_fourier_mask_2d(img, band_pass_mask(n, n, 0.05, 0.2)))
    # apodize away the borders so rotations don't bring in edges
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    r = np.sqrt((y - n // 2) ** 2 + (x - n // 2) ** 2)
    return (img * np.clip(1.5 - r / (n // 2 - 2), 0, 1).clip(0, 1)).astype(np.float32)


def test_best_shift_recovers_known():
    ref = make_ref()
    true = [(3.0, -4.0), (-5.5, 2.25), (0.0, 0.0), (7.0, 7.0)]
    others = np.stack([np.asarray(shift_2d_real(ref[None], sx, sy))[0]
                       for sx, sy in true])
    sx, sy, c = (np.asarray(v) for v in best_shift(ref, others, max_shift=10))
    for i, (tx, ty) in enumerate(true):
        # shifting others back by estimated shift must undo the true shift
        assert sx[i] == pytest.approx(-tx, abs=0.15)
        assert sy[i] == pytest.approx(-ty, abs=0.15)


def test_best_rotation_recovers_known():
    ref = make_ref()
    angles = [10.0, -30.0, 75.0, -120.0]
    others = np.stack([np.asarray(rotate_2d(ref[None], a))[0] for a in angles])
    est, _ = (np.asarray(v) for v in best_rotation(ref, others))
    for i, a in enumerate(angles):
        # applying est must undo a: rotate(rotate(ref,a), est) == ref -> est=-a
        assert est[i] == pytest.approx(-a, abs=1.0)


def test_polar_resample_shapes():
    ref = make_ref(64)
    p = np.asarray(cartesian_to_polar(ref[None], 2, 30))
    assert p.shape[1] == 29
    assert p.shape[2] >= 2 * np.pi * 30 / 2  # enough angular samples


def test_iterative_align_full_pose():
    ref = make_ref()
    true = [(20.0, 3.0, -2.0), (-45.0, -4.0, 1.5), (0.0, 0.0, 0.0),
            (160.0, 2.0, 2.0)]
    others = np.stack([
        np.asarray(apply_alignment_2d(ref[None], np.float32([p]),
                                      np.float32([x]), np.float32([y])))[0]
        for p, x, y in true])
    psi, sx, sy, corr, aligned = (np.asarray(v) for v in
                                  iterative_align(ref, others, n_iters=4,
                                                  max_shift=8))
    for i in range(len(true)):
        assert corr[i] > 0.95, f"img {i}: corr {corr[i]}"
    # aligned images match the reference
    ci = np.asarray(correlation_index(ref, aligned))
    assert (ci > 0.95).all()


def test_align_with_mirror():
    ref = make_ref()
    flipped = ref[:, ::-1]
    rot = np.asarray(rotate_2d(flipped[None], 30.0))[0]
    others = np.stack([ref, rot])
    psi, sx, sy, flip, corr, aligned = (np.asarray(v) for v in
                                        align_considering_mirrors(
                                            ref, others, n_iters=4, max_shift=6))
    assert not flip[0]
    assert flip[1]
    assert corr[1] > 0.9


def test_multireference_assignment():
    refA = make_ref(seed=1)
    refB = make_ref(seed=2)
    # images generated from each ref with poses
    imgs = np.stack([
        np.asarray(apply_alignment_2d(refA[None], np.float32([15.0]),
                                      np.float32([2.0]), np.float32([-1.0])))[0],
        np.asarray(apply_alignment_2d(refB[None], np.float32([-30.0]),
                                      np.float32([0.0]), np.float32([3.0])))[0],
        refB,
    ])
    out = multireference_align(np.stack([refA, refB]), imgs, max_shift=6,
                               n_iters=3)
    ref_idx = np.asarray(out["ref_idx"])
    assert list(ref_idx) == [0, 1, 1]
    assert np.asarray(out["corr"]).min() > 0.9


def test_correlation_index_bounds():
    ref = make_ref()
    c = float(np.asarray(correlation_index(ref, ref))[0])
    assert c == pytest.approx(1.0, abs=1e-5)
    c2 = float(np.asarray(correlation_index(ref, -ref))[0])
    assert c2 == pytest.approx(-1.0, abs=1e-5)
