"""Golden parity with function_tests/test_psd_estimator.cpp: the half2whole
Hermitian expansion index relations and the getPatchesLocation contract,
transliterated with the reference's own verification procedure; plus the
de-aliased psd_estimate CLI endpoint."""
import numpy as np
import pytest

from xmipp3_tpu.ops.psd import (estimate_psd_reference, get_patches_location,
                                half2whole_sized)


@pytest.mark.parametrize("x,y", [(10, 10), (4, 10), (11, 10), (10, 11),
                                 (11, 11), (5, 11), (128, 64), (127, 65)])
def test_half2whole_relations(x, y):
    """testHalf2Whole: original half copied verbatim; new half satisfies
    out[y_, sx-x_-1] == in[(sy-y_)%sy, x_+1]."""
    fx = x // 2 + 1
    half = np.arange(y * fx, dtype=np.float64).reshape(y, fx)
    out = half2whole_sized(half, x)
    assert out.shape == (y, x)
    assert np.array_equal(out[:, :fx], half)
    for yy in range(y):
        for xx in range(x - fx):
            x_in = xx + 1
            y_in = (y - yy) % y
            assert out[yy, x - xx - 1] == half[y_in, x_in], (yy, xx)


def _verify_patches(borders, mic, patch, overlap):
    """The reference windowCoords verification loop, transliterated."""
    result = get_patches_location(borders, mic, patch, overlap)
    step_x = max(int((1.0 - overlap) * patch[0]), 1)
    step_y = max(int((1.0 - overlap) * patch[1]), 1)
    div_x = int(np.ceil(mic[0] / float(step_x)))
    div_y = int(np.ceil(mic[1] / float(step_y)))
    sizes_x, sizes_y = set(), set()
    for n in range(div_x * div_y):
        bi, bj = n // div_x, n % div_x
        yy = borders[1] + bi * step_y
        xx = borders[0] + bj * step_x
        if yy + patch[1] > mic[1] - borders[1]:
            yy = mic[1] - patch[1] - borders[1]
        if xx + patch[0] > mic[0] - borders[0]:
            xx = mic[0] - patch[0] - borders[0]
        sizes_x.add(xx)
        sizes_y.add(yy)
    assert len(sizes_x) * len(sizes_y) == len(result)
    for (xs, ys, xe, ye) in result:
        assert xs in sizes_x and ys in sizes_y
        assert xe - xs + 1 == patch[0] and ye - ys + 1 == patch[1]
        assert xe < mic[0] and ye < mic[1]


def test_window_coords_sweep():
    overlaps = [0.0, 0.2, 0.9]
    counter = 0
    for in_x in (32, 256, 512):
        for in_y in (32, 256, 513):
            for p_x in (5, 64, 367):
                if p_x > in_x:
                    continue
                for p_y in (5, 64, 367):
                    if p_y > in_y:
                        continue
                    for bx in (0, 5):
                        if p_x + 2 * bx > in_x:
                            continue
                        for by in (0, 5):
                            if p_y + 2 * by > in_y:
                                continue
                            counter = (counter + 1) % len(overlaps)
                            _verify_patches((bx, by), (in_x, in_y),
                                            (p_x, p_y), overlaps[counter])


def test_estimate_psd_reference_peak():
    """A pure cosine micrograph must produce a PSD peak at its frequency."""
    n = 256
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    mic = np.cos(2 * np.pi * 32 * x / 128).astype(np.float32)
    mic += 0.01 * np.random.default_rng(0).standard_normal((n, n)).astype(
        np.float32)
    psd = estimate_psd_reference(mic, overlap=0.4, patch=(128, 128),
                                 normalize=False)
    peak = np.unravel_index(np.argmax(psd[:, 1:]), psd[:, 1:].shape)
    assert peak[1] + 1 == 32          # fx = 32/128 cycles
    assert peak[0] in (0, 127)


def test_psd_estimate_cli(tmp_path):
    """The de-aliased endpoint runs the periodogram engine (VERDICT
    Missing #6: psd_estimate must NOT be the ARMA program)."""
    from xmipp3_tpu.core.image import Image
    from xmipp3_tpu.programs import get_program
    rng = np.random.default_rng(1)
    mic = rng.standard_normal((512, 512)).astype(np.float32)
    d = str(tmp_path)
    Image(mic).write(d + "/mic.mrc")
    p = get_program("psd_estimate")
    assert type(p).__name__ == "ProgPSDEstimate"
    p.read(["x", "-i", d + "/mic.mrc", "-o", d + "/psd.mrc",
            "--patches", "128", "128"])
    assert p.tryRun() == 0
    psd = np.squeeze(Image(d + "/psd.mrc").data)
    assert psd.shape == (128, 128)
    assert np.isfinite(psd).all()
