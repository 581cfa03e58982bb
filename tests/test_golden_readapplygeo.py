"""Reference readApplyGeo parity, pinned by the reference's own fixtures:

- pythoninterface/tinyImage.spi + tinyRotated.spi: tinyRotated IS
  readApplyGeo(tinyImage, psi=90) (reference tests/test_binding.py:427-438)
  — 3x3, pins the rotation sense to the pixel.
- image/test2.spi + test2_wrap_{false,true}.spi: readApplyGeo(psi=45) with
  DONT_WRAP / WRAP (reference test_image_main.cpp:80-97 readApplyGeo).
- the align2d writer identity (test_filters_main.cpp:104-171 alignImages
  Ialigned4): decomposing our aligner's registration into the xmipp row
  convention and reading it back with readApplyGeo semantics must reproduce
  the registered image.
"""
import numpy as np
import pytest

jnp = pytest.importorskip("jax.numpy")

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.ops.geo import (alignment_matrices_2d, alignment_to_md_pose,
                                apply_affine_2d, apply_md_geometry,
                                read_apply_geo,
                                registration_pose_to_xmipp_row)

REF = "/root/reference/src/xmipp/resources/test"


def _load(rel):
    return np.squeeze(Image(f"{REF}/{rel}").data).astype(np.float32)


def test_tiny_rotated_fixture_is_exact():
    tiny = _load("pythoninterface/tinyImage.spi")
    tiny_rot = _load("pythoninterface/tinyRotated.spi")
    # the fixture itself: pixel(i,j) = 3i + j
    assert np.allclose(tiny, np.arange(9, dtype=np.float32).reshape(3, 3))
    out = np.asarray(read_apply_geo(tiny[None], jnp.float32([90.0]),
                                    jnp.float32([0.0]), jnp.float32([0.0]),
                                    order=1))[0]
    assert np.abs(out - tiny_rot).max() < 1e-5


def test_test2_wrap_fixtures_match():
    img = _load("image/test2.spi")
    wrap_false = _load("image/test2_wrap_false.spi")
    wrap_true = _load("image/test2_wrap_true.spi")
    out_f = np.asarray(read_apply_geo(img[None], jnp.float32([45.0]),
                                      jnp.float32([0.0]), jnp.float32([0.0]),
                                      order=3, wrap=False))[0]
    # bit-level parity with the reference geometry engine (DONT_WRAP)
    assert np.abs(out_f - wrap_false).max() < 1e-3
    out_t = np.asarray(read_apply_geo(img[None], jnp.float32([45.0]),
                                      jnp.float32([0.0]), jnp.float32([0.0]),
                                      order=3, wrap=True))[0]
    # WRAP differs near the border (periodic vs mirror prefilter boundary);
    # the interior must match closely
    n = img.shape[0]
    y, x = np.mgrid[:n, :n] - n // 2
    m = np.hypot(y, x) < n // 2 - 6
    assert np.abs((out_t - wrap_true)[m]).max() < 2e-2
    rel = np.linalg.norm(out_t - wrap_true) / np.linalg.norm(wrap_true)
    assert rel < 5e-3


def test_read_apply_geo_is_apply_md_geometry_with_negated_psi():
    img = _load("image/test2.spi")
    for psi in (30.0, -72.5, 120.0):
        a = np.asarray(read_apply_geo(img[None], jnp.float32([psi]),
                                      jnp.float32([0.0]), jnp.float32([0.0]),
                                      order=3))[0]
        b = np.asarray(apply_md_geometry(img[None], jnp.float32([-psi]),
                                         jnp.float32([0.0]),
                                         jnp.float32([0.0]), order=3))[0]
        assert np.abs(a - b).max() < 1e-4


def test_align2d_writer_identity():
    """The reference alignImages gtest chain, with our ops: transform a
    fixture image, align it, convert the registration to the xmipp row, and
    demand readApplyGeo(row) == our registered image (the reference's
    Ialigned4 == Ialigned1 assertion, test_filters_main.cpp:148-170)."""
    from xmipp3_tpu.ops.align import iterative_align
    img = _load("filters/test2.spi")
    M = alignment_matrices_2d(jnp.float32([15.0]), jnp.float32([-4.0]),
                              jnp.float32([6.0]))
    transformed = np.asarray(apply_affine_2d(img[None], M, wrap=True))[0]
    psi, sx, sy, corr, _ = iterative_align(img, transformed[None])
    assert float(corr[0]) > 0.98
    pose = alignment_to_md_pose(psi, sx, sy)
    ours = np.asarray(apply_md_geometry(transformed[None], *pose,
                                        order=3))[0]
    row = registration_pose_to_xmipp_row(psi, sx, sy)
    xm = np.asarray(read_apply_geo(transformed[None],
                                   jnp.asarray(row[0]), jnp.asarray(row[1]),
                                   jnp.asarray(row[2]),
                                   flip=jnp.asarray(row[3]),
                                   scale=jnp.asarray(row[4]), order=3))[0]
    n = img.shape[0]
    y, x = np.mgrid[:n, :n] - n // 2
    m = np.hypot(y, x) < n // 2 - 4
    assert np.abs((xm - ours)[m]).max() < 1e-3
    # and both register onto the original
    cc = np.corrcoef(xm[m], img[m])[0, 1]
    assert cc > 0.97


def test_align2d_writer_identity_with_mirror():
    from xmipp3_tpu.ops.align import align_considering_mirrors
    from xmipp3_tpu.ops.geo import centered_flip
    img = _load("filters/test2.spi")
    M = alignment_matrices_2d(jnp.float32([15.0]), jnp.float32([-4.0]),
                              jnp.float32([6.0]))
    transformed = np.asarray(apply_affine_2d(img[None], M, wrap=True))[0]
    mirrored = np.asarray(centered_flip(jnp.asarray(transformed[None]),
                                        2))[0]
    psi, sx, sy, flip, corr, _ = align_considering_mirrors(
        img, mirrored[None])
    assert bool(flip[0])
    pose = alignment_to_md_pose(psi, sx, sy, flip)
    ours = np.asarray(apply_md_geometry(mirrored[None], *pose, order=3))[0]
    row = registration_pose_to_xmipp_row(psi, sx, sy, flip)
    xm = np.asarray(read_apply_geo(mirrored[None],
                                   jnp.asarray(row[0]), jnp.asarray(row[1]),
                                   jnp.asarray(row[2]),
                                   flip=jnp.asarray(row[3]),
                                   scale=jnp.asarray(row[4]), order=3))[0]
    n = img.shape[0]
    y, x = np.mgrid[:n, :n] - n // 2
    m = np.hypot(y, x) < n // 2 - 4
    assert np.abs((xm - ours)[m]).max() < 1e-3
    cc = np.corrcoef(xm[m], img[m])[0, 1]
    assert cc > 0.95


def test_cli_geo_convention_xmipp_reproduces_fixture(tmp_path):
    """End-to-end CLI: image_convert --geo_convention xmipp on a metadata
    row (tinyImage, psi=90) must write the reference's tinyRotated.spi —
    reference-written metadata consumed exactly."""
    from xmipp3_tpu.core.metadata import MetaData
    from xmipp3_tpu.programs import get_program
    tiny_path = f"{REF}/pythoninterface/tinyImage.spi"
    MetaData([{"image": tiny_path, "anglePsi": 90.0, "itemId": 1}]).write(
        str(tmp_path / "in.xmd"))
    prog = get_program("image_convert")
    prog.read(["x", "-i", str(tmp_path / "in.xmd"),
               "-o", str(tmp_path / "out.mrcs"),
               "--geo_convention", "xmipp"])
    assert prog.tryRun() == 0
    out = np.squeeze(Image(str(tmp_path / "out.mrcs")).data)
    tiny_rot = _load("pythoninterface/tinyRotated.spi")
    assert np.abs(out - tiny_rot).max() < 1e-4
