"""image_align_tilt_pairs (centilt) — the de-aliased centering program
(VERDICT Missing #2; reference align_tilt_pairs.{h,cpp}): shift recovery at
tilt 0, cosine-stretch recovery at real tilt, and the max-shift discard."""
import numpy as np
import pytest

import jax.numpy as jnp

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.geo import apply_affine_2d, shift_2d_real
from xmipp3_tpu.programs import get_program


def _ref_img(n=64):
    y, x = np.mgrid[0:n, 0:n].astype(np.float32)
    return (np.exp(-((y - 30) ** 2 + (x - 36) ** 2) / 30)
            + np.exp(-((y - 40) ** 2 + (x - 28) ** 2) / 18)).astype(
        np.float32)


def _run(d, ref, tilted, tilt=0.0, max_shift=20.0, stretch=False):
    Image(ref).write(d + "/ref.mrc")
    Image(tilted).write(d + "/tilted.mrc")
    md = MetaData.fromRows([{
        "image": d + "/u.mrc", "imageTilted": d + "/tilted.mrc",
        "anglePsi": 0.0, "angleY": 0.0, "angleY2": 0.0, "angleTilt": tilt,
        "shiftX": 0.0, "shiftY": 0.0, "flip": 0}])
    md.write(d + "/pairs.xmd")
    p = get_program("image_align_tilt_pairs")
    assert type(p).__name__ == "ProgAlignTiltPairs"
    args = ["x", "-i", d + "/pairs.xmd", "-o", d + "/out.xmd",
            "--ref", d + "/ref.mrc", "--max_shift", str(max_shift)]
    if stretch:
        args.append("--do_stretch")
    p.read(args)
    assert p.tryRun() == 0
    return MetaData(d + "/out.xmd"), p


def test_centilt_zero_tilt_shift_recovery(tmp_path):
    d = str(tmp_path)
    ref = _ref_img()
    tilted = np.asarray(shift_2d_real(jnp.asarray(ref[None]), 3.0, -2.0,
                                      wrap=True))[0]
    out, _ = _run(d, ref, tilted)
    sx = float(out.df["shiftX"][0])
    sy = float(out.df["shiftY"][0])
    reg = np.asarray(shift_2d_real(jnp.asarray(tilted[None]), sx, sy,
                                   wrap=True))[0]
    assert np.corrcoef(reg.ravel(), ref.ravel())[0, 1] > 0.99
    assert int(out.df["enabled"][0]) == 1


def test_centilt_cosine_stretch_recovery(tmp_path):
    """At 45 deg tilt with --do_stretch, the x-compressed + shifted tilted
    image must be recovered: un-stretching then applying the output shift
    registers it onto the untilted reference."""
    d = str(tmp_path)
    tilt = 45.0
    ref = _ref_img()
    c = np.cos(np.deg2rad(tilt))
    A_compress = np.array([[c, 0, 0], [0, 1, 0], [0, 0, 1]], np.float32)
    tilted = np.asarray(apply_affine_2d(jnp.asarray(ref[None]),
                                        jnp.asarray(A_compress[None]),
                                        wrap=True))[0]
    tilted = np.asarray(shift_2d_real(jnp.asarray(tilted[None]), 4.0, 3.0,
                                      wrap=True))[0]
    out, _ = _run(d, ref, tilted, tilt=tilt, stretch=True)
    sx = float(out.df["shiftX"][0])
    sy = float(out.df["shiftY"][0])
    # register: shift in the tilted frame, then un-stretch
    reg = np.asarray(shift_2d_real(jnp.asarray(tilted[None]), sx, sy,
                                   wrap=True))[0]
    unstretched = np.asarray(apply_affine_2d(
        jnp.asarray(reg[None]),
        jnp.asarray(np.linalg.inv(A_compress)[None].astype(np.float32)),
        wrap=True))[0]
    assert np.corrcoef(unstretched.ravel(), ref.ravel())[0, 1] > 0.98
    assert int(out.df["enabled"][0]) == 1


def test_centilt_discards_large_shift(tmp_path):
    d = str(tmp_path)
    ref = _ref_img()
    tilted = np.asarray(shift_2d_real(jnp.asarray(ref[None]), 14.0, -11.0,
                                      wrap=True))[0]
    out, p = _run(d, ref, tilted, max_shift=10.0)   # 10% of 64 = 6.4 px max
    assert int(out.df["enabled"][0]) == 0
    assert p.n_discarded == 1
    assert float(out.df["shiftX"][0]) == pytest.approx(0.0)
