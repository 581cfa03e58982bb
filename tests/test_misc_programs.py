"""Tests for the misc program batch + resume support."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, name
    return prog


def test_transform_dimred(tmp_path):
    rng = np.random.default_rng(0)
    a = rng.standard_normal((8, 16, 16)).astype(np.float32) + 3
    b = rng.standard_normal((8, 16, 16)).astype(np.float32) - 3
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, np.concatenate([a, b]))
    out = str(tmp_path / "red.xmd")
    run_prog("transform_dimred",
             f"-i {fn} -o {out} --method PCA --dout 2 --distance Euclidean")
    md = MetaData(out)
    Y = np.stack([np.asarray(v) for v in md.getColumnValues("dimred")])
    # two groups separated on first axis
    assert np.sign(Y[:8, 0]).sum() in (-8, 8)
    assert (np.sign(Y[:8, 0]) != np.sign(Y[8:, 0])).all()


def test_angular_distribution_show(tmp_path):
    rng = np.random.default_rng(1)
    rows = [{"angleRot": 0.0 + rng.normal(0, 3), "angleTilt": 90.0 +
             rng.normal(0, 3), "itemId": i + 1} for i in range(30)]
    fn = str(tmp_path / "a.xmd")
    MetaData.fromRows(rows).write(fn)
    out = str(tmp_path / "dist.xmd")
    prog = run_prog("angular_distribution_show", f"-i {fn} -o {out}")
    # concentration: a few bins hold all the weight
    assert prog.counts.max() >= 10
    assert (prog.counts > 0).sum() <= 8


def test_image_odd_even(tmp_path):
    rng = np.random.default_rng(2)
    imgs = rng.standard_normal((9, 8, 8)).astype(np.float32)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    run_prog("image_odd_even", f"-i {fn} --oroot {tmp_path}/half --sum_frames")
    odd = MetaData(str(tmp_path / "half_odd.xmd"))
    even = MetaData(str(tmp_path / "half_even.xmd"))
    assert odd.size() == 5 and even.size() == 4
    avg = Image(str(tmp_path / "half_odd_avg.mrc")).data
    np.testing.assert_allclose(avg, imgs[0::2].mean(axis=0), atol=1e-5)


def test_morphology(tmp_path):
    m = np.zeros((32, 32), np.float32)
    m[10:20, 10:20] = 1.0
    fn = str(tmp_path / "m.mrc")
    save_image(fn, m)
    out = str(tmp_path / "d.mrc")
    run_prog("transform_morphology",
             f"-i {fn} -o {out} --binaryOperation dilation --size 2")
    d = Image(out).data
    assert d.sum() > m.sum()
    assert d[9, 15] == 1.0
    # keepBiggest drops the smaller of two components
    m2 = np.zeros((32, 32), np.float32)
    m2[2:12, 2:12] = 1.0
    m2[20:24, 20:24] = 1.0
    fn2 = str(tmp_path / "m2.mrc")
    save_image(fn2, m2)
    out2 = str(tmp_path / "kb.mrc")
    run_prog("transform_morphology",
             f"-i {fn2} -o {out2} --binaryOperation keepBiggest")
    d2 = Image(out2).data
    assert d2[5, 5] == 1.0 and d2[22, 22] == 0.0
    # removeSmall keeps only components >= size
    out3 = str(tmp_path / "rs.mrc")
    run_prog("transform_morphology",
             f"-i {fn2} -o {out3} --binaryOperation removeSmall 50")
    d3 = Image(out3).data
    assert d3[5, 5] == 1.0 and d3[22, 22] == 0.0
    # gray sharpening increases local contrast across an edge
    g = np.tile(np.linspace(0, 1, 32, dtype=np.float32), (32, 1))
    fng = str(tmp_path / "g.mrc")
    save_image(fng, g)
    outg = str(tmp_path / "sh.mrc")
    run_prog("transform_morphology",
             f"-i {fng} -o {outg} --grayOperation sharpening 1 1.0")
    dg = Image(outg).data
    assert dg.std() >= g.std()


def test_center_image(tmp_path):
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    blob = np.exp(-((y - 40) ** 2 + (x - 25) ** 2) / 18.0).astype(np.float32)
    fn = str(tmp_path / "b.mrc")
    save_image(fn, blob)
    out = str(tmp_path / "c.mrc")
    run_prog("transform_center_image", f"-i {fn} -o {out}")
    c = np.squeeze(Image(out).data)
    iy, ix = np.unravel_index(np.argmax(c), c.shape)
    assert abs(iy - 32) <= 1 and abs(ix - 32) <= 1


def test_resume_skips_done_rows(tmp_path):
    rng = np.random.default_rng(3)
    imgs = rng.standard_normal((6, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "s.mrcs")
    save_image(fn, imgs)
    out_md = str(tmp_path / "out.xmd")
    # simulate a partial previous run: 3 rows already done
    done = MetaData.fromRows([{"itemId": i + 1, "image": "done_marker",
                               "enabled": 1} for i in range(3)])
    done.write(out_md)
    prog = get_program("transform_mirror")
    rc = prog.run_with_args(f"-i {fn} -o {out_md} --flipX --resume")
    assert rc == 0
    md = MetaData(out_md)
    assert md.size() == 6
    images = md.getColumnValues("image")
    assert sum(1 for s in images if s == "done_marker") == 3  # kept, skipped
    # the 3 new rows actually processed
    assert sum(1 for s in images if "@" in str(s)) == 3


def test_local_volume_adjust(tmp_path):
    # reference semantics (local_volume_adjust.cpp:38-183): per-block
    # SCALE-only correction c = sum(V·Vref)/sum(Vref²), V /= c — a pure
    # multiplicative perturbation is recoverable, an additive offset is
    # not (by design: the reference divides, it does not fit an offset)
    rng = np.random.default_rng(4)
    v1 = rng.standard_normal((24, 24, 24)).astype(np.float32)
    scale = (0.5 + 0.3 * np.sin(np.arange(24) / 8.0)
             ).astype(np.float32)[:, None, None]   # smooth per-slab gain
    v2 = scale * v1
    f1, f2 = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(f1, v1)
    save_image(f2, v2)
    out = str(tmp_path / "adj.vol")
    run_prog("local_volume_adjust", f"--i1 {f1} --i2 {f2} -o {out}")
    adj = np.squeeze(Image(out).data)
    inner = slice(6, 18)
    err = np.abs(adj - v1)[inner, inner, inner].mean()
    raw = np.abs(v2 - v1)[inner, inner, inner].mean()
    assert err < 0.1 and err < 0.25 * raw, (err, raw)


def test_movie_filter_dose_cli(tmp_path):
    """CLI endpoint applies the Grant-Grigorieff weights exactly
    (reference movie_filter_dose.cpp applyDoseFilterToImage)."""
    import jax.numpy as jnp
    from xmipp3_tpu.ops import movie as mops

    rng = np.random.default_rng(7)
    frames = rng.standard_normal((4, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "movie.mrcs")
    save_image(fn, frames)
    out = str(tmp_path / "weighted.mrcs")
    run_prog("movie_filter_dose",
             f"-i {fn} -o {out} --sampling 1.2 --dose_per_frame 2.5 "
             f"--pre_dose 1.0 --voltage 300")
    got = np.squeeze(Image(out).data)
    q = mops.dose_filter(16, 4, 2.5, 1.2, 1.0, 300.0)
    want = np.asarray(jnp.fft.irfft2(jnp.fft.rfft2(jnp.asarray(frames)) * q,
                                     s=(16, 16)))
    np.testing.assert_allclose(got, want, rtol=1e-5, atol=1e-5)
    # later frames are strictly more attenuated at high frequency
    hi = np.asarray(q)[:, 8, 8]
    assert np.all(np.diff(hi) < 0)
