"""Program-level tests (tier 2 of the reference's test strategy,
SURVEY.md §4: golden-file style program runs through the CLI surface)."""
import os
import subprocess
import sys

import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, load_image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program, list_programs


@pytest.fixture()
def stack(tmp_path):
    rng = np.random.default_rng(0)
    data = rng.standard_normal((8, 32, 32)).astype(np.float32)
    fn = str(tmp_path / "stack.mrcs")
    save_image(fn, data)
    return fn, data


def run_prog(name, args):
    prog = get_program(name)
    assert prog is not None, f"program {name} not registered"
    rc = prog.run_with_args(args)
    assert rc == 0, f"{name} failed"
    return prog


def test_list_programs():
    progs = list_programs()
    assert "transform_filter" in progs
    assert len(progs) >= 15


def test_transform_filter_lowpass(stack, tmp_path):
    fn, data = stack
    out = str(tmp_path / "filtered.mrcs")
    run_prog("transform_filter",
             f"-i {fn} -o {out} --fourier low_pass 0.1 0.02")
    res = Image.read_stack(out)
    assert res.shape == data.shape
    assert res.std() < data.std() * 0.7


def test_transform_filter_help():
    prog = get_program("transform_filter")
    rc = prog.run_with_args("--help")
    assert rc == 0


def test_transform_geometry_shift(stack, tmp_path):
    fn, data = stack
    out = str(tmp_path / "shifted.mrcs")
    run_prog("transform_geometry", f"-i {fn} -o {out} --shift 3 0 0")
    res = Image.read_stack(out)
    np.testing.assert_allclose(res[0], np.roll(data[0], 3, axis=1), atol=1e-3)


def test_transform_geometry_rotate_volume(tmp_path):
    vol = np.zeros((16, 16, 16), np.float32)
    vol[8, 8, 12] = 1.0
    fn = str(tmp_path / "v.vol")
    save_image(fn, vol)
    out = str(tmp_path / "r.vol")
    run_prog("transform_geometry",
             f"-i {fn} -o {out} --rotate_volume euler 0 0 90 --interp linear --dont_wrap")
    res = load_image(out)
    assert res.shape == vol.shape
    assert res.max() > 0.5


def test_transform_window(stack, tmp_path):
    fn, data = stack
    out = str(tmp_path / "win.mrcs")
    run_prog("transform_window", f"-i {fn} -o {out} --size 16")
    assert Image.read_stack(out).shape == (8, 16, 16)
    out2 = str(tmp_path / "win2.mrcs")
    run_prog("transform_window", f"-i {fn} -o {out2} --size 64")
    assert Image.read_stack(out2).shape == (8, 64, 64)


def test_transform_threshold(stack, tmp_path):
    fn, _ = stack
    out = str(tmp_path / "th.mrcs")
    run_prog("transform_threshold",
             f"-i {fn} -o {out} --select below 0 --substitute value 0")
    assert Image.read_stack(out).min() >= 0


def test_transform_add_noise(stack, tmp_path):
    fn, data = stack
    out = str(tmp_path / "noisy.mrcs")
    run_prog("transform_add_noise", f"-i {fn} -o {out} --type gaussian 2 0 --seed 7")
    res = Image.read_stack(out)
    assert res.std() > data.std() * 1.5


def test_transform_mirror(stack, tmp_path):
    fn, data = stack
    out = str(tmp_path / "mx.mrcs")
    run_prog("transform_mirror", f"-i {fn} -o {out} --flipX")
    np.testing.assert_allclose(Image.read_stack(out), data[:, :, ::-1])


def test_image_operate_chain(stack, tmp_path):
    fn, data = stack
    out = str(tmp_path / "op.mrcs")
    run_prog("image_operate", f"-i {fn} -o {out} --mult 2")
    np.testing.assert_allclose(Image.read_stack(out), data * 2, rtol=1e-5)
    out2 = str(tmp_path / "op2.mrcs")
    run_prog("image_operate", f"-i {out} -o {out2} --minus {fn}")
    np.testing.assert_allclose(Image.read_stack(out2), data, atol=1e-5)


def test_image_resize(stack, tmp_path):
    fn, _ = stack
    out = str(tmp_path / "r.mrcs")
    run_prog("image_resize", f"-i {fn} -o {out} --dim 16 --fourier")
    assert Image.read_stack(out).shape == (8, 16, 16)


def test_image_statistics(stack, capsys):
    fn, data = stack
    prog = run_prog("image_statistics", f"-i {fn}")
    assert prog.stats["avg"] == pytest.approx(float(data.mean()), abs=1e-4)


def test_image_align_to_reference(tmp_path):
    # build a recognizable ref and shifted/rotated copies
    from xmipp3_tpu.ops.geo import apply_alignment_2d
    rng = np.random.default_rng(1)
    from xmipp3_tpu.ops.fourier_filter import apply_fourier_mask_2d, band_pass_mask
    ref = np.asarray(apply_fourier_mask_2d(
        rng.standard_normal((64, 64)).astype(np.float32),
        band_pass_mask(64, 64, 0.05, 0.2)))
    y, x = np.mgrid[0:64, 0:64].astype(np.float32)
    r = np.sqrt((y - 32) ** 2 + (x - 32) ** 2)
    ref = (ref * np.clip(1.5 - r / 30, 0, 1)).astype(np.float32)
    poses = [(0.0, 0, 0), (25.0, 2, -3), (-60.0, -1, 2), (120.0, 3, 1)]
    imgs = np.stack([np.asarray(apply_alignment_2d(
        ref[None], np.float32([p]), np.float32([sx]), np.float32([sy])))[0]
        for p, sx, sy in poses])
    fn_ref = str(tmp_path / "ref.mrc")
    save_image(fn_ref, ref)
    fn = str(tmp_path / "in.mrcs")
    save_image(fn, imgs)
    out_md = str(tmp_path / "align.xmd")
    aligned_fn = str(tmp_path / "aligned.mrcs")
    run_prog("image_align",
             f"-i {fn} -o {out_md} --ref {fn_ref} --oaligned {aligned_fn} --max_shift 6")
    md = MetaData(out_md)
    cc = md.getColumn("maxCC")
    assert (cc > 0.9).all()
    aligned = Image.read_stack(aligned_fn)
    for i in range(len(poses)):
        c = np.corrcoef(aligned[i].ravel(), ref.ravel())[0, 1]
        assert c > 0.9


def test_metadata_utilities_ops(tmp_path):
    fn1 = str(tmp_path / "a.xmd")
    md = MetaData.fromRows([{"itemId": i + 1, "cost": float(i)} for i in range(10)])
    md.write(fn1)
    out = str(tmp_path / "out.xmd")
    run_prog("metadata_utilities", f"-i {fn1} -o {out} --fill weight constant 2.5")
    md2 = MetaData(out)
    assert (md2.getColumn("weight") == 2.5).all()
    run_prog("metadata_utilities", f'-i {out} -o {out} --query select "cost > 4"')
    assert MetaData(out).size() == 5
    run_prog("metadata_utilities", f"-i {out} -o {out} --operate sort cost")
    assert MetaData(out).getValue("cost", 0) == 5.0


def test_cli_dispatcher_subprocess(stack, tmp_path):
    """The real installed CLI entry point end-to-end."""
    fn, _ = stack
    out = str(tmp_path / "cli.mrcs")
    # PALLAS_AXON_POOL_IPS="" skips the remote-TPU plugin registration in the
    # child: its PJRT init dials a relay that intermittently blocks for
    # minutes, even when JAX_PLATFORMS=cpu.
    env = dict(os.environ, JAX_PLATFORMS="cpu", PALLAS_AXON_POOL_IPS="")
    r = subprocess.run(
        [sys.executable, "-m", "xmipp3_tpu.programs", "transform_filter",
         "-i", fn, "-o", out, "--fourier", "low_pass", "0.2"],
        capture_output=True, text=True, env=env, timeout=300)
    assert r.returncode == 0, r.stderr
    assert os.path.exists(out)


def test_unknown_program_errors():
    assert get_program("definitely_not_a_program") is None


def test_bad_args_error(stack):
    fn, _ = stack
    prog = get_program("transform_filter")
    from xmipp3_tpu.core.errors import XmippError
    with pytest.raises(XmippError):
        prog.read([prog.name, "-i", fn, "--fourier", "no_such_filter", "0.3"])
