"""angular_continuous_assign2 reference option surface
(angular_continuous_assign2.cpp:120-142): --optimizeScale, --Rmax,
--max_* trust regions, --sameDefocus, --oresiduals/--oprojections,
--applyTo."""
import numpy as np
import jax.numpy as jnp
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.continuous import (_project_posed, continuous_assign,
                                       continuous_assign_full)
from xmipp3_tpu.ops.project import FourierProjector, prepare_fourier_volume


def _vol(n=32):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    return (np.exp(-((x - 2) ** 2 + y ** 2 + z ** 2) / 14)
            + 0.6 * np.exp(-((x + 3) ** 2 + (y - 2) ** 2
                             + (z + 1) ** 2) / 6)).astype(np.float32)


def _posed_projs(vol, rot, tilt, scale=None):
    vf, _ = prepare_fourier_volume(jnp.asarray(vol), 2.0)
    B = len(rot)
    z = jnp.zeros(B, jnp.float32)
    return np.asarray(_project_posed(
        vf, jnp.asarray(rot), jnp.asarray(tilt), z, z, z, vol.shape[0],
        scale=None if scale is None else jnp.asarray(scale)))


def test_optimize_scale_recovers_magnification():
    vol = _vol()
    rot = np.array([20.0, 75.0], np.float32)
    tilt = np.array([60.0, 30.0], np.float32)
    s_true = np.array([1.04, 0.97], np.float32)
    imgs = _posed_projs(vol, rot, tilt, scale=s_true)
    res = continuous_assign_full(
        vol, imgs, rot, tilt, np.zeros(2, np.float32),
        optimize_angles=False, optimize_shift=False, optimize_scale=True,
        max_scale=0.08, n_steps=120)
    assert np.abs(res["scale"] - s_true).max() < 0.015


def test_trust_region_bounds_respected():
    vol = _vol()
    rot = np.array([20.0], np.float32)
    tilt = np.array([60.0], np.float32)
    imgs = _posed_projs(vol, rot + 10, tilt)   # target is 10 deg away
    res = continuous_assign_full(
        vol, imgs, rot, tilt, np.zeros(1, np.float32),
        max_angular_change=2.0, n_steps=60)
    # the bound must stop the refinement 2 deg from the init
    assert abs(res["rot"][0] - rot[0]) <= 2.0 + 1e-4
    res2 = continuous_assign(vol, imgs, rot, tilt,
                             np.zeros(1, np.float32),
                             max_angular_change=2.0, n_steps=60)
    assert abs(res2["rot"][0] - rot[0]) <= 2.0 + 1e-4


def test_same_defocus_ties_deltas():
    vol = _vol()
    rot = np.array([40.0], np.float32)
    tilt = np.array([50.0], np.float32)
    imgs = _posed_projs(vol, rot, tilt)
    res = continuous_assign_full(
        vol, imgs, rot, tilt, np.zeros(1, np.float32),
        defU0=np.array([12000.0], np.float32),
        defV0=np.array([13000.0], np.float32),
        def_ang=np.zeros(1, np.float32), Ts=2.0,
        optimize_defocus=True, same_defocus=True, n_steps=30)
    dU = res["defocusU"][0] - 12000.0
    dV = res["defocusV"][0] - 13000.0
    assert dU == pytest.approx(dV, abs=1e-3)


def test_rmax_mask_and_outputs():
    vol = _vol()
    rot = np.array([20.0, 75.0], np.float32)
    tilt = np.array([60.0, 30.0], np.float32)
    imgs = _posed_projs(vol, rot, tilt)
    res = continuous_assign_full(
        vol, imgs, rot, tilt, np.zeros(2, np.float32),
        Rmax=10.0, compute_outputs=True, n_steps=20)
    assert res["projections"].shape == imgs.shape
    assert res["residuals"].shape == imgs.shape
    # residuals vanish outside the Rmax mask
    yy, xx = np.mgrid[:32, :32]
    outside = np.hypot(yy - 16, xx - 16) > 10.0
    assert np.abs(res["residuals"][:, outside]).max() == 0.0
    # exact poses -> small masked residuals
    inside_resid = np.abs(res["residuals"][:, ~outside]).mean()
    assert inside_resid < 0.1 * np.abs(imgs).mean() + 1e-3


def test_program_apply_to_and_output_stacks(tmp_path, run_prog=None):
    from tests.test_continuous import run_prog as _rp  # reuse helper
    vol = _vol()
    fn_vol = str(tmp_path / "v.vol")
    save_image(fn_vol, vol)
    rot = np.array([25.0, 70.0, 120.0], np.float32)
    tilt = np.array([55.0, 35.0, 80.0], np.float32)
    imgs = np.asarray(FourierProjector(vol).project_euler(
        rot, tilt, np.zeros(3, np.float32)))
    fn_stk = str(tmp_path / "p.mrcs")
    save_image(fn_stk, imgs)
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{fn_stk}", "angleRot": float(rot[i]),
         "angleTilt": float(tilt[i]), "anglePsi": 0.0, "itemId": i + 1}
        for i in range(3)]).write(str(tmp_path / "in.xmd"))
    out = str(tmp_path / "out.xmd")
    _rp("angular_continuous_assign2",
        f"-i {tmp_path}/in.xmd -o {out} --ref {fn_vol} "
        f"--optimizeAngles --optimizeShift --applyTo image "
        f"--oresiduals {tmp_path}/res.stk "
        f"--oprojections {tmp_path}/proj.stk --steps 10 -v 0")
    md = MetaData(out)
    assert md.size() == 3
    # aligned stack written and referenced
    assert "_aligned.stk" in md.getColumnValues("image")[0]
    assert Image.read_stack(str(tmp_path / "res.stk")).shape == imgs.shape
    assert Image.read_stack(str(tmp_path / "proj.stk")).shape == imgs.shape
