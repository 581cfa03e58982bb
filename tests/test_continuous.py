"""Continuous pose refinement + angular program tests."""
import numpy as np
import pytest

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.continuous import continuous_assign
from xmipp3_tpu.ops.project import FourierProjector
from xmipp3_tpu.programs import get_program


def make_phantom(n=32):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for cz, cy, cx, s, a in [(0, 0, 0, 2.5, 1.0), (4, -3, 3, 1.5, 0.8),
                             (-3, 3, -2, 1.8, 0.6), (-5, -4, 1, 1.0, 1.1),
                             (5, 2, -1, 1.1, 0.7)]:
        vol += a * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                          / (2 * s ** 2))
    return vol


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, name
    return prog


def test_continuous_assign_refines_perturbed_poses():
    vol = make_phantom()
    rng = np.random.default_rng(0)
    B = 12
    rot_t = rng.uniform(-180, 180, B).astype(np.float32)
    tilt_t = rng.uniform(30, 150, B).astype(np.float32)
    psi_t = rng.uniform(-180, 180, B).astype(np.float32)
    proj = FourierProjector(vol)
    imgs = np.asarray(proj.project_euler(rot_t, tilt_t, psi_t))
    # perturb initial poses by up to 6 degrees
    rot0 = rot_t + rng.uniform(-6, 6, B).astype(np.float32)
    tilt0 = np.clip(tilt_t + rng.uniform(-6, 6, B), 1, 179).astype(np.float32)
    psi0 = psi_t + rng.uniform(-6, 6, B).astype(np.float32)
    res = continuous_assign(vol, imgs, rot0, tilt0, psi0, n_steps=80)
    # NCC must be high after refinement
    assert res["cost"].mean() > 0.97, res["cost"]
    # angular error must shrink vs the initial perturbation
    def direction(rot, tilt):
        from xmipp3_tpu.core.sampling import directions_from_angles
        return directions_from_angles(np.stack([rot, tilt], axis=1))
    d_t = direction(rot_t, tilt_t)
    err0 = np.degrees(np.arccos(np.clip(
        (direction(rot0, tilt0) * d_t).sum(1), -1, 1)))
    err1 = np.degrees(np.arccos(np.clip(
        (direction(res["rot"], res["tilt"]) * d_t).sum(1), -1, 1)))
    assert err1.mean() < 0.6 * err0.mean(), (err0.mean(), err1.mean())


def test_continuous_assign_program(tmp_path):
    vol = make_phantom()
    fn_vol = str(tmp_path / "v.vol")
    save_image(fn_vol, vol)
    rng = np.random.default_rng(1)
    B = 6
    rot_t = rng.uniform(-180, 180, B).astype(np.float32)
    tilt_t = rng.uniform(40, 140, B).astype(np.float32)
    psi_t = np.zeros(B, np.float32)
    proj = FourierProjector(vol)
    imgs = np.asarray(proj.project_euler(rot_t, tilt_t, psi_t))
    fn_stk = str(tmp_path / "p.mrcs")
    save_image(fn_stk, imgs)
    MetaData.fromRows([
        {"image": f"{i + 1:06d}@{fn_stk}",
         "angleRot": float(rot_t[i] + 4), "angleTilt": float(tilt_t[i] - 4),
         "anglePsi": 0.0, "itemId": i + 1} for i in range(B)]
    ).write(str(tmp_path / "in.xmd"))
    out = str(tmp_path / "ref.xmd")
    prog = run_prog("angular_continuous_assign2",
                    f"-i {tmp_path}/in.xmd -o {out} --ref {fn_vol} "
                    f"--optimizeAngles --steps 60 -v 0")
    assert prog.mean_cost > 0.95
    md = MetaData(out)
    err = np.abs(md.getColumn("angleRot") - rot_t)
    err = np.minimum(err, 360 - err)
    assert err.mean() < 3.0


def test_class_average_and_subtract(tmp_path):
    vol = make_phantom()
    fn_vol = str(tmp_path / "v.vol")
    save_image(fn_vol, vol)
    # gallery + assignment
    run_prog("angular_project_library",
             f"-i {fn_vol} -o {tmp_path}/gal --sampling_rate 20 -v 0")
    md_g = MetaData(str(tmp_path / "gal.doc"))
    gal = Image.read_stack(str(tmp_path / "gal.stk"))
    rng = np.random.default_rng(2)
    pick = rng.integers(0, len(gal), 15)
    parts = gal[pick] + 0.2 * gal.std() * rng.standard_normal(
        (15,) + gal.shape[1:]).astype(np.float32)
    fn_parts = str(tmp_path / "parts.mrcs")
    save_image(fn_parts, parts)
    rows = []
    for i in range(15):
        g = md_g.getRow(int(pick[i]))
        rows.append({"image": f"{i + 1:06d}@{fn_parts}", "itemId": i + 1,
                     "ref": int(pick[i]) + 1, "angleRot": g["angleRot"],
                     "angleTilt": g["angleTilt"], "anglePsi": 0.0,
                     "shiftX": 0.0, "shiftY": 0.0})
    fn_assign = str(tmp_path / "assign.xmd")
    MetaData.fromRows(rows).write(fn_assign)
    # class averages
    run_prog("angular_class_average",
             f"-i {fn_assign} --lib {tmp_path}/gal.doc -o {tmp_path}/classes")
    md_c = MetaData(str(tmp_path / "classes.xmd"))
    counts = md_c.getColumn("classCount")
    assert counts.sum() == 15
    # subtraction: residuals should be small (particles = projections+noise)
    run_prog("subtract_projection",
             f"-i {fn_assign} --ref {fn_vol} -o {tmp_path}/sub")
    sub = Image.read_stack(str(tmp_path / "sub.mrcs"))
    assert sub.std() < 0.5 * parts.std()


def test_continuous_assign_full_gray_and_defocus():
    """Full continuous2cost objective (reference
    angular_continuous_assign2.cpp:522): recover pose + gray (a, b) + a
    deliberately wrong starting defocus to the true values."""
    from xmipp3_tpu.ops.continuous import continuous_assign_full
    from xmipp3_tpu.ops.ctf import CTFDescription, apply_ctf
    from xmipp3_tpu.ops.project import FourierProjector
    from xmipp3_tpu.core.geometry import euler_matrix
    n = 48
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    vol = (np.exp(-((x - 3) ** 2 + y ** 2 + z ** 2) / 18)
           + 0.7 * np.exp(-((x + 4) ** 2 + (y - 3) ** 2
                            + (z + 2) ** 2) / 8)).astype(np.float32)
    rot_t = np.array([30.0, 80.0], np.float32)
    tilt_t = np.array([50.0, 20.0], np.float32)
    proj = np.asarray(FourierProjector(vol).project_euler(
        rot_t, tilt_t, np.zeros(2, np.float32)))
    ctf = CTFDescription(sampling_rate=2.0, voltage=300, Cs=2.7, Q0=0.07,
                         defocusU=15000, defocusV=15000, K=1.0)
    imgs = 1.4 * np.asarray(apply_ctf(proj, ctf)) + 0.25
    res = continuous_assign_full(
        vol, imgs, rot_t + 3, tilt_t - 3, np.array([2.0, -2.0], np.float32),
        defU0=np.full(2, 14200.0, np.float32),
        defV0=np.full(2, 14200.0, np.float32),
        def_ang=np.zeros(2, np.float32), Ts=2.0,
        optimize_gray=True, optimize_defocus=True, n_steps=150)
    # viewing-direction error (rot/psi degenerate at low tilt)
    A_t = np.asarray(euler_matrix(rot_t, tilt_t, np.zeros(2, np.float32)))
    A_e = np.asarray(euler_matrix(res["rot"].astype(np.float32),
                                  res["tilt"].astype(np.float32),
                                  np.zeros(2, np.float32)))
    cosd = np.abs((A_t[:, 2, :] * A_e[:, 2, :]).sum(-1))
    ang_err = np.degrees(np.arccos(np.clip(cosd, -1, 1)))
    assert ang_err.max() < 2.5
    assert np.abs(res["grayA"] - 1.4).max() < 0.05
    assert np.abs(res["grayB"] - 0.25).max() < 0.05
    assert np.abs(res["defocusU"] - 15000).max() < 200


def test_subtract_projection_full_surface(tmp_path):
    """Full reference surface (subtract_projection.cpp:125-147): ROI mask
    keep/subtract modes, order-0/1 transfer fit labels, nonNegative,
    boost, noise estimation, real-space projector, save."""
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32) - n // 2
    blob_a = np.exp(-((x - 6) ** 2 + y ** 2 + z ** 2) / 12)
    blob_b = np.exp(-((x + 6) ** 2 + y ** 2 + z ** 2) / 12)
    vol = (blob_a + blob_b).astype(np.float32)
    fn_vol = str(tmp_path / "v.vol")
    save_image(fn_vol, vol)
    # ROI = the +x blob region
    roi = (blob_a > 0.1).astype(np.float32)
    fn_roi = str(tmp_path / "roi.vol")
    save_image(fn_roi, roi)
    rot = np.array([0.0, 40.0, 110.0, 250.0], np.float32)
    tilt = np.array([0.0, 30.0, 75.0, 120.0], np.float32)
    proj = np.asarray(FourierProjector(vol).project_euler(
        rot, tilt, np.zeros(4, np.float32)))
    # particles = 1.5x scaled projections + offset (exercises the fit)
    parts = (1.5 * proj + 0.1).astype(np.float32)
    fn_parts = str(tmp_path / "p.mrcs")
    save_image(fn_parts, parts)
    rows = [{"image": f"{i + 1:06d}@{fn_parts}", "itemId": i + 1,
             "angleRot": float(rot[i]), "angleTilt": float(tilt[i]),
             "anglePsi": 0.0, "shiftX": 0.0, "shiftY": 0.0}
            for i in range(4)]
    fn_md = str(tmp_path / "parts.xmd")
    MetaData.fromRows(rows).write(fn_md)
    # keep-mode: subtract everything EXCEPT the ROI -> ROI signal remains
    run_prog("subtract_projection",
             f"-i {fn_md} --ref {fn_vol} -o {tmp_path}/sub "
             f"--mask_roi {fn_roi} --sampling 2 --nonNegative "
             f"--save {tmp_path}/adj.mrcs --noise_est -v 0")
    sub = Image.read_stack(str(tmp_path / "sub.mrcs"))
    md_out = MetaData(str(tmp_path / "sub.xmd"))
    # transfer fit recovered the 1.5 gray scale
    b0 = np.asarray(md_out.getColumn("subtractionBeta0"), float)
    assert np.abs(b0 - 1.5).max() < 0.15
    # keep-mode R2 is bounded by the ROI energy left unexplained; it must
    # still be clearly positive (nonNegative keeps all rows enabled)
    assert (np.asarray(md_out.getColumn("subtractionR2"), float) > 0.3).all()
    # nonNegative disabled no rows (no enabled=-1 column written)
    assert not md_out.containsLabel("enabled") or \
        (np.asarray(md_out.getColumn("enabled"), float) > 0).all()
    # view 0 projects blob_a onto +x: kept region holds the energy
    left = sub[0][:, : n // 2]
    right = sub[0][:, n // 2:]
    assert (right ** 2).sum() > 10 * (left ** 2).sum()
    assert (tmp_path / "adj.mrcs").exists()
    assert (tmp_path / "noisePower.mrc").exists()
    # subtract-mode removes ONLY the ROI -> left blob survives instead
    run_prog("subtract_projection",
             f"-i {fn_md} --ref {fn_vol} -o {tmp_path}/sub2 "
             f"--mask_roi {fn_roi} --subtract --sampling 2 -v 0")
    sub2 = Image.read_stack(str(tmp_path / "sub2.mrcs"))
    # the background constant b is subtracted from the WHOLE image
    # (reference `I() -= b`), so compare de-meaned structure energy
    left2 = sub2[0][:, : n // 2]
    right2 = sub2[0][:, n // 2:]
    assert ((left2 - left2.mean()) ** 2).sum() > \
        5 * ((right2 - right2.mean()) ** 2).sum()
    # full subtraction without ROI: residual tiny vs particle energy
    run_prog("subtract_projection",
             f"-i {fn_md} --ref {fn_vol} -o {tmp_path}/sub3 "
             f"--realSpaceProjection --cirmaskrad 14 -v 0")
    sub3 = Image.read_stack(str(tmp_path / "sub3.mrcs"))
    assert (sub3 ** 2).mean() < 0.02 * (parts ** 2).mean()
    # boost divides by the fitted transfer: result ~ projections again
    run_prog("subtract_projection",
             f"-i {fn_md} --ref {fn_vol} -o {tmp_path}/boost --boost -v 0")
    bst = Image.read_stack(str(tmp_path / "boost.mrcs"))
    corr = np.corrcoef(bst.ravel(), proj.ravel())[0, 1]
    assert corr > 0.99
