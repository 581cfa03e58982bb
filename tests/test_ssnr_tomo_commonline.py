"""End-to-end tests of resolution_ssnr, continuous_create_residuals,
the tomo landmark-residual chain, tomo_extract_particlestacks and
angular_commonline (reference parity targets in each program docstring)."""
import os

import numpy as np
import pytest

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def _run(name, args):
    prog = get_program(name)
    prog.read(["xmipp_" + name] + args)
    prog.run()
    return prog


@pytest.fixture(scope="module")
def ssnr_data(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("ssnr"))
    rng = np.random.default_rng(0)
    N, B = 32, 30
    vol = np.zeros((N, N, N), np.float32)
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N] - N // 2
    for (cx, cy, cz, r, a) in [(0, 0, 0, 7, 1.0), (5, -4, 3, 3, 0.8),
                               (-6, 3, -2, 3, 0.9)]:
        vol += a * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2
                             + (zz - cz) ** 2) / (2 * (r / 2) ** 2))
                          ).astype(np.float32)
    from xmipp3_tpu.ops.art import sirt_reconstruct
    from xmipp3_tpu.ops.project import FourierProjector
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, B))).astype(np.float32)
    psi = rng.uniform(-180, 180, B).astype(np.float32)
    clean = np.asarray(FourierProjector(vol).project_euler(rot, tilt, psi))
    sig = clean + rng.normal(0, 0.3 * clean.std(), clean.shape).astype(np.float32)
    noi = rng.normal(0, 0.3 * clean.std(), clean.shape).astype(np.float32)
    Image(vol).write(f"{d}/vol.vol")
    Image(sig.astype(np.float32)).write(f"{d}/sig.mrcs")
    Image(noi.astype(np.float32)).write(f"{d}/noi.mrcs")
    for stk, nm in (("sig.mrcs", "sig"), ("noi.mrcs", "noi")):
        MetaData.fromRows(
            [{"image": f"{i+1:06d}@{d}/{stk}", "itemId": i + 1,
              "angleRot": float(rot[i]), "angleTilt": float(tilt[i]),
              "anglePsi": float(psi[i])} for i in range(B)]
        ).write(f"{d}/{nm}.xmd")
    vs, _ = sirt_reconstruct(sig, rot, tilt, psi, n_iters=3)
    vn, _ = sirt_reconstruct(noi, rot, tilt, psi, n_iters=3)
    Image(np.asarray(vs)).write(f"{d}/recS.vol")
    Image(np.asarray(vn)).write(f"{d}/recN.vol")
    return d


def test_resolution_ssnr(ssnr_data):
    d = ssnr_data
    p = _run("resolution_ssnr",
             ["-S", f"{d}/recS.vol", "-N", f"{d}/recN.vol",
              "--sel_signal", f"{d}/sig.xmd", "--sel_noise", f"{d}/noi.xmd",
              "-o", f"{d}/ssnr.txt", "--ring", "2"])
    t = p.ssnr_table
    assert t.shape[1] == 9
    # low frequencies must carry strong SSNR, high frequencies ~none
    assert t[1, 2] > 10.0
    assert t[-1, 2] < t[1, 2]


def test_resolution_vssnr_consistency(ssnr_data):
    d = ssnr_data
    _run("resolution_ssnr",
         ["-S", f"{d}/recS.vol", "-N", f"{d}/recN.vol",
          "--sel_signal", f"{d}/sig.xmd", "--sel_noise", f"{d}/noi.xmd",
          "-o", f"{d}/ssnr1.txt", "--ring", "2",
          "--gen_VSSNR", "--VSSNR", f"{d}/vssnr.vol"])
    p1 = _run("resolution_ssnr",
              ["--radial_avg", "--VSSNR", f"{d}/vssnr.vol",
               "-o", f"{d}/rad.txt", "--ring", "2"])
    direct = _run("resolution_ssnr",
                  ["-S", f"{d}/recS.vol", "-N", f"{d}/recN.vol",
                   "--sel_signal", f"{d}/sig.xmd", "--sel_noise",
                   f"{d}/noi.xmd", "-o", f"{d}/ssnr2.txt",
                   "--ring", "2"]).ssnr_table
    rad = p1.ssnr_table
    # the radial average of the VSSNR must track the direct 1D estimate at
    # the informative low frequencies (reference documents this consistency)
    for i in (1, 2, 3):
        assert abs(rad[i, 2] - direct[i, 2]) < 6.0


def test_continuous_create_residuals(ssnr_data):
    d = ssnr_data
    _run("continuous_create_residuals",
         ["-i", f"{d}/sig.xmd", "-o", f"{d}/res.xmd", "--ref", f"{d}/vol.vol",
          "--oresiduals", f"{d}/resid.mrcs", "--oprojections",
          f"{d}/projs.mrcs", "--optimizeGray"])
    sig = Image(f"{d}/sig.mrcs").data
    res = Image(f"{d}/resid.mrcs").data
    # residual power must be far below signal power (only noise remains)
    assert (res ** 2).mean() < 0.25 * (sig ** 2).mean()
    md = MetaData(f"{d}/res.xmd")
    assert np.asarray(md.getColumn("maxCC"), float).mean() > 0.8


@pytest.fixture(scope="module")
def tilt_data(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("tilt"))
    rng = np.random.default_rng(1)
    T, H, W, L = 15, 96, 96, 5
    tilts = np.linspace(-56, 56, T)
    c3d = np.stack([rng.uniform(18, W - 18, L), rng.uniform(18, H - 18, L),
                    rng.uniform(-14, 14, L)], 1)
    imgs = rng.normal(0, 0.1, (T, H, W)).astype(np.float32) + 1.0
    yy, xx = np.mgrid[0:H, 0:W]
    shift = rng.normal(0, 0.3, (T, 2))
    shift[5] = (6.0, -5.0)                     # one misaligned frame
    for ti, t in enumerate(np.deg2rad(tilts)):
        for li in range(L):
            x = ((c3d[li, 0] - W / 2) * np.cos(t) + c3d[li, 2] * np.sin(t)
                 + W / 2 + shift[ti, 0])
            y = (c3d[li, 1] - H / 2) + H / 2 + shift[ti, 1]
            if 5 < x < W - 5 and 5 < y < H - 5:
                imgs[ti] -= 0.8 * np.exp(
                    -(((xx - x) ** 2 + (yy - y) ** 2) / (2 * 2.0 ** 2))
                ).astype(np.float32)
    Image(imgs).write(f"{d}/ts.mrcs")
    np.savetxt(f"{d}/angles.tlt", tilts)
    MetaData.fromRows([{"xcoor": int(c3d[i, 0]), "ycoor": int(c3d[i, 1]),
                        "zcoor": int(c3d[i, 2])} for i in range(L)]
                      ).write(f"{d}/coords.xmd")
    MetaData.fromRows([{"image": f"{i+1:06d}@{d}/ts.mrcs",
                        "tiltAngle": float(tilts[i]), "itemId": i + 1}
                       for i in range(T)]).write(f"{d}/ts.xmd")
    return d


def test_landmark_residuals_and_misalignment(tilt_data):
    d = tilt_data
    _run("tomo_calculate_landmark_residuals",
         ["-i", f"{d}/ts.xmd", "--tlt", f"{d}/angles.tlt",
          "--inputCoord", f"{d}/coords.xmd", "-o", f"{d}/resid.xmd",
          "--fiducialSize", "12", "--samplingRate", "2"])
    md = MetaData(f"{d}/resid.xmd")
    assert md.size() > 30
    _run("tomo_detect_misalignment_residuals",
         ["--inputResInfo", f"{d}/resid.xmd", "-o", f"{d}/verdict.xmd"])
    v = MetaData(f"{d}/verdict.xmd")
    bad = [int(r["frameId"]) for r in v.iterRows() if r["enabled"] == -1]
    assert 6 in bad                           # the planted misaligned frame


def test_extract_particlestacks(tilt_data):
    d = tilt_data
    _run("tomo_extract_particlestacks",
         ["--tiltseries", f"{d}/ts.xmd", "--coordinates", f"{d}/coords.xmd",
          "--boxsize", "20", "-o", f"{d}/ps", "--normalize"])
    md = MetaData(f"{d}/ps/particlestacks.xmd")
    assert md.size() > 30
    stk = Image(f"{d}/ps/particle_00001.mrcs").data
    assert stk.shape[1:] == (20, 20)
    # normalized dark fiducial at the patch center
    assert stk[:, 7:13, 7:13].mean() < -0.5


@pytest.mark.slow
def test_angular_commonline(tmp_path):
    rng = np.random.default_rng(4)
    N, B = 48, 8
    vol = np.zeros((N, N, N), np.float32)
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N] - N // 2
    for (cx, cy, cz, r, a) in [(0, 0, 0, 10, 1.0), (8, -6, 4, 5, 0.8),
                               (-9, 5, -3, 4, 0.9), (4, 9, -7, 3, 0.7)]:
        vol += a * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2
                             + (zz - cz) ** 2) / (2 * (r / 2) ** 2))
                          ).astype(np.float32)
    from xmipp3_tpu.ops.project import FourierProjector
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(0, 1, B))).astype(np.float32)
    psi = rng.uniform(-180, 180, B).astype(np.float32)
    rot[0] = tilt[0] = psi[0] = 0
    imgs = np.asarray(FourierProjector(vol).project_euler(rot, tilt, psi))
    d = str(tmp_path)
    Image(imgs.astype(np.float32)).write(f"{d}/cl.mrcs")
    MetaData.fromRows([{"image": f"{i+1:06d}@{d}/cl.mrcs", "itemId": i + 1}
                       for i in range(B)]).write(f"{d}/cl.xmd")
    _run("angular_commonline",
         ["-i", f"{d}/cl.xmd", "--oang", f"{d}/out.xmd",
          "--NGen", "50000", "--NGroup", "5"])
    from xmipp3_tpu.programs.angular_commonline_prog import _euler_rows
    md = MetaData(f"{d}/out.xmd")
    Mr = _euler_rows(np.asarray(md.getColumn("angleRot"), float),
                     np.asarray(md.getColumn("angleTilt"), float),
                     np.asarray(md.getColumn("anglePsi"), float))
    Mt = _euler_rows(rot, tilt, psi)
    nr, nt = Mr[:, 2, :], Mt[:, 2, :]
    dr = np.abs(nr @ nr.T)
    dt = np.abs(nt @ nt.T)
    err = np.rad2deg(np.abs(np.arccos(np.clip(dr, 0, 1))
                            - np.arccos(np.clip(dt, 0, 1))))
    iu = np.triu_indices(B, 1)
    # the pairwise angular structure (rotation/handedness invariant) must be
    # recovered to roughly the grid resolution for most pairs
    assert np.median(err[iu]) < 20.0
