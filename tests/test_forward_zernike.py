"""forward_zernike_images — the de-aliased forward-model engine (VERDICT
Missing #3; reference forward_zernike_images.{h,cpp}): the splatting
projector must match real-space projection for zero deformation, the fit
must improve correlation on genuinely deformed particles, and the priors
variant must seed from coefficients."""
import numpy as np
import pytest

import jax.numpy as jnp

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.forward_zernike import (fit_forward_zernike_batch,
                                            forward_splat_project,
                                            masked_voxel_basis)
from xmipp3_tpu.programs import get_program


def _blob_vol(n=32):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    v = (np.exp(-((z - 16) ** 2 + (y - 13) ** 2 + (x - 18) ** 2) / 14)
         + 0.7 * np.exp(-((z - 18) ** 2 + (y - 20) ** 2 + (x - 12) ** 2) / 9))
    return v.astype(np.float32)


def test_splat_projection_matches_sum_projection():
    """Zero deformation, zero angles: the splat equals the z-sum of the
    volume (each voxel lands exactly on its (x, y) pixel)."""
    vol = _blob_vol()
    pos, vals, Z = masked_voxel_basis(vol, 1, 1, value_threshold=0.0)
    img, def2 = forward_splat_project(
        jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
        jnp.zeros((3, Z.shape[0]), jnp.float32), 0.0, 0.0, 0.0, 32)
    ref = vol.sum(axis=0)
    err = np.abs(np.asarray(img) - ref).max() / ref.max()
    assert float(def2) == 0.0
    assert err < 1e-3


def test_fit_recovers_deformation():
    """Particles projected from a deformed volume: fitting must raise the
    correlation well above the undeformed projection's."""
    vol = _blob_vol()
    pos, vals, Z = masked_voxel_basis(vol, 2, 2,
                                      value_threshold=1e-3)
    K = Z.shape[0]
    rng = np.random.default_rng(0)
    c_true = np.zeros((3, K), np.float32)
    c_true[0, 1] = 2.0       # a smooth x-displacement field
    c_true[1, 2] = -1.5
    angles = np.array([[10.0, 30.0, 0.0], [40.0, 60.0, 15.0]], np.float32)
    imgs = []
    for rot, tilt, psi in angles:
        img, _ = forward_splat_project(
            jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
            jnp.asarray(c_true), rot, tilt, psi, 32)
        imgs.append(np.asarray(img))
    imgs = np.stack(imgs)

    def corr_at(c):
        cs = []
        for k, (rot, tilt, psi) in enumerate(angles):
            p, _ = forward_splat_project(
                jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
                jnp.asarray(c), rot, tilt, psi, 32)
            p = np.asarray(p)
            cs.append(np.corrcoef(p.ravel(), imgs[k].ravel())[0, 1])
        return np.mean(cs)

    base = corr_at(np.zeros((3, K), np.float32))
    c3, dpose, corr, deform = fit_forward_zernike_batch(
        jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
        jnp.asarray(imgs), jnp.asarray(angles[:, 0]),
        jnp.asarray(angles[:, 1]), jnp.asarray(angles[:, 2]),
        jnp.zeros((2, 3, K), jnp.float32), 0.001, 32, 80)
    fitted = float(np.mean(np.asarray(corr)))
    # the residual correlation gap must close by >90%
    assert (1 - fitted) < 0.1 * (1 - base)
    assert fitted > 0.9999
    assert np.all(np.asarray(deform) > 0.1)   # found a real deformation


def test_forward_zernike_cli_and_priors(tmp_path):
    d = str(tmp_path)
    vol = _blob_vol()
    Image(vol).write(d + "/vol.mrc")
    pos, vals, Z = masked_voxel_basis(vol, 2, 2, value_threshold=1e-3)
    K = Z.shape[0]
    c_true = np.zeros((3, K), np.float32)
    c_true[0, 1] = 1.5
    rows = []
    for i, (rot, tilt) in enumerate([(20.0, 40.0), (70.0, 65.0)]):
        img, _ = forward_splat_project(
            jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
            jnp.asarray(c_true), rot, tilt, 0.0, 32)
        Image(np.asarray(img)).write(d + f"/p{i}.mrc")
        rows.append({"image": d + f"/p{i}.mrc", "angleRot": rot,
                     "angleTilt": tilt, "anglePsi": 0.0})
    MetaData.fromRows(rows).write(d + "/parts.xmd")

    p = get_program("forward_zernike_images")
    assert type(p).__name__ == "ProgForwardZernikeImages"
    p.read(["x", "-i", d + "/parts.xmd", "--ref", d + "/vol.mrc",
            "-o", d + "/out.xmd", "--l1", "2", "--l2", "2",
            "--steps", "50", "-v", "0", "--optimizeDeformation",
            "--blobr", "-1", "--max_resolution", "0"])
    assert p.tryRun() == 0
    out = MetaData(d + "/out.xmd")
    assert "sphCoefficients" in out.df.columns
    assert p.mean_corr > 0.95

    # priors variant: seeding with the previous output must start (and
    # stay) at least as good
    p2 = get_program("forward_zernike_images_priors")
    assert type(p2).__name__ == "ProgForwardZernikeImagesPriors"
    p2.read(["x", "-i", d + "/out.xmd", "--ref", d + "/vol.mrc",
             "-o", d + "/out2.xmd", "--l1", "2", "--l2", "2",
             "--steps", "10", "-v", "0", "--optimizeDeformation",
             "--blobr", "-1", "--max_resolution", "0"])
    assert p2.tryRun() == 0
    assert p2.mean_corr > 0.95


def test_blob_splat_profile_unit_mass():
    """The projected-KB splat footprint integrates to ~1 on the plane and
    decreases with radius (reference blob order 2, alpha 7.05)."""
    from xmipp3_tpu.ops.forward_zernike import blob_splat_profile
    prof, taps = blob_splat_profile(4.0)
    assert taps == 4
    s = np.arange(len(prof)) / 32.0
    mass = np.trapezoid(2 * np.pi * s * prof, s)
    assert abs(mass - 1.0) < 0.02
    assert prof[0] > prof[32] > prof[96]


def test_blob_splat_preserves_total_intensity():
    vol = _blob_vol()
    pos, vals, Z = masked_voxel_basis(vol, 1, 1, value_threshold=1e-3)
    from xmipp3_tpu.ops.forward_zernike import blob_splat_profile
    prof, taps = blob_splat_profile(2.0)
    img_b, _ = forward_splat_project(
        jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
        jnp.zeros((3, Z.shape[0]), jnp.float32), 0.0, 0.0, 0.0, 32,
        blob_profile=jnp.asarray(prof), n_taps=taps)
    assert abs(float(img_b.sum()) - vals.sum()) / vals.sum() < 0.02


def test_pairs_mode_and_per_image_poses(tmp_path):
    """image + image1 columns trigger the pairs mode: one shared
    coefficient set, per-image poses written back with the angleRot2
    suffix (reference forward_zernike_images.cpp:653-683)."""
    d = str(tmp_path)
    vol = _blob_vol()
    Image(vol).write(d + "/vol.mrc")
    pos, vals, Z = masked_voxel_basis(vol, 2, 2, value_threshold=1e-3)
    K = Z.shape[0]
    c_true = np.zeros((3, K), np.float32)
    c_true[0, 1] = 1.5
    poses = [(20.0, 40.0), (75.0, 60.0)]
    for i, (rot, tilt) in enumerate(poses):
        img, _ = forward_splat_project(
            jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
            jnp.asarray(c_true), rot, tilt, 0.0, 32)
        Image(np.asarray(img)).write(d + f"/p{i}.mrc")
    MetaData.fromRows([{
        "image": d + "/p0.mrc", "angleRot": 20.0, "angleTilt": 40.0,
        "anglePsi": 0.0, "image1": d + "/p1.mrc", "angleRot2": 75.0,
        "angleTilt2": 60.0, "anglePsi2": 0.0,
    }]).write(d + "/pairs.xmd")
    p = get_program("forward_zernike_images")
    p.read(["x", "-i", d + "/pairs.xmd", "--ref", d + "/vol.mrc",
            "-o", d + "/out.xmd", "--l1", "2", "--l2", "2",
            "--steps", "60", "-v", "0", "--optimizeDeformation",
            "--blobr", "-1", "--max_resolution", "0"])
    assert p.tryRun() == 0
    out = MetaData(d + "/out.xmd")
    row = next(out.iterRows())
    assert "angleRot2" in row and abs(row["angleRot2"] - 75.0) < 1e-3
    assert p.mean_corr > 0.95
    c_fit = np.asarray(row["sphCoefficients"]).reshape(3, -1)
    assert c_fit.shape[1] == K


def test_resume_skips_done_rows(tmp_path):
    d = str(tmp_path)
    vol = _blob_vol()
    Image(vol).write(d + "/vol.mrc")
    img = vol.sum(axis=0)
    Image(img.astype(np.float32)).write(d + "/p0.mrc")
    MetaData.fromRows([{"image": d + "/p0.mrc", "angleRot": 0.0,
                        "angleTilt": 0.0, "anglePsi": 0.0}]).write(
        d + "/parts.xmd")
    args = ["x", "-i", d + "/parts.xmd", "--ref", d + "/vol.mrc",
            "-o", "out.xmd", "--odir", d, "--l1", "1", "--l2", "1",
            "--steps", "5", "-v", "0", "--optimizeDeformation",
            "--blobr", "-1", "--max_resolution", "0", "--resume"]
    p = get_program("forward_zernike_images")
    p.read(list(args))
    assert p.tryRun() == 0
    import os
    assert os.path.exists(d + "/sphDone.xmd")
    c1 = np.asarray(next(MetaData(d + "/out.xmd").iterRows())
                    ["sphCoefficients"])
    # resumed run touches no rows: coefficients identical even though the
    # step count differs
    p2 = get_program("forward_zernike_images")
    args2 = list(args)
    args2[args2.index("--steps") + 1] = "40"
    p2.read(args2)
    assert p2.tryRun() == 0
    c2 = np.asarray(next(MetaData(d + "/out.xmd").iterRows())
                    ["sphCoefficients"])
    np.testing.assert_allclose(c1, c2)


def test_use_ctf_forward_model(tmp_path):
    """--useCTF folds the rows' CTF into the forward projection: fitting
    CTF-affected images with --useCTF must beat fitting them without."""
    d = str(tmp_path)
    vol = _blob_vol()
    Image(vol).write(d + "/vol.mrc")
    pos, vals, Z = masked_voxel_basis(vol, 1, 1, value_threshold=1e-3)
    from xmipp3_tpu.ops.forward_zernike import _ctf_spec
    img, _ = forward_splat_project(
        jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
        jnp.zeros((3, Z.shape[0]), jnp.float32), 15.0, 30.0, 0.0, 32)
    lam_e = 12.2643247 / np.sqrt(300e3 * (1 + 0.978466e-6 * 300e3))
    consts = (float(np.pi * lam_e),
              float(np.pi / 2 * 2.7e7 * lam_e ** 3 / 1),
              float(np.sqrt(1 - 0.07 ** 2)), 0.07, 2.0)
    ctf = _ctf_spec(32, 18000.0, 16000.0, 20.0, consts, False)
    img_ctf = np.asarray(jnp.fft.irfft2(jnp.fft.rfft2(img) * ctf,
                                        (32, 32)))
    Image(img_ctf.astype(np.float32)).write(d + "/p0.mrc")
    MetaData.fromRows([{
        "image": d + "/p0.mrc", "angleRot": 15.0, "angleTilt": 30.0,
        "anglePsi": 0.0, "ctfDefocusU": 18000.0, "ctfDefocusV": 16000.0,
        "ctfDefocusAngle": 20.0, "ctfVoltage": 300.0,
        "ctfSphericalAberration": 2.7, "ctfQ0": 0.07,
    }]).write(d + "/parts.xmd")
    base_args = ["x", "-i", d + "/parts.xmd", "--ref", d + "/vol.mrc",
                 "--l1", "1", "--l2", "1", "--steps", "5", "-v", "0",
                 "--optimizeDeformation", "--blobr", "-1",
                 "--max_resolution", "0", "--sampling", "2.0"]
    p = get_program("forward_zernike_images")
    p.read(base_args + ["-o", d + "/ctf.xmd", "--useCTF"])
    assert p.tryRun() == 0
    p2 = get_program("forward_zernike_images")
    p2.read(base_args + ["-o", d + "/noctf.xmd"])
    assert p2.tryRun() == 0
    assert p.mean_corr > 0.995 > p2.mean_corr
