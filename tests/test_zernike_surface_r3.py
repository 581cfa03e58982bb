"""Round-3 Zernike/sph/art family full-surface tests (reference grammars
volume_deform_sph.cpp:37-49, forward_zernike_volume.cpp:120-135,
forward_zernike_subtomos.cpp:113-134, art_zernike3d.cpp:96-112,
forward_art_zernike3d_gpu.cpp:132-168)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    p = get_program(name)
    p.read(["x"] + args.split())
    assert p.tryRun() == 0, name
    return p


def _vol(n=24):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    return (np.exp(-((z - 12) ** 2 + (y - 9) ** 2 + (x - 14) ** 2) / 8)
            + 0.6 * np.exp(-((z - 15) ** 2 + (y - 15) ** 2
                             + (x - 9) ** 2) / 6)).astype(np.float32)


def test_wedge_aware_average_recovers_reference():
    """Rotating wedge-filtered copies back with analytic wedge coverage
    normalization must beat the naive mean."""
    from xmipp3_tpu.ops.art import wedge_aware_average
    from xmipp3_tpu.ops.fourier_filter import wedge_mask_3d
    from xmipp3_tpu.ops.geo import apply_affine_3d
    ref = _vol()
    n = ref.shape[0]
    rng = np.random.default_rng(0)
    rot = rng.uniform(-180, 180, 6).astype(np.float32)
    tilt = rng.uniform(0, 180, 6).astype(np.float32)
    psi = rng.uniform(-180, 180, 6).astype(np.float32)
    subs = []
    for k in range(6):
        A = np.asarray(euler_matrix(rot[k:k + 1], tilt[k:k + 1],
                                    psi[k:k + 1]))[0]
        v = np.asarray(apply_affine_3d(jnp.asarray(ref), jnp.asarray(A))[0])
        w = wedge_mask_3d(n, n, n, -50, 50, rot=rot[k], tilt=tilt[k],
                          psi=psi[k])
        subs.append(np.fft.irfftn(np.fft.rfftn(v) * w, (n, n, n),
                                  axes=(0, 1, 2)).astype(np.float32))
    subs = np.stack(subs)
    avg = wedge_aware_average(subs, rot, tilt, psi, -50, 50)
    cc = np.corrcoef(avg.ravel(), ref.ravel())[0, 1]
    assert cc > 0.85
    # the estimator's defining property: a Fourier voxel covered by only
    # ONE wedge keeps full amplitude (naive averaging attenuates it 1/B)
    w_all = [wedge_mask_3d(n, n, n, -50, 50, rot=rot[k], tilt=tilt[k],
                           psi=psi[k]) for k in range(6)]
    cov = np.sum(w_all, axis=0)
    single = (cov == 1)
    F_ref = np.fft.rfftn(ref)
    F_avg = np.fft.rfftn(avg)
    lo = np.zeros_like(cov, bool)
    lo[:4] = lo[-4:] = True          # restrict to low |k| rows (reliable)
    m = single & lo & (np.abs(F_ref) > np.abs(F_ref).max() * 1e-3)
    if m.sum() >= 10:
        ratio = np.abs(F_avg[m]).sum() / np.abs(F_ref[m]).sum()
        assert 0.5 < ratio < 1.5     # restored, not divided by coverage 6


def test_volume_deform_sph_sigma_strain_radius(tmp_path):
    """--sigma multiresolution + --regularization + --analyzeStrain +
    --optimizeRadius: the fit still recovers the deformation and the
    strain volumes are written and finite."""
    from xmipp3_tpu.ops.zernike import deform_volume, zernike_basis_grid
    d = str(tmp_path)
    vol = _vol()
    basis = zernike_basis_grid(vol.shape[0], 1, 1)
    c = np.zeros((3, basis.shape[0]), np.float32)
    c[0, 1] = 1.5
    target = np.asarray(deform_volume(jnp.asarray(vol), jnp.asarray(basis),
                                      jnp.asarray(c)))
    Image(vol).write(d + "/v.vol")
    Image(target).write(d + "/t.vol")
    p = run_prog("volume_deform_sph",
                 f"-i {d}/v.vol -r {d}/t.vol -o {d}/def.vol --l1 1 --l2 1 "
                 f"--steps 60 --sigma 0 1 --regularization 1e-4 "
                 f"--analyzeStrain --oroot {d}/Vol")
    assert p.ncc > 0.97
    strain = np.squeeze(Image(d + "/Vol_strain.vol").data)
    rotv = np.squeeze(Image(d + "/Vol_rotation.vol").data)
    assert np.all(np.isfinite(strain)) and np.all(np.isfinite(rotv))
    assert strain.max() > 0      # a real displacement gradient exists
    md = MetaData(d + "/Vol.xmd")
    assert md.containsLabel("sphCoefficients")
    # radius search returns one of the candidates and not a worse fit
    p2 = run_prog("volume_deform_sph",
                  f"-i {d}/v.vol -r {d}/t.vol -o {d}/def2.vol --l1 1 "
                  f"--l2 1 --steps 30 --optimizeRadius")
    assert p2.ncc >= 0.9


def test_forward_zernike_volume_distinct_engine(tmp_path):
    """forward_zernike_volume fits through the forward splat model and
    honors --maski/--clnm seeding."""
    from xmipp3_tpu.ops.forward_zernike import (forward_splat_volume,
                                                masked_voxel_basis)
    d = str(tmp_path)
    vol = _vol()
    pos, vals, Z = masked_voxel_basis(vol, 1, 1, value_threshold=1e-3)
    c = np.zeros((3, Z.shape[0]), np.float32)
    c[0, 1] = 1.2
    target, _ = forward_splat_volume(
        jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
        jnp.asarray(c), 0.0, 0.0, 0.0, vol.shape[0])
    Image(vol).write(d + "/v.vol")
    Image(np.asarray(target)).write(d + "/t.vol")
    p = get_program("forward_zernike_volume")
    assert type(p).__name__ == "ProgForwardZernikeVolume"
    p.read(["x", "-i", d + "/v.vol", "-r", d + "/t.vol", "-o",
            d + "/def.vol", "--l1", "1", "--l2", "1", "--steps", "80",
            "--oroot", d + "/Fwd"])
    assert p.tryRun() == 0
    assert p.ncc > 0.97
    # seed a second run from the first's coefficients: starts converged
    p2 = get_program("forward_zernike_volume")
    p2.read(["x", "-i", d + "/v.vol", "-r", d + "/t.vol", "-o",
             d + "/def2.vol", "--l1", "1", "--l2", "1", "--steps", "5",
             "--clnm", d + "/Fwd.xmd"])
    assert p2.tryRun() == 0
    assert p2.ncc > 0.95


def test_apply_coefficient_blob_and_mask(tmp_path):
    from xmipp3_tpu.ops.zernike import zernike_indices
    d = str(tmp_path)
    vol = _vol()
    Image(vol).write(d + "/v.vol")
    K = len(zernike_indices(1, 1))
    c = np.zeros((3, K), np.float64)
    c[0, 1] = 1.0
    MetaData.fromRows([{"sphCoefficients": c.ravel(),
                        "image": d + "/v.vol"}]).write(d + "/c.xmd")
    run_prog("volume_apply_coefficient_zernike3d",
             f"-i {d}/v.vol --clnm {d}/c.xmd -o {d}/back.vol --l1 1 --l2 1")
    run_prog("volume_apply_coefficient_zernike3d",
             f"-i {d}/v.vol --clnm {d}/c.xmd -o {d}/fwd.vol --l1 1 --l2 1 "
             f"--blobr 2 --step 1")
    back = np.squeeze(Image(d + "/back.vol").data)
    fwd = np.squeeze(Image(d + "/fwd.vol").data)
    # forward splat and backward warp of the same small displacement agree
    cc = np.corrcoef(back.ravel(), fwd.ravel())[0, 1]
    assert cc > 0.95
    # both moved the volume (not identity)
    assert np.corrcoef(back.ravel(), vol.ravel())[0, 1] < 0.999


def test_forward_zernike_subtomos_wedge_fit(tmp_path):
    """The 3-D forward fit recovers a deformation from wedge-filtered
    subtomograms and honors the optimize gates."""
    from xmipp3_tpu.ops.forward_zernike import (forward_splat_volume,
                                                masked_voxel_basis)
    from xmipp3_tpu.ops.fourier_filter import wedge_mask_3d
    d = str(tmp_path)
    vol = _vol()
    n = vol.shape[0]
    pos, vals, Z = masked_voxel_basis(vol, 1, 1, value_threshold=1e-3)
    c = np.zeros((3, Z.shape[0]), np.float32)
    c[1, 1] = 1.3
    w = wedge_mask_3d(n, n, n, -60, 60)
    rows = []
    for i, (rot, tilt) in enumerate([(0.0, 0.0), (25.0, 40.0)]):
        sub, _ = forward_splat_volume(
            jnp.asarray(pos), jnp.asarray(vals), jnp.asarray(Z),
            jnp.asarray(c), rot, tilt, 0.0, n)
        sub = np.fft.irfftn(np.fft.rfftn(np.asarray(sub)) * w, (n, n, n),
                            axes=(0, 1, 2)).astype(np.float32)
        Image(sub).write(d + f"/s{i}.mrc")
        rows.append({"image": d + f"/s{i}.mrc", "angleRot": rot,
                     "angleTilt": tilt, "anglePsi": 0.0})
    Image(vol).write(d + "/ref.vol")
    MetaData.fromRows(rows).write(d + "/subs.xmd")
    p = run_prog("forward_zernike_subtomos",
                 f"-i {d}/subs.xmd --ref {d}/ref.vol -o {d}/out.xmd "
                 f"--l1 1 --l2 1 --steps 60 --optimizeDeformation "
                 f"--t1 -60 --t2 60 --max_resolution 0")
    md = MetaData(d + "/out.xmd")
    ccs = [float(r["maxCC"]) for r in md.iterRows()]
    assert min(ccs) > 0.95
    # correlation is scale-invariant and the regularizer shrinks the
    # coefficients: recovery is directional — the true mode dominates
    cf = np.asarray(next(md.iterRows())["sphCoefficients"]).reshape(3, -1)
    assert cf[1, 1] > 0.4
    assert np.abs(cf).max() == pytest.approx(abs(cf[1, 1]))


def test_art_zernike3d_full_flags(tmp_path):
    """--ref init + --regularization + --save_iter + --resume + --odir on
    the deformation-aware reconstruction."""
    from xmipp3_tpu.ops.project import FourierProjector
    d = str(tmp_path)
    vol = _vol()
    rng = np.random.default_rng(1)
    B = 20
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, B))).astype(np.float32)
    psi = rng.uniform(-180, 180, B).astype(np.float32)
    imgs = np.asarray(FourierProjector(vol).project_euler(rot, tilt, psi))
    Image(imgs).write(d + "/p.mrcs")
    rows = [{"image": f"{i + 1:06d}@{d}/p.mrcs", "angleRot": float(rot[i]),
             "angleTilt": float(tilt[i]), "anglePsi": float(psi[i])}
            for i in range(B)]
    MetaData.fromRows(rows).write(d + "/p.xmd")
    Image(vol).write(d + "/init.vol")
    p = run_prog("art_zernike3d",
                 f"-i {d}/p.xmd -o rec.vol --odir {d} --niter 2 "
                 f"--clusters 1 --ref {d}/init.vol --regularization 1e-3 "
                 f"--save_iter 1 --resume")
    rec = np.squeeze(Image(d + "/rec.vol").data)
    assert np.corrcoef(rec.ravel(), vol.ravel())[0, 1] > 0.95
    assert os.path.exists(d + "/rec_iter001.vol")
    # resume: rerun returns immediately with the existing volume
    p2 = run_prog("art_zernike3d",
                  f"-i {d}/p.xmd -o rec.vol --odir {d} --niter 2 "
                  f"--clusters 1 --resume")
    np.testing.assert_allclose(np.squeeze(Image(d + "/rec.vol").data), rec)


def test_cuda11_forward_art_regularizers(tmp_path):
    """TV/L1/soft-threshold/positivity produce a valid, sparser volume;
    --sym c2 symmetrizes."""
    from xmipp3_tpu.ops.project import FourierProjector
    d = str(tmp_path)
    vol = _vol()
    rng = np.random.default_rng(2)
    B = 16
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, B))).astype(np.float32)
    psi = rng.uniform(-180, 180, B).astype(np.float32)
    imgs = np.asarray(FourierProjector(vol).project_euler(rot, tilt, psi))
    Image(imgs).write(d + "/p.mrcs")
    rows = [{"image": f"{i + 1:06d}@{d}/p.mrcs", "angleRot": float(rot[i]),
             "angleTilt": float(tilt[i]), "anglePsi": float(psi[i])}
            for i in range(B)]
    MetaData.fromRows(rows).write(d + "/p.xmd")
    p = get_program("cuda11_forward_art_zernike3d")
    assert type(p).__name__ == "ProgCuda11ForwardArtZernike3D"
    p.read(["x", "-i", d + "/p.xmd", "-o", d + "/rec.vol", "--niter", "2",
            "--clusters", "1", "--ltv", "1e-3", "--ll1", "1e-4",
            "--lst", "1e-4", "--ltk", "1e-3", "--onlyPositive",
            "--sym", "c2"])
    assert p.tryRun() == 0
    rec = np.squeeze(Image(d + "/rec.vol").data)
    assert rec.min() >= 0.0                        # onlyPositive
    assert np.corrcoef(rec.ravel(), vol.ravel())[0, 1] > 0.5
    # soft threshold produced exact zeros somewhere
    assert (rec == 0).mean() > 0.05


def test_subtomos_volume_input_wedge_path(tmp_path):
    """forward_art_zernike3d_subtomos with VOLUME inputs takes the
    wedge-aware average path."""
    from xmipp3_tpu.ops.fourier_filter import wedge_mask_3d
    from xmipp3_tpu.ops.geo import apply_affine_3d
    d = str(tmp_path)
    ref = _vol()
    n = ref.shape[0]
    rng = np.random.default_rng(3)
    rows = []
    rot = rng.uniform(-180, 180, 5).astype(np.float32)
    tilt = rng.uniform(0, 180, 5).astype(np.float32)
    psi = rng.uniform(-180, 180, 5).astype(np.float32)
    for k in range(5):
        A = np.asarray(euler_matrix(rot[k:k + 1], tilt[k:k + 1],
                                    psi[k:k + 1]))[0]
        v = np.asarray(apply_affine_3d(jnp.asarray(ref),
                                       jnp.asarray(A))[0])
        w = wedge_mask_3d(n, n, n, -55, 55, rot=rot[k], tilt=tilt[k],
                          psi=psi[k])
        sub = np.fft.irfftn(np.fft.rfftn(v) * w, (n, n, n),
                            axes=(0, 1, 2)).astype(np.float32)
        Image(sub).write(d + f"/s{k}.mrc")
        rows.append({"image": d + f"/s{k}.mrc", "angleRot": float(rot[k]),
                     "angleTilt": float(tilt[k]),
                     "anglePsi": float(psi[k])})
    MetaData.fromRows(rows).write(d + "/subs.xmd")
    run_prog("forward_art_zernike3d_subtomos",
             f"-i {d}/subs.xmd -o {d}/avg.vol --t1 -55 --t2 55")
    avg = np.squeeze(Image(d + "/avg.vol").data)
    assert np.corrcoef(avg.ravel(), ref.ravel())[0, 1] > 0.85
