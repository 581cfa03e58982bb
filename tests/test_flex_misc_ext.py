"""flex_misc_ext programs: NMA image alignment, Zernike subtomo fitting,
deformation-aware ART, FTTRI/CLTomo classification, ab-initio volume,
phantom_transform, volume_to_web, resolution_pdb_bfactor, benchmarks."""
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
def blob_volume(tmp_path_factory):
    d = str(tmp_path_factory.mktemp("vol"))
    N = 32
    vol = np.zeros((N, N, N), np.float32)
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N] - N // 2
    for (cx, cy, cz, r, a) in [(0, 0, 0, 7, 1.0), (5, -4, 3, 3, 0.8),
                               (-6, 3, -2, 3, 0.9), (3, 6, -5, 2, 0.7)]:
        vol += a * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2
                             + (zz - cz) ** 2) / (2 * (r / 2) ** 2))
                          ).astype(np.float32)
    Image(vol).write(f"{d}/vol.vol")
    return d, vol


def test_nma_alignment_recovers_amplitudes(tmp_path):
    import jax.numpy as jnp
    from xmipp3_tpu.core.pdb import AtomicModel, write_pdb, rasterize
    from xmipp3_tpu.models.nma import (displacement_field,
                                       elastic_network_modes, warp_volume_field,
                                       write_modes)
    from xmipp3_tpu.ops.project import FourierProjector
    d = str(tmp_path)
    rng = np.random.default_rng(0)
    coords = rng.normal(0, 5, (30, 3))
    model = AtomicModel(coords, ["C"] * 30, np.full(30, 10.0), np.ones(30))
    write_pdb(f"{d}/s.pdb", model)
    modes, _ = elastic_network_modes(coords, n_modes=2)
    files = write_modes(f"{d}/mode", np.asarray(modes))
    open(f"{d}/modes.txt", "w").write("\n".join(files))
    N, B = 32, 6
    vol = np.asarray(rasterize(model, N, 1.0), np.float32)
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(0.3, 1, B))).astype(np.float32)
    amps = rng.uniform(-8, 8, (B, 2)).astype(np.float32)
    imgs = []
    for i in range(B):
        field = displacement_field(coords, np.asarray(modes), amps[i], N, 1.0)
        dv = np.asarray(warp_volume_field(jnp.asarray(vol),
                                          jnp.asarray(field)))
        imgs.append(np.asarray(FourierProjector(dv).project_euler(
            rot[i:i + 1], tilt[i:i + 1], np.zeros(1, np.float32)))[0])
    Image(np.stack(imgs).astype(np.float32)).write(f"{d}/p.mrcs")
    MetaData.fromRows([{"image": f"{i+1:06d}@{d}/p.mrcs",
                        "angleRot": float(rot[i]),
                        "angleTilt": float(tilt[i]), "anglePsi": 0.0}
                       for i in range(B)]).write(f"{d}/p.xmd")
    p = _run("nma_alignment", ["-i", f"{d}/p.xmd", "--pdb", f"{d}/s.pdb",
                               "--modes", f"{d}/modes.txt",
                               "-o", f"{d}/out.xmd", "--steps", "60"])
    err = np.sqrt(((p.amplitudes - amps) ** 2).mean())
    assert err < 1.5, f"amplitude rms error {err}"


def test_forward_zernike_subtomos(blob_volume, tmp_path):
    import jax.numpy as jnp
    from xmipp3_tpu.ops.zernike import deform_volume, zernike_basis_grid
    d0, vol = blob_volume
    d = str(tmp_path)
    basis = zernike_basis_grid(vol.shape[0], 2, 2)
    rng = np.random.default_rng(2)
    c = rng.normal(0, 0.6, (3, basis.shape[0])).astype(np.float32)
    dv = np.asarray(deform_volume(jnp.asarray(vol), jnp.asarray(basis),
                                  jnp.asarray(c)))
    Image(dv.astype(np.float32)).write(f"{d}/def.vol")
    MetaData.fromRows([{"image": f"{d}/def.vol", "itemId": 1}]
                      ).write(f"{d}/def.xmd")
    _run("forward_zernike_subtomos",
         ["-i", f"{d}/def.xmd", "--ref", f"{d0}/vol.vol",
          "-o", f"{d}/fit.xmd", "--l1", "2", "--l2", "2", "--steps", "60"])
    md = MetaData(f"{d}/fit.xmd")
    assert md.getValue("maxCC", 0) > 0.98


@pytest.mark.slow
def test_art_zernike3d_two_states(blob_volume, tmp_path):
    import jax.numpy as jnp
    from xmipp3_tpu.ops.project import FourierProjector
    from xmipp3_tpu.ops.zernike import deform_volume, zernike_basis_grid
    d0, vol = blob_volume
    d = str(tmp_path)
    basis = zernike_basis_grid(vol.shape[0], 2, 2)
    rng = np.random.default_rng(3)
    c1 = rng.normal(0, 0.5, (3, basis.shape[0])).astype(np.float32)
    imgs, rows = [], []
    for c in (c1, -c1):
        dv = np.asarray(deform_volume(jnp.asarray(vol), jnp.asarray(basis),
                                      jnp.asarray(c)))
        B = 24
        rot = rng.uniform(-180, 180, B).astype(np.float32)
        tilt = np.degrees(np.arccos(rng.uniform(-1, 1, B))
                          ).astype(np.float32)
        psi = rng.uniform(-180, 180, B).astype(np.float32)
        p = np.asarray(FourierProjector(dv).project_euler(rot, tilt, psi))
        for i in range(B):
            imgs.append(p[i])
            rows.append({"angleRot": float(rot[i]),
                         "angleTilt": float(tilt[i]),
                         "anglePsi": float(psi[i]),
                         "sphCoefficients": c.ravel().astype(np.float64)})
    Image(np.stack(imgs).astype(np.float32)).write(f"{d}/p.mrcs")
    for i, r in enumerate(rows):
        r["image"] = f"{i+1:06d}@{d}/p.mrcs"
    MetaData.fromRows(rows).write(f"{d}/p.xmd")
    p = _run("art_zernike3d", ["-i", f"{d}/p.xmd", "-o", f"{d}/rec.vol",
                               "--clusters", "2", "--niter", "3"])
    rec = np.squeeze(Image(f"{d}/rec.vol").data)
    assert np.corrcoef(vol.ravel(), rec.ravel())[0, 1] > 0.98
    # clusters must separate the two conformations
    assert len(set(p.labels[:24])) == 1 and len(set(p.labels[24:])) == 1
    assert p.labels[0] != p.labels[24]


def test_classify_fttri(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(4)
    yy, xx = np.mgrid[0:32, 0:32] - 16
    shapes = [np.exp(-((xx ** 2 + yy ** 2) / 30)),
              np.exp(-((xx ** 2 / 6 + yy ** 2) / 30))]
    imgs, gt = [], []
    for si, s in enumerate(shapes):
        for _ in range(8):
            # random shift + rotation: FTTRI features must be invariant
            img = np.roll(np.roll(s, rng.integers(-3, 4), 0),
                          rng.integers(-3, 4), 1)
            img = np.rot90(img, rng.integers(0, 4))
            imgs.append(img + rng.normal(0, 0.03, img.shape))
            gt.append(si)
    Image(np.stack(imgs).astype(np.float32)).write(f"{d}/s.mrcs")
    MetaData.fromRows([{"image": f"{i+1:06d}@{d}/s.mrcs"}
                       for i in range(16)]).write(f"{d}/s.xmd")
    p = _run("classify_FTTRI", ["-i", f"{d}/s.xmd", "-o", f"{d}/c.xmd",
                                "--nref", "2"])
    gt = np.asarray(gt)
    purity = sum(max(np.sum((p.labels == c) & (gt == g)) for g in range(2))
                 for c in set(p.labels)) / len(gt)
    assert purity >= 0.9


def test_classify_cltomo(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(5)
    N = 20
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N] - N // 2
    c1 = np.exp(-((xx ** 2 + yy ** 2 + zz ** 2) / 16.0))
    c2 = np.exp(-((xx ** 2 / 24 + yy ** 2 / 5 + zz ** 2 / 5)))
    f = np.fft.fftfreq(N)
    fz, fy, fx = np.meshgrid(f, f, f, indexing="ij")
    wedge = np.abs(fz) <= np.abs(fx) * np.tan(np.deg2rad(60)) + 1e-9
    rows, gt = [], []
    for i in range(12):
        base = c1 if i % 2 == 0 else c2
        gt.append(i % 2)
        v = base + rng.normal(0, 0.25, base.shape)
        v = np.real(np.fft.ifftn(np.fft.fftn(v) * wedge)).astype(np.float32)
        Image(v).write(f"{d}/s{i}.vol")
        rows.append({"image": f"{d}/s{i}.vol"})
    MetaData.fromRows(rows).write(f"{d}/s.xmd")
    p = _run("classify_CLTomo_prog", ["-i", f"{d}/s.xmd", "-o", f"{d}/c.xmd",
                                      "--nref", "2", "--oroot",
                                      f"{d}/cls"])
    gt = np.asarray(gt)
    purity = sum(max(np.sum((p.labels == c) & (gt == g)) for g in range(2))
                 for c in set(p.labels)) / len(gt)
    assert purity >= 0.75


def test_phantom_transform(tmp_path):
    d = str(tmp_path)
    open(f"{d}/p.descr", "w").write("32 32 32 0\nsph + 1 0 0 0 5\n")
    _run("phantom_transform", ["-i", f"{d}/p.descr", "-o", f"{d}/s.descr",
                               "--operation", "shift", "2", "3", "-1"])
    from xmipp3_tpu.ops.phantom import Phantom
    ph = Phantom.read(f"{d}/s.descr")
    np.testing.assert_allclose(ph.features[0].center, [2, 3, -1])


def test_volume_to_web(blob_volume, tmp_path):
    d0, _ = blob_volume
    d = str(tmp_path)
    _run("volume_to_web", ["-i", f"{d0}/vol.vol",
                           "--central_slices", f"{d}/sl.png", "6",
                           "--projections", f"{d}/pr.png"])
    sl = np.squeeze(Image(f"{d}/sl.png").data)
    pr = np.squeeze(Image(f"{d}/pr.png").data)
    assert sl.ndim == 2 and sl.shape[1] > sl.shape[0]
    assert pr.ndim == 2 and pr.std() > 0


def test_resolution_pdb_bfactor(tmp_path):
    d = str(tmp_path)
    rng = np.random.default_rng(6)
    N = 40
    res = (3.0 + 6.0 * (np.mgrid[0:N, 0:N, 0:N][2] / N)).astype(np.float32)
    Image(res).write(f"{d}/res.vol")
    lines = []
    for i in range(25):
        x, y, z = (rng.uniform(4, N - 4) for _ in range(3))
        b = 20 + 30 * (x / N) + rng.normal(0, 0.5)
        lines.append(f"ATOM  {i+1:5d}  CA  ALA A{i+1:4d}    "
                     f"{x:8.3f}{y:8.3f}{z:8.3f}  1.00{b:6.2f}"
                     "           C\n")
    open(f"{d}/m.pdb", "w").writelines(lines + ["END\n"])
    p = _run("resolution_pdb_bfactor",
             ["--atmodel", f"{d}/m.pdb", "--vol", f"{d}/res.vol",
              "-o", f"{d}/bf.xmd"])
    assert p.correlation > 0.9


def test_performance_and_write_benchmarks(tmp_path):
    p = _run("performance_test", ["--size", "64", "--batch", "4"])
    assert p.results["matmul_gflops"] > 0
    p2 = _run("write_test", ["--size", "2", "-o",
                             str(tmp_path / "wt.mrcs")])
    assert p2.mb_per_s > 0


def test_classify_fttri_full_flags(tmp_path):
    """Round-4 FTTRI flags: oroot/padding/maxfreq/zoom/nmin/iter/
    sigma1/sigma2/doPhase (mpi_classify_FTTRI.cpp:82-99)."""
    import os
    d = str(tmp_path)
    rng = np.random.default_rng(7)
    yy, xx = np.mgrid[0:32, 0:32] - 16
    shapes = [np.exp(-((xx ** 2 + yy ** 2) / 30)),
              np.exp(-((xx ** 2 / 6 + yy ** 2) / 30))]
    imgs, gt = [], []
    for si, s in enumerate(shapes):
        for _ in range(8):
            img = np.roll(np.roll(s, rng.integers(-3, 4), 0),
                          rng.integers(-3, 4), 1)
            imgs.append(np.rot90(img, rng.integers(0, 4))
                        + rng.normal(0, 0.03, img.shape))
            gt.append(si)
    Image(np.stack(imgs).astype(np.float32)).write(f"{d}/s.mrcs")
    MetaData.fromRows([{"image": f"{i+1:06d}@{d}/s.mrcs"}
                       for i in range(16)]).write(f"{d}/s.xmd")
    p = _run("classify_FTTRI",
             ["-i", f"{d}/s.xmd", "--oroot", f"{d}/ft", "--nref", "4",
              "--padding", "2", "--maxfreq", "0.3", "--zoom", "2.8",
              "--sigma1", "0.707", "--sigma2", "1.5", "--nmin", "5",
              "--iter", "6", "--doPhase"])
    # feature stack and mask written under the rootname
    assert os.path.exists(f"{d}/ft_FTTRI.mrcs")
    assert os.path.exists(f"{d}/ft_mask.mrc")
    assert os.path.exists(f"{d}/ft_classes.xmd")
    gt = np.asarray(gt)
    # nmin pruning dissolves the tiny spurious classes of nref=4
    assert len(set(p.labels)) <= 3
    purity = sum(max(np.sum((p.labels == c) & (gt == g)) for g in range(2))
                 for c in set(p.labels)) / len(gt)
    assert purity >= 0.85
