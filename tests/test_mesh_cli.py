"""CLI-level mesh parallelism: the mpi_* endpoints run their hot path
sharded over the 8-device mesh and must reproduce the serial output — the
reference's 'mpirun -np 2 equals serial' guarantee (SURVEY.md §4,
tests/test_programs.py:57-59), ported to --mesh dp|tp|slab."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.programs import get_program


def run_prog(name, args):
    prog = get_program(name)
    rc = prog.run_with_args(args)
    assert rc == 0, f"{name} failed"
    return prog


@pytest.fixture(scope="module")
def dataset(tmp_path_factory):
    tmp_path = tmp_path_factory.mktemp("meshcli")
    n = 32
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for cz, cy, cx, s, a in [(0, 0, 0, 2.5, 1.0), (4, -3, 3, 1.5, 0.8),
                             (-3, 3, -2, 1.8, 0.6), (-5, -4, 1, 1.0, 1.1)]:
        vol += a * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                          / (2 * s ** 2))
    fn_vol = str(tmp_path / "phantom.vol")
    save_image(fn_vol, vol)
    root = str(tmp_path / "gallery")
    run_prog("angular_project_library",
             f"-i {fn_vol} -o {root} --sampling_rate 18 --sym c1")
    gallery = Image.read_stack(root + ".stk")
    md_g = MetaData(root + ".doc")

    rng = np.random.default_rng(1)
    n_parts = 21          # deliberately NOT a multiple of 8 (padding path)
    pick = rng.integers(0, len(gallery), n_parts)
    parts = gallery[pick] + 0.05 * gallery.std() * rng.standard_normal(
        (n_parts, n, n)).astype(np.float32)
    fn_parts = str(tmp_path / "particles.mrcs")
    save_image(fn_parts, parts)
    rows = []
    for i in range(n_parts):
        rows.append({"image": f"{i + 1:06d}@{fn_parts}", "itemId": i + 1,
                     "enabled": 1,
                     "angleRot": float(md_g.getColumn("angleRot")[pick[i]]),
                     "angleTilt": float(md_g.getColumn("angleTilt")[pick[i]]),
                     "anglePsi": 0.0})
    fn_md = str(tmp_path / "particles.xmd")
    MetaData.fromRows(rows).write(fn_md)
    return dict(tmp=tmp_path, vol=vol, fn_vol=fn_vol, root=root,
                fn_md=fn_md, pick=pick)


def _reconstruct(dataset, mode, tag):
    out = str(dataset["tmp"] / f"rec_{tag}.vol")
    run_prog("mpi_reconstruct_fourier",
             f"-i {dataset['fn_md']} -o {out} --mesh {mode}")
    return np.squeeze(Image(out).data)


def test_mpi_reconstruct_dp_matches_serial(dataset):
    serial = _reconstruct(dataset, "none", "serial")
    dp = _reconstruct(dataset, "dp", "dp")
    scale = np.abs(serial).max()
    assert np.abs(dp - serial).max() < 1e-3 * scale
    assert np.corrcoef(dp.ravel(), dataset["vol"].ravel())[0, 1] > 0.9


def test_mpi_reconstruct_slab_matches_serial(dataset):
    serial = _reconstruct(dataset, "none", "serial2")
    slab = _reconstruct(dataset, "slab", "slab")
    scale = np.abs(serial).max()
    assert np.abs(slab - serial).max() < 1e-3 * scale


def test_mpi_projection_matching_dp_tp_match_serial(dataset):
    outs = {}
    for mode in ("none", "dp", "tp"):
        fn = str(dataset["tmp"] / f"assign_{mode}.xmd")
        run_prog("mpi_angular_projection_matching",
                 f"-i {dataset['fn_md']} -o {fn} "
                 f"--ref {dataset['root']} --max_shift 4 --mesh {mode}")
        md = MetaData(fn)
        outs[mode] = md
        assert md.size() == len(dataset["pick"])
    ref_serial = outs["none"].getColumn("ref").astype(int)
    # the particles ARE (noisy) gallery projections: every match must be
    # excellent, but near-identical neighboring projections make the exact
    # argmax a tie — accuracy is asserted via maxCC, parity via refs below
    cc_serial = outs["none"].getColumn("maxCC")
    assert (cc_serial > 0.9).mean() > 0.9, cc_serial
    assert (ref_serial - 1 == dataset["pick"]).mean() > 0.5
    for mode in ("dp", "tp"):
        ref_m = outs[mode].getColumn("ref").astype(int)
        cc_m = outs[mode].getColumn("maxCC")
        # neighboring phantom projections are near-identical, so argmax ties
        # may flip under a different partitioning — a disagreement is only a
        # failure if the winner is genuinely worse, not an equal-quality tie
        same = ref_m == ref_serial
        tied = np.abs(cc_m - cc_serial) < 2e-3
        assert (same | tied).all(), (
            f"{mode}: refs {ref_m[~(same | tied)]} vs "
            f"{ref_serial[~(same | tied)]}, cc {cc_m[~(same | tied)]} vs "
            f"{cc_serial[~(same | tied)]}")
        assert same.mean() > 0.5, mode


def test_ml2d_mesh_matches_serial():
    """mpi_ml_align2d equivalent: the --mesh dp path must match the serial
    E/M steps (reference parallel/mpi_ml_align2d; psum-reduced stats)."""
    import jax
    from xmipp3_tpu.models.ml2d import ml2d
    from xmipp3_tpu.parallel.mesh import data_mesh
    rng = np.random.default_rng(3)
    n, B = 32, 44            # NOT a multiple of 8: exercises padded rows
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - 16
    protos = [np.exp(-(x ** 2 + y ** 2) / 30),
              np.exp(-(x ** 2 / 60 + y ** 2 / 8))]
    labels = rng.integers(0, 2, B)
    imgs = np.stack([protos[c] for c in labels]).astype(np.float32)
    imgs += 0.15 * rng.standard_normal(imgs.shape).astype(np.float32)
    serial = ml2d(imgs, 2, n_iters=4, max_shift=2, seed=0)
    par = ml2d(imgs, 2, n_iters=4, max_shift=2, seed=0, mesh=data_mesh(8))
    assert (serial["assignments"] == par["assignments"]).mean() > 0.95
    assert abs(serial["loglike"][-1] - par["loglike"][-1]) < \
        1e-2 * abs(serial["loglike"][-1])
    scale = np.abs(serial["refs"]).max()
    assert np.abs(serial["refs"] - par["refs"]).max() < 1e-3 * scale


def test_movie_local_align_mesh_matches_serial():
    """Patch-sharded local movie alignment equals the serial per-patch
    loop (reference FlexAlign stream pool,
    movie_alignment_correlation_gpu.cpp:649)."""
    import jax
    from xmipp3_tpu.ops import movie as mops
    from xmipp3_tpu.parallel.mesh import data_mesh
    from xmipp3_tpu.parallel.movie import local_align_mesh
    rng = np.random.default_rng(0)
    F, H, W = 6, 256, 256
    base = rng.standard_normal((H + 16, W + 16)).astype(np.float32)
    frames = np.stack([base[4 + i: 4 + i + H, 8 - i: 8 - i + W]
                       for i in range(F)])
    pos = mops.global_align(frames, max_shift_px=10)
    f1, cys1, cxs1 = mops.local_align(frames, pos, patches=(3, 3),
                                      patch_size=96, max_shift_px=4)
    mesh = data_mesh(8)
    f2, cys2, cxs2 = local_align_mesh(mesh, frames, pos, patches=(3, 3),
                                      patch_size=96, max_shift_px=4)
    assert (cys1 == cys2).all() and (cxs1 == cxs2).all()
    assert np.abs(f1 - f2).max() < 1e-3


def test_cl2d_mesh_matches_serial():
    """mpi_classify_CL2D equivalent: mesh CL2D == serial CL2D (reference
    parallel/mpi_classify_CL2D.h:190 shareAssignments)."""
    from xmipp3_tpu.models.cl2d import classify_cl2d
    from xmipp3_tpu.parallel.mesh import data_mesh
    rng = np.random.default_rng(5)
    n, B = 32, 36
    y, x = np.mgrid[0:n, 0:n].astype(np.float32) - 16
    protos = [np.exp(-(x ** 2 + y ** 2) / 30),
              np.exp(-(x ** 2 / 60 + y ** 2 / 8))]
    labels = rng.integers(0, 2, B)
    imgs = np.stack([protos[c] for c in labels]).astype(np.float32)
    imgs += 0.1 * rng.standard_normal(imgs.shape).astype(np.float32)
    s = classify_cl2d(imgs, 2, n_iters=4, max_shift=2, seed=0)
    m = classify_cl2d(imgs, 2, n_iters=4, max_shift=2, seed=0,
                      mesh=data_mesh(8))
    assert (s["assignments"] == m["assignments"]).mean() > 0.95
    scale = np.abs(s["refs"]).max()
    assert np.abs(s["refs"] - m["refs"]).max() < 1e-3 * scale


def test_align_significant_mesh_matches_serial(dataset):
    """align_significant --mesh dp: sharded scoring reproduces the serial
    score matrix and output assignments."""
    ref_md = dataset["root"] + ".doc"
    outs = {}
    for mode, tag in (("none", "ser"), ("dp", "dp")):
        out = str(dataset["tmp"] / f"signif_{tag}.xmd")
        run_prog("align_significant",
                 f"-i {dataset['fn_md']} -r {ref_md} -o {out} "
                 f"--angDistance 30 --mesh {mode}")
        outs[tag] = MetaData(out)
    for col in ("ref", "maxCC", "weight"):
        a = np.asarray(outs["ser"].getColumn(col), float)
        b = np.asarray(outs["dp"].getColumn(col), float)
        if col == "ref":
            assert (a == b).mean() > 0.95
        else:
            np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-5)


# ---------------------------------------------------------------------------
# round-3 engine wiring (VERDICT #5): reconstruct_art, reconstruct_
# significant, image_rotational_pca, sph/forward_zernike, ctf regions
# ---------------------------------------------------------------------------

def test_mpi_reconstruct_art_dp_matches_serial(dataset):
    """ART block updates sharded over the mesh (parallel_art_correction,
    basic_art.h:92-116 parallel modes) == serial."""
    outs = {}
    for mode, tag in (("none", "ser"), ("dp", "dp")):
        out = str(dataset["tmp"] / f"art_{tag}.vol")
        run_prog("mpi_reconstruct_art",
                 f"-i {dataset['fn_md']} -o {out} -n 2 "
                 f"--parallel_mode pSIRT --mesh {mode}")
        outs[tag] = np.squeeze(Image(out).data)
    scale = np.abs(outs["ser"]).max()
    assert np.abs(outs["dp"] - outs["ser"]).max() < 2e-3 * scale
    assert np.corrcoef(outs["dp"].ravel(),
                       dataset["vol"].ravel())[0, 1] > 0.8


def test_mpi_reconstruct_significant_dp_matches_serial(dataset):
    """reconstruct_significant with dp matching + psum reconstruction ==
    serial (mpi_reconstruct_significant image distribution)."""
    outs = {}
    for mode, tag in (("none", "ser"), ("dp", "dp")):
        odir = dataset["tmp"] / f"signifrec_{tag}"
        odir.mkdir(exist_ok=True)
        run_prog("mpi_reconstruct_significant",
                 f"-i {dataset['fn_md']} --odir {odir} --iter 2 "
                 f"--angularSampling 20 --mesh {mode}")
        outs[tag] = np.squeeze(
            Image(str(odir / "significant_volume.vol")).data)
    scale = np.abs(outs["ser"]).max()
    assert np.abs(outs["dp"] - outs["ser"]).max() < 2e-3 * scale


def test_mpi_rotational_pca_matches_serial(dataset):
    """image_rotational_pca --mesh: psum-covariance PCA == serial SVD
    components (up to the fixed sign convention)."""
    outs = {}
    for mode, tag in (("none", "ser"), ("dp", "dp")):
        root = str(dataset["tmp"] / f"rotpca_{tag}")
        run_prog("mpi_image_rotational_pca",
                 f"-i {dataset['fn_md']} --oroot {root} "
                 f"--eigenvectors 4 --mesh {mode}")
        outs[tag] = Image.read_stack(root + ".stk")
    for k in range(4):
        a, b = outs["ser"][k].ravel(), outs["dp"][k].ravel()
        # same principal directions (eigh vs SVD agree to fp precision
        # for well-separated eigenvalues)
        assert abs(abs(np.dot(a, b)) / (np.linalg.norm(a) *
                                        np.linalg.norm(b) + 1e-12)) > 0.999


def test_sph_alignment_mesh_matches_serial(dataset):
    """angular_sph_alignment --mesh dp: per-particle DP (sharded batch
    axis) == serial fit."""
    # tiny subset: 6 particles on the 8-device mesh (padding path)
    md = MetaData(dataset["fn_md"])
    rows = list(md.iterRows())[:6]
    fn_sub = str(dataset["tmp"] / "sph_sub.xmd")
    MetaData.fromRows(rows).write(fn_sub)
    outs = {}
    for mode, tag in (("none", "ser"), ("dp", "dp")):
        out = str(dataset["tmp"] / f"sph_{tag}.xmd")
        run_prog("mpi_angular_sph_alignment",
                 f"-i {fn_sub} --ref {dataset['fn_vol']} -o {out} "
                 f"--l1 1 --l2 1 --steps 4 --batch 6 --mesh {mode}")
        outs[tag] = MetaData(out)
    a = np.asarray(outs["ser"].getColumn("maxCC"), float)
    b = np.asarray(outs["dp"].getColumn("maxCC"), float)
    np.testing.assert_allclose(b, a, rtol=1e-3, atol=1e-4)
    ca = np.stack([np.asarray(v, float) for v in
                   outs["ser"].getColumnValues("sphCoefficients")])
    cb = np.stack([np.asarray(v, float) for v in
                   outs["dp"].getColumnValues("sphCoefficients")])
    # coefficients are ~1e-2 after 4 Adam steps; atol covers fp32
    # reduction-order noise between the sharded and serial compiles of
    # the lowpass+masked-corr loss
    np.testing.assert_allclose(cb, ca, rtol=1e-2, atol=1e-3)


def test_parallel_refine_defocus_matches_serial():
    """ctf regions mode mesh engine: sharded region axis == serial
    vmapped dispatch (regions are independent)."""
    from xmipp3_tpu.models.ctf_estimation import (CTFEstimator,
                                                  refine_defocus_batch)
    from xmipp3_tpu.ops.ctf import CTFDescription
    from xmipp3_tpu.parallel.engines import parallel_refine_defocus
    from xmipp3_tpu.parallel.mesh import data_mesh
    rng = np.random.default_rng(3)
    n, Ts = 128, 2.0
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / Ts
    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / Ts
    psds = []
    for dU in (14000.0, 15000.0, 16000.0, 17000.0, 18000.0):  # 5: pad to 8
        ctf = CTFDescription(sampling_rate=Ts, voltage=300, Cs=2.7,
                             Q0=0.07, defocusU=dU, defocusV=dU * 0.95,
                             azimuthal_angle=20.0)
        h = np.asarray(ctf.pure_at(fx, fy))
        psds.append((h * h + 0.05).astype(np.float32))
    psds = np.stack(psds)
    seed = CTFEstimator(psds[2], Ts, 300, 2.7, 0.07).params
    serial = refine_defocus_batch(psds, seed, Ts)
    mesh = parallel_refine_defocus(data_mesh(8), psds, seed, Ts)
    np.testing.assert_allclose(mesh, serial, rtol=1e-5, atol=1e-4)
