"""xmippPyModules importable surface (reference libraries/py_xmipp):
value tests for every submodule — swiftalign (metadata/image/fourier/
transform/ctf/operators/alignment/classification/utils),
classifyPcaFuntion (PCAgpu/BnBgpu/assessment), coordinatesTools."""
import numpy as np
import pytest


def test_package_mirror_of_reference_layout():
    import xmippPyModules
    import xmippPyModules.example_module as ex
    assert ex.axis_angle_example()
    import xmippPyModules.swiftalign.alignment  # noqa: F401
    import xmippPyModules.swiftalign.classification  # noqa: F401
    import xmippPyModules.swiftalign.ctf  # noqa: F401
    import xmippPyModules.swiftalign.fourier  # noqa: F401
    import xmippPyModules.swiftalign.image  # noqa: F401
    import xmippPyModules.swiftalign.metadata  # noqa: F401
    import xmippPyModules.swiftalign.operators  # noqa: F401
    import xmippPyModules.swiftalign.transform  # noqa: F401
    import xmippPyModules.swiftalign.utils  # noqa: F401


def test_metadata_roundtrip(tmp_path):
    import pandas as pd

    from xmippPyModules.swiftalign import metadata as md
    df = pd.DataFrame({"image": ["000002@s.stk", "000001@s.stk"],
                       "anglePsi": [10.0, -20.0]})
    fn = str(tmp_path / "t.xmd")
    md.write(df, fn, table="particles")
    back = md.read(fn, table="particles")
    assert list(back["image"]) == list(df["image"])
    assert np.allclose(back["anglePsi"], df["anglePsi"])
    srt = md.sort_by_image_filename(back)
    assert len(srt) == 2
    assert md.ANGLE_PSI == "anglePsi"


def test_image_read_write_path(tmp_path):
    from xmippPyModules.swiftalign import image as im
    rng = np.random.default_rng(0)
    stk = rng.standard_normal((3, 16, 16)).astype(np.float32)
    fn = str(tmp_path / "s.mrcs")
    im.write(stk, fn)
    p = im.parse_path(f"000002@{fn}")
    assert p.position_in_stack == 2
    one = np.squeeze(im.read(str(p)))
    assert np.allclose(one, stk[1], atol=1e-5)
    data = im.read_data([f"{i + 1:06d}@{fn}" for i in range(3)])
    assert data.shape == (3, 16, 16)


def test_fourier_rfftnfreq_and_zero_pad():
    from xmippPyModules.swiftalign import fourier as fr
    g = fr.rfftnfreq((8, 8), d=2.0)
    assert g.shape == (2, 8, 5)
    assert g[1, 0, 1] == pytest.approx(1.0 / (8 * 2.0))
    assert g[0, 1, 0] == pytest.approx(1.0 / (8 * 2.0))
    x = np.ones((2, 4, 4), np.float32)
    p = fr.zero_pad(x, (8, 8))
    assert p.shape == (2, 8, 8)
    assert p.sum() == x.sum()
    assert p[0, 0, 0] == 0.0


def test_transform_affine_pair_matches_alignment_op():
    from xmipp3_tpu.ops.geo import apply_alignment_2d
    from xmippPyModules.swiftalign.transform import (affine_2d,
                                                     affine_matrix_2d)
    rng = np.random.default_rng(1)
    from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                               band_pass_mask)
    img = np.asarray(apply_fourier_mask_2d(
        rng.standard_normal((32, 32)).astype(np.float32),
        band_pass_mask(32, 32, 0.05, 0.25)))
    psi, sx, sy = 25.0, 2.0, -1.5
    M = affine_matrix_2d(angles=[psi], shifts=[[sx, sy]])
    got = affine_2d(img[None], M)[0]
    want = np.asarray(apply_alignment_2d(
        img[None], np.float32([psi]), np.float32([sx]),
        np.float32([sy])))[0]
    inner = (slice(6, -6), slice(6, -6))
    c = np.corrcoef(got[inner].ravel(), want[inner].ravel())[0, 1]
    assert c > 0.999


def test_transform_quaternion_euler_consistency():
    from xmippPyModules.swiftalign.transform import (euler_to_matrix,
                                                     euler_to_quaternion,
                                                     matrix_to_euler,
                                                     quaternion_conj,
                                                     quaternion_product,
                                                     quaternion_to_matrix)
    rot, tilt, psi = np.array([31.0]), np.array([47.0]), np.array([-12.0])
    A = euler_to_matrix(rot, tilt, psi)
    q = euler_to_quaternion(rot, tilt, psi)
    Aq = quaternion_to_matrix(q)
    # same rotation up to the matrix convention (A passive vs Aq active):
    # one equals the other or its transpose
    err = min(np.abs(Aq[0] - A[0]).max(), np.abs(Aq[0] - A[0].T).max())
    assert err < 1e-6
    # quaternion algebra: q * conj(q) = identity
    e = quaternion_product(q, quaternion_conj(q))[0]
    assert np.allclose(e, [1, 0, 0, 0], atol=1e-9)
    # matrix -> euler roundtrip
    r2, t2, p2 = matrix_to_euler(A)
    A2 = euler_to_matrix(r2, t2, p2)
    assert np.abs(A2 - A).max() < 1e-5


def test_ctf_wiener_formula():
    from xmippPyModules.swiftalign.ctf import (compute_ctf_image_2d,
                                               wiener_2d)
    H = compute_ctf_image_2d(15000, 14000, 30.0, 32, 1.5)
    assert H.shape == (32, 17)
    W = wiener_2d(H, inverse_ssnr=0.1)
    assert np.allclose(W, H / (H * H + 0.1), atol=1e-6)


def test_operators_mask_flattener():
    from xmippPyModules.swiftalign.operators import MaskFlattener
    mask = np.zeros((4, 4), bool)
    mask[1:3, 1:3] = True
    f = MaskFlattener(mask)
    x = np.arange(16, dtype=np.float32).reshape(4, 4)
    flat = f(x)
    assert flat.tolist() == [5, 6, 9, 10]
    back = f.unflatten(flat)
    assert back[1, 1] == 5 and back[0, 0] == 0


def test_alignment_corrector_registers(tmp_path):
    from xmipp3_tpu.ops.geo import apply_alignment_2d
    from xmippPyModules.swiftalign.alignment import InPlaneTransformCorrector
    rng = np.random.default_rng(2)
    from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                               band_pass_mask)
    base = np.asarray(apply_fourier_mask_2d(
        rng.standard_normal((32, 32)).astype(np.float32),
        band_pass_mask(32, 32, 0.05, 0.25)))
    # the aligned frame the stored metadata pose encodes
    want = np.asarray(apply_alignment_2d(
        base[None], np.float32([40.0]), np.float32([3.0]),
        np.float32([-2.0])))
    corr = InPlaneTransformCorrector()
    # metadata pose contract: apply_md_geometry(particle, md_pose) is the
    # aligned frame (CLAUDE.md pose contract; ops.geo.alignment_to_md_pose)
    from xmipp3_tpu.ops.geo import alignment_to_md_pose
    psi_md, sx_md, sy_md, flip_md = alignment_to_md_pose(
        np.float32([40.0]), np.float32([3.0]), np.float32([-2.0]))
    reg = corr(base[None], psi_md, sx_md, sy_md)
    inner = (slice(8, -8), slice(8, -8))
    c = np.corrcoef(reg[0][inner].ravel(), want[0][inner].ravel())[0, 1]
    assert c > 0.999


def test_classification_separates_two_classes():
    from xmippPyModules.swiftalign.classification import \
        aligned_2d_classification
    rng = np.random.default_rng(3)
    a = rng.standard_normal((16, 16)).astype(np.float32)
    b = rng.standard_normal((16, 16)).astype(np.float32)
    imgs = np.concatenate([
        a[None] + 0.1 * rng.standard_normal((10, 16, 16)),
        b[None] + 0.1 * rng.standard_normal((10, 16, 16))]
    ).astype(np.float32)
    labels, avgs, Y = aligned_2d_classification(imgs, n_classes=2)
    assert avgs.shape == (2, 16, 16)
    assert len(set(labels[:10])) == 1
    assert len(set(labels[10:])) == 1
    assert labels[0] != labels[10]


def test_utils_lru_and_progress():
    from xmippPyModules.swiftalign.utils import LruCache, progress_bar
    c = LruCache(2)
    c.put("a", 1)
    c.put("b", 2)
    c.get("a")
    c.put("c", 3)             # evicts b (least recently used)
    assert "b" not in c and "a" in c and "c" in c
    assert list(progress_bar(range(3))) == [0, 1, 2]


def test_pca_gpu_streaming_matches_batch():
    from xmippPyModules.classifyPcaFuntion.pca_gpu import PCAgpu
    rng = np.random.default_rng(4)
    # anisotropic gaussian: the leading eigenvector is axis 0
    X = rng.standard_normal((200, 6)) * np.array([5, 1, 1, 1, 1, 1])
    p = PCAgpu(1)
    mean, var, vals, vecs = p.first_eigenvector(X[:100], 100)
    assert abs(abs(vecs[:, 0][0]) - 1.0) < 0.1      # dominant axis 0
    # streaming updates keep the leading eigenvector aligned
    m, v = [mean], [var]
    V = [vecs[:, :2].copy()]
    lam = [vals[:2].copy()]
    for i, x in enumerate(X[100:]):
        phi = p.phiProjTrain([x], m, V)
        lam = p.eigenvalue_update(lam, phi, 0.01)
        V = p.eigenvector_update([x], V, phi, m, 0.01, [2])
        m = p.mean_update([x], m, 100 + i)
        v = p.var_update([x], m, v, 100 + i)
    assert abs(V[0][0, 0]) > 0.95
    assert lam[0].ravel()[0] > lam[0].ravel()[1]


def test_bnb_gpu_matches_rotated_reference():
    from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                               band_pass_mask)
    from xmipp3_tpu.ops.geo import apply_alignment_2d
    from xmippPyModules.classifyPcaFuntion.bnb_gpu import BnBgpu
    rng = np.random.default_rng(5)
    refs = np.stack([np.asarray(apply_fourier_mask_2d(
        rng.standard_normal((32, 32)).astype(np.float32),
        band_pass_mask(32, 32, 0.05, 0.2))) for _ in range(3)])
    bnb = BnBgpu(4)
    trials = bnb.setRotAndShift((0, 360, 30), (0, 1))
    # experimental images: ref 2 rotated 60 deg, ref 0 unrotated
    exp = np.concatenate([
        np.asarray(apply_alignment_2d(refs[2:3], np.float32([60.0]),
                                      np.float32([0]), np.float32([0]))),
        refs[0:1]])
    batch_exp = bnb.create_batchExp(exp)
    batch_ref = bnb.precalculate_projection(refs)
    labels, best_t, dist = bnb.match_batch(batch_exp, batch_ref)
    assert labels.tolist() == [2, 0]
    # recovered trial angle ~ -60 or 300 (registering back)
    ang = trials[best_t[0], 0] % 360
    assert min(abs(ang - 300), abs(ang - 60)) < 31
    seeds = bnb.init_ramdon_classes(2, exp)
    assert seeds.shape == (2, 32, 32)


def test_assessment_populations():
    from xmippPyModules.classifyPcaFuntion.assessment import (
        class_populations, intra_class_correlation)
    labels = np.array([0, 0, 1, 1, 1])
    assert class_populations(labels).tolist() == [2, 3]
    rng = np.random.default_rng(6)
    imgs = rng.standard_normal((5, 8, 8)).astype(np.float32)
    cc = intra_class_correlation(imgs, labels)
    assert cc.shape == (5,)
    assert np.all(np.isfinite(cc))


def test_coordinates_tools_roundtrip(tmp_path):
    from xmippPyModules.coordinatesTools import (readPosCoordsFromFName,
                                                 writeCoordsListToPosFname)
    coords = [(10, 20), (30, 40), (50, 60)]
    fn = writeCoordsListToPosFname("mic001.mrc", coords, str(tmp_path),
                                   micId=7)
    back, mic_id = readPosCoordsFromFName(fn, returnAlsoMicId=True)
    assert back == coords
    assert mic_id == 7


def test_dltk_utils_device_info():
    from xmippPyModules.deepLearningToolkitUtils.utils import (
        checkIf_tf_keras_installed, getDeviceInfo)
    assert checkIf_tf_keras_installed()
    info = getDeviceInfo()
    assert info["device_count"] >= 1
