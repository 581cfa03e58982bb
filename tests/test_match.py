"""Gallery matching + end-to-end angular assignment tests."""
import numpy as np
import pytest

from xmipp3_tpu.core.sampling import Sampling
from xmipp3_tpu.ops.geo import apply_alignment_2d
from xmipp3_tpu.ops.match import match_to_gallery
from xmipp3_tpu.ops.project import FourierProjector


def make_phantom(n=48):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for cz, cy, cx, s, a in [(0, 0, 0, 3.0, 1.0), (6, -4, 5, 2.0, 0.8),
                             (-5, 5, -3, 2.5, 0.6), (3, 6, -6, 1.8, 0.9),
                             (-8, -7, 2, 1.5, 1.1), (9, 3, -2, 1.6, 0.7),
                             (-2, -9, -8, 2.2, 0.95), (7, 8, 7, 1.4, 1.2)]:
        vol += a * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                          / (2 * s ** 2))
    return vol


@pytest.fixture(scope="module")
def gallery():
    vol = make_phantom()
    s = Sampling(15.0, "c1")
    proj = FourierProjector(vol)
    refs = np.asarray(proj.project_euler(
        s.angles[:, 0].astype(np.float32), s.angles[:, 1].astype(np.float32),
        np.zeros(len(s.angles), np.float32)))
    return vol, s.angles, refs, proj


def test_match_identity(gallery):
    vol, angles, refs, proj = gallery
    # a few exact gallery members must match themselves (mirror check off:
    # with a full-sphere gallery the antipodal view mirrored is an exact tie)
    idx = [0, 5, 17, len(refs) - 2]
    res = match_to_gallery(refs, refs[idx], max_shift=4, check_mirror=False)
    assert list(np.asarray(res["ref_idx"])) == idx
    assert np.allclose(np.asarray(res["psi"]), 0, atol=2.0)
    assert (np.asarray(res["corr"]) > 0.98).all()


def test_match_with_pose(gallery):
    vol, angles, refs, proj = gallery
    rng = np.random.default_rng(0)
    idx = rng.integers(0, len(refs), 6)
    psis = rng.uniform(-180, 180, 6).astype(np.float32)
    sxs = rng.uniform(-4, 4, 6).astype(np.float32)
    sys_ = rng.uniform(-4, 4, 6).astype(np.float32)
    imgs = np.stack([
        np.asarray(apply_alignment_2d(refs[idx[i]][None],
                                      np.float32([psis[i]]),
                                      np.float32([sxs[i]]),
                                      np.float32([sys_[i]])))[0]
        for i in range(6)])
    res = match_to_gallery(refs, imgs, max_shift=6)
    corr = np.asarray(res["corr"])
    assert (corr > 0.93).all(), corr
    # recovered reference must be the true direction — or, for mirrored
    # matches, its antipode (proj(-d) == mirror(proj(d)))
    from xmipp3_tpu.core.sampling import directions_from_angles
    d = directions_from_angles(angles)
    got = np.asarray(res["ref_idx"])
    flip = np.asarray(res["flip"])
    for i in range(6):
        target = -d[got[i]] if flip[i] else d[got[i]]
        ang_err = np.degrees(np.arccos(np.clip(
            np.dot(d[idx[i]], target), -1, 1)))
        assert ang_err < 16.0, f"img {i}: {ang_err}"


def test_match_metadata_convention(gallery):
    """(psi, sx, sy, flip) written by matching must register the raw image
    onto the matched reference through apply_md_geometry — the framework-wide
    metadata pose contract every consumer relies on."""
    from xmipp3_tpu.ops.geo import apply_md_geometry
    vol, angles, refs, proj = gallery
    imgs = np.stack([refs[3], refs[10][::-1, :]])  # one straight, one y-flip
    res = match_to_gallery(refs, imgs, max_shift=4)
    psi, sx, sy = (np.asarray(res[k]) for k in ("psi", "sx", "sy"))
    flip = np.asarray(res["flip"])
    got_refs = np.asarray(res["ref_idx"])
    registered = np.asarray(apply_md_geometry(
        imgs, psi.astype(np.float32), sx.astype(np.float32),
        sy.astype(np.float32), flip))
    for i in range(2):
        ref_img = refs[got_refs[i]]
        c = np.corrcoef(registered[i].ravel(), ref_img.ravel())[0, 1]
        assert c > 0.97, f"img {i}: {c}"


def test_match_detects_mirror(gallery):
    """On a HALF-sphere gallery mirror detection is meaningful (full-sphere
    galleries make mirrors exact antipodal ties)."""
    vol, angles, refs, proj = gallery
    half = angles[:, 1] <= 90.0
    h_refs = refs[half]
    h_angles = angles[half]
    # pick a ref well inside the half sphere
    k = int(np.argmax(np.where(h_angles[:, 1] < 60, h_angles[:, 1], -1)))
    imgs = np.stack([h_refs[k], h_refs[k][::-1, :]])
    res = match_to_gallery(h_refs, imgs, max_shift=4)
    flip = np.asarray(res["flip"])
    corr = np.asarray(res["corr"])
    assert (corr > 0.95).all()
    assert not flip[0]
    # the mirrored image either flags flip on a same-side ref or matches a
    # boundary view; require the flip flag when the matched ref is the original
    if int(np.asarray(res["ref_idx"])[1]) == k:
        assert flip[1]
