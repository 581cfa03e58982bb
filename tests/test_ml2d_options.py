"""ML2D reference option surface (ml2d.cpp:226-302 defineBasicParams /
defineAdditionalParams): --mirror, --student, --psi_step/--search_rot,
-C, --iem, --norm, --fix_*, --ref/--frac init, MLF --kstest and CTF
pre-correction."""
import numpy as np
import jax.numpy as jnp
import pytest

from xmipp3_tpu.models.ml2d import ml2d, _psi_log_mask
from xmipp3_tpu.ops.geo import centered_flip, rotate_2d


def _mirror_dataset(n=24, H=32, noise=0.05, seed=0):
    rng = np.random.default_rng(seed)
    yy, xx = np.mgrid[:H, :H] - H / 2
    tmpl = (np.exp(-(((xx - 5) ** 2 + yy ** 2) / 10))
            + 0.7 * np.exp(-((xx ** 2 + (yy - 7) ** 2) / 6)))
    imgs, is_flip = [], []
    for i in range(n):
        im = np.array(tmpl)
        if i % 2:
            im = np.array(centered_flip(jnp.asarray(im[None]), -1))[0]
        im = np.array(rotate_2d(jnp.asarray(im[None], jnp.float32),
                                rng.uniform(-20, 20)))[0]
        imgs.append(im + rng.normal(0, noise, im.shape))
        is_flip.append(i % 2)
    return (np.asarray(imgs, np.float32), np.asarray(is_flip),
            tmpl.astype(np.float32))


def test_mirror_splits_and_registers():
    imgs, is_flip, tmpl = _mirror_dataset()
    res = ml2d(imgs, 1, n_iters=6, max_shift=2, mirror=True, seed=0)
    fl = res["flip"]
    agree = max((fl == is_flip).mean(), (fl != is_flip).mean())
    assert agree > 0.9
    ref = res["refs"][0]
    mir = np.array(centered_flip(jnp.asarray(tmpl[None]), -1))[0]
    c = max(np.corrcoef(ref.ravel(), tmpl.ravel())[0, 1],
            np.corrcoef(ref.ravel(), mir.ravel())[0, 1])
    # mirrored picks register through the flip pose into the base class;
    # a sign error would blur the average and kill this correlation
    assert c > 0.9


def test_student_t_monotone_and_robust():
    imgs, _, _ = _mirror_dataset(n=16)
    res = ml2d(imgs, 2, n_iters=4, max_shift=2, student_df=6)
    ll = res["loglike"]
    assert all(b >= a - 1e-3 * abs(a) for a, b in zip(ll, ll[1:]))


def test_psi_mask_static():
    m = _psi_log_mask(128, psi_step=45.0, search_rot=None)
    kept = np.isfinite(np.asarray(m)).sum()
    assert kept == 128 // 16  # stride = 45 / (360/128) = 16
    m2 = _psi_log_mask(128, psi_step=None, search_rot=30.0)
    psi = np.arange(128) * (360.0 / 128)
    psi = np.where(psi > 180, psi - 360, psi)
    assert np.array_equal(np.isfinite(np.asarray(m2)),
                          np.abs(psi) <= 30.0 + 1e-6)
    assert _psi_log_mask(128, None, None) is None


def test_iem_blocks_monotone():
    imgs, _, _ = _mirror_dataset(n=18)
    res = ml2d(imgs, 2, n_iters=3, max_shift=2, iem_blocks=3)
    ll = res["loglike"]
    assert len(ll) == 3 and ll[-1] > ll[0]


def test_fix_flags_hold_values():
    imgs, _, _ = _mirror_dataset(n=12)
    res = ml2d(imgs, 2, n_iters=2, max_shift=2, sigma_init=1.5,
               offset_sigma=2.5, fix_sigma_noise=True,
               fix_sigma_offset=True, fix_fractions=True)
    assert res["sigma"] == pytest.approx(1.5)
    assert res["sigma_offset"] == pytest.approx(2.5)
    assert np.allclose(res["fractions"], 0.5)


def test_refs_and_fractions_init():
    imgs, _, tmpl = _mirror_dataset(n=10)
    res = ml2d(imgs, 4, n_iters=1, max_shift=2,
               refs_init=tmpl[None], fractions_init=np.array([1.0]))
    assert len(res["refs"]) == 1          # --ref overrides --nref
    with pytest.raises(ValueError):
        ml2d(imgs, 2, n_iters=1, refs_init=np.stack([tmpl, tmpl]),
             fractions_init=np.array([1.0, 1.0, 1.0]))


def test_norm_recovers_gray_scale():
    imgs, _, tmpl = _mirror_dataset(n=12, noise=0.02)
    scale = np.linspace(0.5, 2.0, 12).astype(np.float32)
    scaled = imgs * scale[:, None, None] + 0.3
    res = ml2d(scaled, 1, n_iters=4, max_shift=2, norm=True)
    a = res["gray_a"]
    # fitted gains must track the injected scales (up to a global factor)
    ratio = a / scale
    assert ratio.std() / ratio.mean() < 0.2


def test_significance_truncation_runs():
    imgs, _, _ = _mirror_dataset(n=10)
    res = ml2d(imgs, 2, n_iters=2, max_shift=2, c_significance=1e-6)
    assert len(res["loglike"]) == 2


def test_kstest_diagnostic():
    imgs, _, _ = _mirror_dataset(n=10)
    res = ml2d(imgs, 1, n_iters=2, max_shift=2, kstest=True)
    assert len(res["kstest"]) == 2
    assert all(0 <= v <= 1 for v in res["kstest"])
