"""Parity of the gather-free three-shear Fourier rotation against the
spatial-domain warp (the TPU hot-path replacement, ops/shear_rotate.py)."""
import jax.numpy as jnp
import numpy as np
import pytest

from xmipp3_tpu.ops.geo import alignment_matrices_2d, apply_affine_2d
from xmipp3_tpu.ops.shear_rotate import rotate_shift_fourier


def _bandlimited_apodized_n(N, seed=0):
    rng = np.random.default_rng(seed)
    img = rng.normal(size=(N, N)).astype(np.float32)
    F = np.fft.fft2(img)
    fy = np.fft.fftfreq(N)[:, None]
    fx = np.fft.fftfreq(N)[None, :]
    F *= np.exp(-((fx ** 2 + fy ** 2) / (2 * 0.15 ** 2)))
    img = np.real(np.fft.ifft2(F)).astype(np.float32)
    yy, xx = np.mgrid[0:N, 0:N]
    r = np.sqrt((yy - N // 2) ** 2 + (xx - N // 2) ** 2)
    apod = 0.5 * (1 + np.cos(np.clip((r - 18) / 8, 0, 1) * np.pi))
    return (img * apod).astype(np.float32), r


def _bandlimited_apodized(seed=0):
    return _bandlimited_apodized_n(64, seed)


@pytest.mark.parametrize("N", [63, 65])
@pytest.mark.parametrize("psi", [10.0, 45.0, 90.0, 135.0, -90.0, 180.0])
def test_odd_sizes(N, psi):
    # inversion about n//2 differs between odd and even n (regression: the
    # even-size +1 roll must not apply to odd images)
    img, r = _bandlimited_apodized_n(N)
    mask = r < 16
    b = jnp.asarray(img[None])
    M = alignment_matrices_2d(jnp.array([psi]), jnp.zeros(1), jnp.zeros(1))
    ref = np.asarray(apply_affine_2d(b, M, wrap=True))[0]
    got = np.asarray(rotate_shift_fourier(b, jnp.array([psi]), jnp.zeros(1),
                                          jnp.zeros(1)))[0]
    corr = np.corrcoef(ref[mask], got[mask])[0, 1]
    assert corr > 0.99, f"N={N} psi={psi}: corr {corr:.4f}"


@pytest.mark.parametrize("psi,sx,sy", [
    (0.0, 0.0, 0.0), (10.0, 0.0, 0.0), (20.0, 3.0, -2.0), (45.0, 0.0, 0.0),
    (90.0, 0.0, 0.0), (130.0, 1.0, 1.0), (-20.0, 0.0, 0.0),
    (-90.0, 2.0, -1.0), (-130.0, -2.0, 1.5), (180.0, 0.0, 0.0),
])
def test_parity_with_spatial_warp(psi, sx, sy):
    img, r = _bandlimited_apodized()
    mask = r < 16
    b = jnp.asarray(img[None])
    M = alignment_matrices_2d(jnp.array([psi]), jnp.array([sx]),
                              jnp.array([sy]))
    ref = np.asarray(apply_affine_2d(b, M, wrap=True))[0]
    got = np.asarray(rotate_shift_fourier(b, jnp.array([psi]),
                                          jnp.array([sx]), jnp.array([sy])))[0]
    corr = np.corrcoef(ref[mask], got[mask])[0, 1]
    # residual difference is bilinear-vs-sinc interpolation; exact at k*90
    assert corr > 0.99, f"psi={psi}: corr {corr:.4f}"
    if abs(psi) % 90 == 0:
        np.testing.assert_allclose(ref, got, atol=1e-4)


def test_per_image_angles_and_shifts():
    # batched heterogeneous poses: each image gets its own (psi, sx, sy)
    img, r = _bandlimited_apodized()
    mask = r < 16
    psis = jnp.array([17.0, -95.0, 160.0, 0.0])
    sxs = jnp.array([1.0, -2.0, 0.5, 3.0])
    sys_ = jnp.array([-1.5, 0.0, 2.0, -0.5])
    batch = jnp.asarray(np.stack([img] * 4))
    got = np.asarray(rotate_shift_fourier(batch, psis, sxs, sys_))
    for i in range(4):
        M = alignment_matrices_2d(psis[i:i + 1], sxs[i:i + 1], sys_[i:i + 1])
        ref = np.asarray(apply_affine_2d(batch[i:i + 1], M, wrap=True))[0]
        corr = np.corrcoef(ref[mask], got[i][mask])[0, 1]
        assert corr > 0.99, f"image {i}: corr {corr:.4f}"


def test_invertible():
    img, r = _bandlimited_apodized()
    b = jnp.asarray(img[None])
    fwd = rotate_shift_fourier(b, jnp.array([33.0]), jnp.array([2.0]),
                               jnp.array([-1.0]))
    # undo: rotate by -psi after removing the shift (inverse composition)
    rad = np.deg2rad(33.0)
    c, s = np.cos(rad), np.sin(rad)
    # inverse of content map v' = R_c v + s is v = R_c^{-1}(v' - s); in the
    # (psi, sx, sy) parametrization that is psi=-33 with shift -R_c^{-1} s
    isx = -(c * 2.0 - s * (-1.0))
    isy = -(s * 2.0 + c * (-1.0))
    back = rotate_shift_fourier(fwd, jnp.array([-33.0]), jnp.array([isx]),
                                jnp.array([isy]))
    mask = r < 14
    err = np.abs(np.asarray(back)[0][mask] - img[mask]).max()
    assert err < 5e-3 * np.abs(img[mask]).max() + 1e-4
