"""Golden parity with the reference function_tests/test_pocs_main.cpp: every
POCS projection applied with its own volume's constraints is the identity
(transliterated invariances on the same 16^3 single-voxel fixture), plus the
frc R-factor embedded value from test_resolution_frc.cpp."""
import numpy as np

import jax.numpy as jnp

from xmipp3_tpu.ops.pocs import (compute_rad_quotient, extract_phase,
                                 pocs_fourier_amplitude,
                                 pocs_fourier_amplitude_radavg,
                                 pocs_fourier_phase, pocs_mask,
                                 pocs_min_max, pocs_nonnegative)


def _img():
    v = np.zeros((16, 16, 16), np.float32)
    v[1, 1, 1] = 1.0
    return v


def test_pocs_mask_identity():
    v = _img()
    out = np.asarray(pocs_mask(v, np.ones_like(v)))
    assert np.array_equal(out, v)


def test_pocs_nonnegative_identity():
    v = _img()
    out = np.asarray(pocs_nonnegative(v))
    assert np.array_equal(out, v)


def test_pocs_amplitude_identity():
    v = _img()
    F = jnp.fft.rfftn(jnp.asarray(v))
    F2 = pocs_fourier_amplitude(jnp.abs(F), F, 1.0)
    out = np.asarray(jnp.fft.irfftn(F2, v.shape))
    assert np.abs(out - v).max() < 1e-6


def test_pocs_amplitude_radavg_identity():
    v = _img()
    mag = jnp.abs(jnp.fft.rfftn(jnp.asarray(v)))
    rq = compute_rad_quotient(mag, mag, v.shape)
    F = jnp.fft.rfftn(jnp.asarray(v))
    F2 = pocs_fourier_amplitude_radavg(F, 1.0, rq, v.shape)
    out = np.asarray(jnp.fft.irfftn(F2, v.shape))
    assert np.abs(out - v).max() < 1e-6


def test_pocs_minmax_identity():
    v = _img()
    out = np.asarray(pocs_min_max(v, v.min(), v.max()))
    assert np.array_equal(out, v)


def test_pocs_phase_identity():
    v = _img()
    F = jnp.fft.rfftn(jnp.asarray(v))
    F2 = pocs_fourier_phase(extract_phase(F), F)
    out = np.asarray(jnp.fft.irfftn(F2, v.shape))
    assert np.abs(out - v).max() < 1e-6


def test_frc_rfactor_embedded_value():
    """test_resolution_frc.cpp copy: R-factor of the embedded 3x3x3 pair
    with sampling 2, freq range (-2, 1) == 0.134661 +- 1e-5."""
    from xmipp3_tpu.ops.fsc import frc_rfactor
    v1 = np.zeros((3, 3, 3))
    v2 = np.zeros((3, 3, 3))
    v1[0] = [[1, 2, 3], [4, 5, 6], [7, 8, 9]]
    v1[1] = [[10, 11, 12], [13, 14, 15], [17, 18, 19]]
    v1[2] = [[20, 21, 22], [23, 24, 25], [26.4, 27.5, 28.5]]
    v2[2] = [[1.5, 2.4, 3.3], [4.6, 5.7, 6.4], [7.3, 8.2, 9.5]]
    v2[1] = [[10.2, 11.4, 12.5], [13.6, 14.5, 15.7], [17.3, 18.2, 19.4]]
    v2[0] = [[20.3, 21.4, 22.5], [23.4, 24.5, 25.6], [26.7, 24, 23]]
    r = float(frc_rfactor(v1, v2, min_freq=-2.0, max_freq=1.0))
    assert abs(r - 0.134661) < 1e-5
