"""Volume restoration from two half-maps — TPU-native engine.

Contract: reference ``volume_halves_restoration.cpp`` (run: 121-169;
estimateS: 171-215; significanceRealSpace: 217-249; deconvolveS/convolveS/
optimizeSigma: 251-336; filterBank: 338-452; evaluateDifference: 454-491)
and the CUDA intent clarification in
``reconstruction_cuda/cuda_volume_halves_restorator.cpp:121-170`` (the
FFTW-alias-free flow: ``_deconvolved`` is S from the last ``estimateS``;
``_convolved`` is the deconvolved spectrum re-convolved with the
mean-sigma Gaussian).

Design shifts (TPU-first):
- The reference ``CDF`` class tabulates 200 sample quantiles and
  linearly interpolates (``cuda_cdf.cu: getCDFProbability``).  We use the
  exact empirical CDF — one ``jnp.sort`` + ``searchsorted`` per query
  batch — which the quantile table approximates.
- Every iteration body is a single jitted device function; the sigma
  optimization stays a 2-parameter host Powell over a jitted scalar cost
  (same split as the reference: powellOptimizer over restorationSigmaCost).
- The filter bank runs as one ``lax.scan`` over band edges instead of a
  Python loop of FFTW calls.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def make_r2(shape):
    """Squared digital frequency |f|^2 on the rfftn grid (reference
    produceSideInfo, FFT_IDX2DIGFREQ)."""
    d, h, w = shape
    fz = np.fft.fftfreq(d)
    fy = np.fft.fftfreq(h)
    fx = np.fft.rfftfreq(w)
    return (fz[:, None, None] ** 2 + fy[None, :, None] ** 2 +
            fx[None, None, :] ** 2).astype(np.float32)


def ecdf_prob(sorted_vals, n_valid, q):
    """P(X <= q) under the empirical CDF of ``sorted_vals`` (invalid
    entries pushed to +inf; only the first ``n_valid`` count)."""
    idx = jnp.searchsorted(sorted_vals, q.ravel(), side="right")
    return (jnp.minimum(idx, n_valid) / n_valid).reshape(q.shape)


@partial(jax.jit, static_argnames=("shape",))
def estimate_s(v1r, v2r, mask, r2, shape):
    """S = lowpass(max(mask*(V1r+V2r)/2, 0)) + the sorted masked S^2
    table for the signal CDF (reference estimateS)."""
    s = 0.5 * (v1r + v2r)
    s = s * mask
    s = jnp.maximum(s, 0.0)
    f = jnp.fft.rfftn(s)
    f = jnp.where(r2 > 0.25, 0.0, f)
    s = jnp.fft.irfftn(f, s=shape)
    aux = (s * s).ravel()
    n_valid = jnp.sum(mask > 0).astype(jnp.int32)
    aux = jnp.where(mask.ravel() > 0, aux, jnp.inf)
    return s, jnp.sort(aux), n_valid


@jax.jit
def significance_real_space(vi, s, cdf_s, n_valid):
    """Vir = pS*pN*Vi where the voxel energy is not already the largest
    noise energy (reference significanceRealSpace)."""
    n = (vi - s) ** 2
    cdf_n = jnp.sort(n.ravel())
    e = vi * vi
    p_n = ecdf_prob(cdf_n, n.size, e)
    p_s = ecdf_prob(cdf_s, n_valid, e)
    return jnp.where(p_n < 1.0, p_s * p_n * vi, vi)


@jax.jit
def sigma_cost(f_s, f_v1, f_v2, r2, sig):
    """sum over R2<=0.25 of |fS*H1-fV1| + |fS*H2-fV2| (reference
    restorationSigmaCost); out-of-range sigmas are barriered on host."""
    k1 = -0.5 / (sig[0] * sig[0])
    k2 = -0.5 / (sig[1] * sig[1])
    h1 = jnp.exp(k1 * r2)
    h2 = jnp.exp(k2 * r2)
    inband = r2 <= 0.25
    err = (jnp.abs(f_s * h1 - f_v1) + jnp.abs(f_s * h2 - f_v2))
    return jnp.sum(jnp.where(inband, err, 0.0))


@partial(jax.jit, static_argnames=("shape",))
def forward_ffts(s, v1r, v2r, shape):
    return jnp.fft.rfftn(s), jnp.fft.rfftn(v1r), jnp.fft.rfftn(v2r)


@partial(jax.jit, static_argnames=("shape",))
def deconvolve_s(f_s, f_v1, f_v2, r2, lam, sig1, sig2, shape):
    """One deconvolution step (reference deconvolveS): the two-sigma
    Wiener combination for S and per-half Gaussian division for V1r/V2r,
    inside the R2<=0.25 band only."""
    k1 = -0.5 / (sig1 * sig1)
    k2 = -0.5 / (sig2 * sig2)
    h1 = jnp.exp(k1 * r2)
    h2 = jnp.exp(k2 * r2)
    inband = r2 <= 0.25
    f_vol = jnp.where(inband,
                      (h1 * f_v1 + h2 * f_v2) / (h1 * h1 + h2 * h2 + lam * r2),
                      f_s)
    f_v1 = jnp.where(inband, f_v1 / h1, f_v1)
    f_v2 = jnp.where(inband, f_v2 / h2, f_v2)
    v1r = jnp.fft.irfftn(f_v1, s=shape)
    v2r = jnp.fft.irfftn(f_v2, s=shape)
    return f_vol, v1r, v2r


@partial(jax.jit, static_argnames=("shape",))
def convolve_s(f_vol, r2, sigma, shape):
    """Re-convolve the deconvolved spectrum with the mean-sigma Gaussian
    (reference convolveS)."""
    k = -0.5 / (sigma * sigma)
    f = jnp.where(r2 <= 0.25, f_vol * jnp.exp(k * r2), f_vol)
    return jnp.fft.irfftn(f, s=shape)


@partial(jax.jit, static_argnames=("shape", "weight_fun", "bank_step",
                                   "bank_overlap", "weight_power"))
def filter_bank(v1r, v2r, r2, shape, bank_step, bank_overlap,
                weight_fun, weight_power):
    """Frequency filter bank restoration (reference filterBank): for each
    band, weight both half-map band images by the probability of their
    voxel energies exceeding the half-difference noise energy; one
    lax.scan over the band edges."""
    f_v1 = jnp.fft.rfftn(v1r)
    f_v2 = jnp.fft.rfftn(v2r)
    filter_step = bank_step * (1.0 - bank_overlap)
    n_bands = int(np.ceil(0.5 / filter_step - 1e-9))
    ws = jnp.arange(n_bands, dtype=jnp.float32) * filter_step

    def body(carry, w):
        m_v1r, m_v2r, m_s = carry
        band = (r2 >= w * w) & (r2 < (w + bank_step) ** 2)
        vf1 = jnp.fft.irfftn(jnp.where(band, f_v1, 0.0), s=shape)
        vf2 = jnp.fft.irfftn(jnp.where(band, f_v2, 0.0), s=shape)
        noise = 0.5 * (vf1 - vf2) ** 2
        cdf_n = jnp.sort(noise.ravel())
        e1 = vf1 * vf1
        e2 = vf2 * vf2
        w1 = ecdf_prob(cdf_n, noise.size, e1)
        w2 = ecdf_prob(cdf_n, noise.size, e2)
        if weight_fun == 0:
            weight = 0.5 * (w1 + w2)
        elif weight_fun == 1:
            weight = jnp.minimum(w1, w2)
        else:
            weight = 0.5 * (w1 + w2) * (
                1.0 - jnp.abs(w1 - w2) / jnp.maximum(w1 + w2, 1e-38))
        weight = weight ** weight_power
        vf1w = vf1 * weight
        vf2w = vf2 * weight
        m_v1r = m_v1r + vf1w
        m_v2r = m_v2r + vf2w
        m_s = m_s + jnp.where(e1 > e2, vf1w, vf2w)
        return (m_v1r, m_v2r, m_s), None

    zero = jnp.zeros(shape, v1r.dtype)
    (m_v1r, m_v2r, m_s), _ = jax.lax.scan(body, (zero, zero, zero), ws)
    scale = 1.0 - bank_overlap
    return m_v1r * scale, m_v2r * scale, m_s * scale


@jax.jit
def evaluate_difference(v1r, v2r, mask, kdiff):
    """Shrink each half toward the mean with a Gaussian weight on the
    half-difference (reference evaluateDifference)."""
    n = v1r - v2r
    s = 0.5 * (v1r + v2r)
    cnt = jnp.maximum(jnp.sum(mask), 1.0)
    mean = jnp.sum(n * mask) / cnt
    var = jnp.sum((n - mean) ** 2 * mask) / cnt
    std = jnp.sqrt(var) * kdiff
    k = -0.5 / jnp.maximum(std * std, 1e-38)
    w = jnp.exp(k * n * n)
    return s + (v1r - s) * w, s + (v2r - s) * w


def optimize_sigma(f_s, f_v1, f_v2, r2, sig1, sig2):
    """2-parameter host Powell over the jitted sigma cost (reference
    optimizeSigma / powellOptimizer)."""
    from scipy.optimize import minimize

    def cost(x):
        if x[0] < 0 or x[1] < 0 or x[0] > 2 or x[1] > 2:
            return 1e38
        return float(sigma_cost(f_s, f_v1, f_v2, r2,
                                jnp.asarray(x, jnp.float32)))

    res = minimize(cost, np.array([sig1, sig2]), method="Powell",
                   options={"xtol": 0.01, "ftol": 0.01})
    return float(res.x[0]), float(res.x[1])
