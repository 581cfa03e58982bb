"""Projectors Onto Convex Sets (POCS) for volume adjustment/subtraction.

TPU-native rebuild of the reference's POCS operator family and the
volume-adjustment loop (reconstruction/volume_subtraction.cpp:100-460:
POCSmask, POCSnonnegative, POCSFourierAmplitude(+RadAvg), POCSMinMax,
POCSFourierPhase, radialAverage, computeRadQuotient, runIteration/run).
Each operator is a pure jnp function; the full adjustment is ONE jitted
lax.fori_loop so the 5-iteration loop is a single device dispatch.

Operator invariances pinned by tests/test_golden_pocs.py (transliteration of
function_tests/test_pocs_main.cpp)."""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np


def pocs_mask(vol, mask):
    """V *= mask."""
    return jnp.asarray(vol) * jnp.asarray(mask)


def pocs_nonnegative(vol):
    return jnp.maximum(jnp.asarray(vol), 0.0)


def pocs_min_max(vol, vmin, vmax):
    return jnp.clip(jnp.asarray(vol), vmin, vmax)


def pocs_fourier_amplitude(mag1, F2, lam=1.0):
    """Replace |F2| by (1-l)·|F2| + l·mag1, keeping phase. Entries with
    |F2| <= 1e-10 are left untouched (reference divide-by-zero guard)."""
    mod = jnp.abs(F2)
    scale = ((1.0 - lam) + lam * mag1 / jnp.maximum(mod, 1e-30))
    return jnp.where(mod > 1e-10, F2 * scale, F2)


def pocs_fourier_phase(phase_unit, F):
    """Set F's phase to the given unit-modulus phase field."""
    return jnp.abs(F) * phase_unit


def extract_phase(F):
    """Unit-modulus phase of a complex field (cos+i·sin of atan2)."""
    mod = jnp.abs(F)
    return jnp.where(mod > 0, F / jnp.maximum(mod, 1e-300), 1.0 + 0.0j)


def _half_freq_radius(shape):
    """Digital |w| over the rfftn half-spectrum of a volume `shape`."""
    D, H, W = shape
    fz = np.fft.fftfreq(D)[:, None, None]
    fy = np.fft.fftfreq(H)[None, :, None]
    fx = np.fft.rfftfreq(W)[None, None, :]
    return np.sqrt(fz * fz + fy * fy + fx * fx)


def radial_average_octant(mag_half, shape):
    """The reference radialAverage (volume_subtraction.cpp:198-238): mean of
    half-spectrum magnitudes over rings iw = round(w·Nx), restricted to the
    positive-frequency octant k<D/2, i<H/2, j<W/2."""
    D, H, W = shape
    maxrad = int(np.floor(np.sqrt((W // 2) ** 2 + (H // 2) ** 2
                                  + (D // 2) ** 2)))
    kz = (np.arange(D // 2) / D)[:, None, None]
    ky = (np.arange(H // 2) / H)[None, :, None]
    kx = (np.arange(W // 2) / W)[None, None, :]
    w = np.sqrt(kz * kz + ky * ky + kx * kx)
    iw = np.round(w * W).astype(np.int32)
    oct_mag = mag_half[:D // 2, :H // 2, :W // 2]
    num = jnp.zeros(maxrad).at[iw.ravel()].add(oct_mag.ravel())
    den = jnp.zeros(maxrad).at[iw.ravel()].add(1.0)
    return num / den


def compute_rad_quotient(mag1_half, mag2_half, shape):
    """min(radialAverage(V1)/radialAverage(V2), 1), NaN -> 0."""
    r1 = radial_average_octant(mag1_half, shape)
    r2 = radial_average_octant(mag2_half, shape)
    q = r1 / r2
    q = jnp.where(jnp.isnan(q), 0.0, jnp.minimum(q, 1.0))
    return q


def pocs_fourier_amplitude_radavg(F_half, lam, rad_quotient, shape):
    """Multiply the half-spectrum by (1-l) + l·rQ[min(floor(w·Nx), len-1)]
    (volume_subtraction.cpp:127-152)."""
    w = _half_freq_radius(shape)
    iw = np.minimum(np.floor(w * shape[2]).astype(np.int32),
                    rad_quotient.shape[0] - 1)
    return F_half * ((1.0 - lam) + lam * rad_quotient[jnp.asarray(iw)])


def _lowpass3d(shape, cut):
    w = _half_freq_radius(shape)
    raised = 0.02
    m = np.where(w <= cut, 1.0,
                 np.where(w <= cut + raised,
                          0.5 * (1 + np.cos(np.pi * (w - cut) / raised)),
                          0.0))
    return jnp.asarray(m, jnp.float32)


@partial(jax.jit, static_argnames=("iters", "radavg", "cut_freq"))
def volume_adjust(V1, V2, mask=None, iters: int = 5, lam: float = 1.0,
                  radavg: bool = True, cut_freq: float = 0.0):
    """The reference adjustment loop (ProgVolumeSubtraction::run/runIteration):
    project V2 onto the constraint sets of V1 — Fourier amplitudes (direct or
    radial-average quotient), [v1min, v1max] range, support mask, V2's own
    phases, nonnegativity, V1's std — for `iters` iterations. Returns the
    adjusted V2."""
    V1 = jnp.asarray(V1, jnp.float32)
    V2 = jnp.asarray(V2, jnp.float32)
    shape = V1.shape
    m = jnp.ones(shape, jnp.float32) if mask is None else jnp.asarray(
        mask, jnp.float32)
    V1m = pocs_nonnegative(pocs_mask(V1, m))
    v1min, v1max = V1m.min(), V1m.max()
    std1 = V1m.std()
    V = pocs_nonnegative(pocs_mask(V2, m))

    F2 = jnp.fft.rfftn(V)
    phase2 = extract_phase(F2)
    mag1 = jnp.abs(jnp.fft.rfftn(V1m))
    rq = compute_rad_quotient(mag1, jnp.abs(F2), shape)
    lp = _lowpass3d(shape, cut_freq) if cut_freq else None

    def body(_, V):
        F = jnp.fft.rfftn(V)
        if radavg:
            F = pocs_fourier_amplitude_radavg(F, lam, rq, shape)
        else:
            F = pocs_fourier_amplitude(mag1, F, lam)
        V = jnp.fft.irfftn(F, shape)
        V = pocs_min_max(V, v1min, v1max)
        V = pocs_mask(V, m)
        F = jnp.fft.rfftn(V)
        F = pocs_fourier_phase(phase2, F)
        V = jnp.fft.irfftn(F, shape)
        V = pocs_nonnegative(V)
        V = V * (std1 / jnp.maximum(V.std(), 1e-30))
        if lp is not None:
            V = jnp.fft.irfftn(jnp.fft.rfftn(V) * lp, shape)
        return V

    return jax.lax.fori_loop(0, iters, body, V)


def subtract_adjusted(V1, Vadj, mask_sub, cut_freq: float = 0.0):
    """Final subtraction (volume_subtraction.cpp subtraction()): outside the
    mask keep V1; inside use V1f - min(Vadj, V1f) with V1f the (optionally
    low-passed) reference."""
    V1 = jnp.asarray(V1, jnp.float32)
    V1f = (jnp.fft.irfftn(jnp.fft.rfftn(V1) * _lowpass3d(V1.shape, cut_freq),
                          V1.shape) if cut_freq else V1)
    m = jnp.asarray(mask_sub, jnp.float32)
    return V1 * (1 - m) + (V1f - jnp.minimum(Vadj, V1f)) * m
