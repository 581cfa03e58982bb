"""CTF estimation: fit the CTF forward model to an observed PSD.

Rebuilds the reference's staged estimation (ctf_estimate_from_psd.cpp:
estimate_background_sqrt_parameters/gaussian :1072-, estimate_defoci grid
search, Powell refinement over the 13+-parameter model via CTF_fitness
:601-984) as: host-side scipy optimizers (Powell / least squares — the
reference's own powellOptimizer role) driving a JIT-compiled fitness that
evaluates the full 2-D model PSD and its correlation with the observed PSD in
a frequency band. Fixed parameter-vector shape -> single compilation.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from xmipp3_tpu.ops.ctf import CTFDescription


# ---------------------------------------------------------------------------
# jitted fitness
# ---------------------------------------------------------------------------

def _freq_grids(n: int, Ts: float):
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / Ts
    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / Ts
    return fy, fx


@partial(jax.jit, static_argnames=("n",))
def _model_psd(params, fy, fx, n: int, voltage, Cs, Q0, Ts):
    """Model PSD: noise background + K·CTF²·envelope.

    params = [defU, defV, angle_deg, log_K, base_line, sqrt_K, sq,
              gauss_K, gauss_sigma, gauss_c, envR1]"""
    defU, defV, ang, logK, base, sqrtK, sq, gK, gSigma, gC, envR1 = params
    u2 = fx * fx + fy * fy
    u = jnp.sqrt(u2)
    u4 = u2 * u2
    # pure CTF (reference formulas; see ops.ctf)
    lam = 12.2643247 / jnp.sqrt(voltage * 1e3 * (1 + 0.978466e-6 * voltage * 1e3))
    K1 = jnp.pi * lam
    K2 = jnp.pi / 2 * Cs * 1e7 * lam ** 3
    safe = jnp.maximum(u2, 1e-30)
    c2t = (fx * fx - fy * fy) / safe
    s2t = 2 * fx * fy / safe
    rad_az = jnp.deg2rad(ang)
    cos2 = c2t * jnp.cos(2 * rad_az) + s2t * jnp.sin(2 * rad_az)
    deltaf = -(defU + defV) / 2 + (-(defU - defV) / 2) * cos2
    arg = K1 * deltaf * u2 + K2 * u4
    Ksin = jnp.sqrt(jnp.maximum(1 - Q0 ** 2, 0.0))
    ctf = -(Ksin * jnp.sin(arg) - Q0 * jnp.cos(arg))
    env = jnp.exp(envR1 * u)          # simple exponential damping envelope
    signal = jnp.exp(logK) * (ctf * env) ** 2
    noise = base + sqrtK * jnp.exp(-sq * jnp.sqrt(u)) + \
        gK * jnp.exp(-gSigma * (u - gC) ** 2)
    return noise + signal


@partial(jax.jit, static_argnames=("n",))
def _fitness(params, psd, fy, fx, band, n: int, voltage, Cs, Q0, Ts):
    """Negative masked correlation between model and observed PSD
    (enhanced-contrast domain: log)."""
    model = _model_psd(params, fy, fx, n, voltage, Cs, Q0, Ts)
    lm = jnp.log1p(jnp.maximum(model, 0.0))
    lo = jnp.log1p(jnp.maximum(psd, 0.0))
    w = band
    mw = (lm * w).sum() / w.sum()
    ow = (lo * w).sum() / w.sum()
    num = ((lm - mw) * (lo - ow) * w).sum()
    den = jnp.sqrt(((lm - mw) ** 2 * w).sum() * ((lo - ow) ** 2 * w).sum())
    return -(num / jnp.maximum(den, 1e-12))


# ---------------------------------------------------------------------------
# staged estimation
# ---------------------------------------------------------------------------

class CTFEstimator:
    def __init__(self, psd_half: np.ndarray, sampling: float,
                 voltage: float = 300.0, Cs: float = 2.7, Q0: float = 0.07,
                 min_freq: float = 0.03, max_freq: float = 0.35,
                 defocus_range=(2000.0, 40000.0)):
        self.psd = np.asarray(psd_half, np.float32)
        self.n = self.psd.shape[0]
        self.Ts = sampling
        self.voltage = voltage
        self.Cs = Cs
        self.Q0 = Q0
        fy, fx = _freq_grids(self.n, sampling)
        self.fy = jnp.asarray(fy)
        self.fx = jnp.asarray(fx)
        r_dig = np.sqrt((fy * sampling) ** 2 + (fx * sampling) ** 2)
        self.band = jnp.asarray(((r_dig >= min_freq) & (r_dig <= max_freq))
                                .astype(np.float32))
        self.defocus_range = defocus_range

    # -- stage 1: radial background -------------------------------------
    def fit_background(self):
        from xmipp3_tpu.ops.psd import radial_profile
        freqs_dig, prof = radial_profile(self.psd)
        freqs = freqs_dig / self.Ts           # 1/Å
        sel = (freqs_dig > 0.02) & (freqs_dig < 0.45)
        x, y = freqs[sel], prof[sel]

        def bg(params, u):
            base, sqrtK, sq = params
            return base + np.abs(sqrtK) * np.exp(-np.abs(sq) * np.sqrt(u))

        def resid(params):
            return np.log1p(np.maximum(bg(params, x), 0)) - np.log1p(y)

        p0 = np.array([np.percentile(y, 5), max(y.max() - y.min(), 1e-3),
                       5.0])
        res = scipy.optimize.least_squares(resid, p0, method="lm",
                                           max_nfev=200)
        base, sqrtK, sq = res.x
        self.bg_params = (float(base), float(abs(sqrtK)), float(abs(sq)))
        return self.bg_params

    # -- stage 2: defocus grid search -----------------------------------
    def _params_vec(self, defU, defV, ang, logK=None):
        base, sqrtK, sq = self.bg_params
        if logK is None:
            logK = np.log(max(np.asarray(self.psd).max() * 1e-2, 1e-6))
        return np.array([defU, defV, ang, logK, base, sqrtK, sq,
                         0.0, 1.0, 0.0, -2.0 * self.Ts], np.float32)

    def grid_search_defocus(self, n_steps: int = 60):
        lo, hi = self.defocus_range
        defs = np.linspace(lo, hi, n_steps)
        best = (None, np.inf)
        for d in defs:
            for logK in (np.log(self.psd.max() * 0.3 + 1e-12),
                         np.log(self.psd.mean() + 1e-12)):
                p = self._params_vec(d, d, 0.0, logK)
                f = float(_fitness(jnp.asarray(p), jnp.asarray(self.psd),
                                   self.fy, self.fx, self.band, self.n,
                                   self.voltage, self.Cs, self.Q0, self.Ts))
                if f < best[1]:
                    best = (p, f)
        self.params = best[0]
        return float(best[0][0]), best[1]

    # -- stage 3: Powell refinement -------------------------------------
    def refine(self, maxiter: int = 6):
        psd_j = jnp.asarray(self.psd)

        def cost(p):
            return float(_fitness(jnp.asarray(p, jnp.float32), psd_j,
                                  self.fy, self.fx, self.band, self.n,
                                  self.voltage, self.Cs, self.Q0, self.Ts))

        res = scipy.optimize.minimize(
            cost, self.params, method="Powell",
            options=dict(maxiter=maxiter, xtol=1e-3, ftol=1e-5))
        self.params = res.x.astype(np.float32)
        self.final_fitness = float(res.fun)
        return res

    # -- full pipeline ---------------------------------------------------
    def estimate(self) -> CTFDescription:
        self.fit_background()
        self.grid_search_defocus()
        self.refine()
        p = self.params
        defU, defV, ang = float(p[0]), float(p[1]), float(p[2])
        if defU < defV:   # canonical: defocusU >= defocusV, angle in [0,180)
            defU, defV = defV, defU
            ang += 90.0
        ang = ang % 180.0
        return CTFDescription(
            sampling_rate=self.Ts, voltage=self.voltage, Cs=self.Cs,
            Q0=self.Q0, defocusU=defU, defocusV=defV, azimuthal_angle=ang,
            K=float(np.exp(p[3])), base_line=float(p[4]),
            sqrt_K=float(p[5]), sqU=float(p[6]), sqV=float(p[6]),
            gaussian_K=float(p[7]), sigmaU=float(p[8]), sigmaV=float(p[8]),
            cU=float(p[9]), cV=float(p[9]))


def estimate_ctf_from_psd(psd_half, sampling, voltage=300.0, Cs=2.7,
                          Q0=0.07, **kw) -> CTFDescription:
    est = CTFEstimator(psd_half, sampling, voltage, Cs, Q0, **kw)
    return est.estimate()
