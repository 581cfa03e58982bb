"""CTF estimation: fit the full CTF forward model to an observed PSD.

Rebuilds the reference's staged estimation (ctf_estimate_from_psd.cpp:
estimate_background_sqrt_parameters / estimate_background_gauss_parameters
:1072-, estimate_defoci astigmatic grid search :1778, Powell refinement over
the 13+-parameter model via CTF_fitness :601-984 with background
penalization) TPU-first:

- ONE jitted model/fitness over the whole 2-D PSD, parameterized by a flat
  30-float vector covering the complete reference model: astigmatic defocus,
  gain, chromatic/aperture envelopes (espr, alpha, DeltaF, DeltaR, envR1/2),
  anisotropic sqrt + double-Gaussian background (U/V/angle each), VPP phase
  shift. Same formulas as ops.ctf.CTFDescription (reference data/ctf.h:
  getValuePureAt :452, getValueNoiseAt :506, produceSideInfo ctf.cpp:645).
- grid searches are vmapped batches: thousands of (defU, defV, angle)
  candidates are scored in a handful of device calls instead of the
  reference's serial loop.
- Powell refinement runs on the host (scipy), driving the fixed-shape
  jitted fitness — the same architecture the reference uses
  (powellOptimizer + CTF_fitness_object) with a compiled objective.

The 1-D radial variant (reference ctf_estimate_from_psd_fast, a distinct
program) is `estimate_ctf_1d` below: the same staged flow on the radially
averaged profile with an isotropic model.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
import scipy.optimize

from xmipp3_tpu.ops.ctf import CTFDescription

# ---------------------------------------------------------------------------
# parameter vector layout (all float32; angles in degrees, alpha in rad)
# ---------------------------------------------------------------------------
DEFU, DEFV, ANGLE, LOGK = 0, 1, 2, 3
ESPR, ALPHA, DELTAF, DELTAR, ENVR1, ENVR2 = 4, 5, 6, 7, 8, 9
BASE, SQK, SQU, SQV, SQANG = 10, 11, 12, 13, 14
G1K, G1SU, G1SV, G1ANG, G1CU, G1CV = 15, 16, 17, 18, 19, 20
G2K, G2SU, G2SV, G2ANG, G2CU, G2CV = 21, 22, 23, 24, 25, 26
PHASE_SHIFT = 27
NPARAMS = 28

# named stages -> indices free to move (reference action levels 0..7,
# ctf_estimate_from_psd.cpp CTF_fitness action thresholds)
STAGE_SETS = {
    "bg_sqrt": [BASE, SQK, SQU, SQV, SQANG],
    "bg_gauss": [G1K, G1SU, G1SV, G1ANG, G1CU, G1CV],
    "defocus": [DEFU, DEFV, ANGLE, LOGK],
    "envelope": [DEFU, DEFV, ANGLE, LOGK, ESPR, ALPHA, ENVR1, ENVR2],
    "bg_gauss2": [G2K, G2SU, G2SV, G2ANG, G2CU, G2CV],
    "all": list(range(NPARAMS - 1)),
    "all_vpp": list(range(NPARAMS)),
}


def _ellip(valU, valV, angle_deg, c2t, s2t):
    """Elliptically interpolated radial parameter (reference
    precomputeValues noise-parameter ellipses, data/ctf.cpp)."""
    a = jnp.deg2rad(angle_deg)
    cos2d = c2t * jnp.cos(2 * a) + s2t * jnp.sin(2 * a)
    cc = (1 + cos2d) / 2
    ss = (1 - cos2d) / 2
    return jnp.sqrt(valU * valU * cc + valV * valV * ss)


@partial(jax.jit, static_argnames=("n",))
def _model_psd(p, fy, fx, n: int, consts):
    """Full model PSD: anisotropic noise + (K * CTF * E)^2.

    consts = (voltage kV, Cs mm, Ca mm, Q0, VPP_radius)."""
    voltage, Cs, Ca, Q0, vpp_r = consts
    u2 = fx * fx + fy * fy
    u = jnp.sqrt(u2)
    u4 = u2 * u2
    safe = jnp.maximum(u2, 1e-30)
    c2t = (fx * fx - fy * fy) / safe
    s2t = 2 * fx * fy / safe

    # --- side info (reference produceSideInfo, ctf.cpp:645-678)
    local_Cs = Cs * 1e7
    local_Ca = Ca * 1e7
    local_kV = voltage * 1e3
    lam = 12.2643247 / jnp.sqrt(local_kV * (1 + 0.978466e-6 * local_kV))
    K1 = jnp.pi * lam
    K2 = jnp.pi / 2 * local_Cs * lam ** 3
    K3 = (0.25 * jnp.pi * local_Ca * lam * (p[ESPR] / voltage)) ** 2 \
        / jnp.log(2.0)
    K5 = jnp.pi * p[DELTAF] * lam
    K6 = jnp.pi ** 2 * p[ALPHA] * p[ALPHA]
    K7 = local_Cs * lam ** 2

    # --- astigmatic defocus
    az = jnp.deg2rad(p[ANGLE])
    cos2 = c2t * jnp.cos(2 * az) + s2t * jnp.sin(2 * az)
    deltaf = -(p[DEFU] + p[DEFV]) / 2 + (-(p[DEFU] - p[DEFV]) / 2) * cos2
    deltaf = jnp.where(u2 > 0, deltaf, 0.0)

    vpp = jnp.where(jnp.abs(vpp_r) > 1e-3,
                    -p[PHASE_SHIFT] *
                    (1 - jnp.exp(-u2 / (2 * jnp.maximum(vpp_r, 1e-6) ** 2))),
                    0.0)
    arg = vpp + K1 * deltaf * u2 + K2 * u4
    Ksin = jnp.sqrt(jnp.maximum(1 - Q0 ** 2, 0.0))
    ctf = -(Ksin * jnp.sin(arg) - Q0 * jnp.cos(arg))

    # --- envelope (reference getValueDampingAt, ctf.h:424-448)
    from xmipp3_tpu.ops.ctf import _bessel_j0
    Eespr = jnp.exp(-K3 * u4)
    EdeltaF = _bessel_j0(K5 * u2)
    EdeltaR = jnp.sinc(u * p[DELTAR])
    aux = K7 * u2 * u + deltaf * u
    Ealpha = jnp.exp(-K6 * aux * aux)
    E = Eespr * EdeltaF * EdeltaR * Ealpha + p[ENVR1] * u + p[ENVR2] * u2
    E = jnp.maximum(E, 0.0)
    signal = (jnp.exp(p[LOGK]) * ctf * E) ** 2

    # --- anisotropic noise (reference getValueNoiseAt, ctf.h:506-539)
    sq = _ellip(jnp.abs(p[SQU]), jnp.abs(p[SQV]), p[SQANG], c2t, s2t)
    sig1 = _ellip(jnp.abs(p[G1SU]), jnp.abs(p[G1SV]), p[G1ANG], c2t, s2t)
    c1 = _ellip(jnp.abs(p[G1CU]), jnp.abs(p[G1CV]), p[G1ANG], c2t, s2t)
    sig2 = _ellip(jnp.abs(p[G2SU]), jnp.abs(p[G2SV]), p[G2ANG], c2t, s2t)
    c2c = _ellip(jnp.abs(p[G2CU]), jnp.abs(p[G2CV]), p[G2ANG], c2t, s2t)
    noise = (p[BASE]
             + jnp.abs(p[G1K]) * jnp.exp(-sig1 * (u - c1) ** 2)
             + jnp.abs(p[SQK]) * jnp.exp(-sq * jnp.sqrt(u))
             - jnp.abs(p[G2K]) * jnp.exp(-sig2 * (u - c2c) ** 2))
    out = jnp.maximum(noise, 0.0) + signal
    # clamp to a finite range: host Powell explores extreme parameters and
    # an inf/NaN model would poison the line search
    return jnp.clip(jnp.nan_to_num(out, nan=0.0, posinf=1e30), 0.0, 1e30)


@partial(jax.jit, static_argnames=("n",))
def _fitness(p, psd, fy, fx, band, n: int, consts):
    """Negative masked log-domain correlation + background penalties
    (reference CTF_fitness :601-984; penalization of backgrounds above
    the PSD mirrors the reference's heavy_penalization)."""
    model = _model_psd(p, fy, fx, n, consts)
    lm = jnp.log1p(jnp.maximum(model, 0.0))
    lo = jnp.log1p(jnp.maximum(psd, 0.0))
    w = band
    wsum = w.sum()
    mw = (lm * w).sum() / wsum
    ow = (lo * w).sum() / wsum
    num = ((lm - mw) * (lo - ow) * w).sum()
    den = jnp.sqrt(((lm - mw) ** 2 * w).sum() * ((lo - ow) ** 2 * w).sum())
    corr = num / jnp.maximum(den, 1e-12)
    # penalty: pure background must not exceed the observed PSD
    zero = jnp.zeros((NPARAMS,), p.dtype)
    bgonly = zero.at[BASE:G2CV + 1].set(p[BASE:G2CV + 1]).at[LOGK].set(-30.0)
    noise = _model_psd(bgonly, fy, fx, n, consts)
    over = jnp.maximum(jnp.log1p(noise) - lo, 0.0)
    pen = (over * w).sum() / wsum
    val = -(corr) + 2.0 * pen
    return jnp.where(jnp.isfinite(val), val, 1e3)


@partial(jax.jit, static_argnames=("n",))
def _fitness_batch(P, psd, fy, fx, band, n: int, consts):
    return jax.vmap(lambda p: _fitness(p, psd, fy, fx, band, n, consts))(P)


def _compass_core(p0, steps0, psd, fy, fx, band, n: int, consts,
                  free: tuple, n_rounds: int):
    """Whole compass/pattern search as ONE device program: n_rounds of
    [evaluate all +/-step coordinate candidates -> move or halve steps]
    inside a lax.scan, so a full stage costs a single dispatch (the
    host-looped version paid one axon relay round-trip per round)."""
    F = len(free)
    E = np.zeros((2 * F + 1, NPARAMS), np.float32)
    for j, idx in enumerate(free):
        E[1 + 2 * j, idx] = 1.0
        E[2 + 2 * j, idx] = -1.0
    E = jnp.asarray(E)

    def round_fn(carry, _):
        p, steps, best = carry
        srow = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                jnp.repeat(steps, 2)])
        cands = p[None, :] + E * srow[:, None]
        costs = jax.vmap(
            lambda q: _fitness(q, psd, fy, fx, band, n, consts))(cands)
        k = jnp.argmin(costs)
        improved = (k != 0) & (costs[k] < best - 1e-7)
        p = jnp.where(improved, cands[k], p)
        steps = jnp.where(improved, steps, steps * 0.5)
        best = jnp.where(improved, costs[k], best)
        return (p, steps, best), None

    best0 = _fitness(p0, psd, fy, fx, band, n, consts)
    (p, _, best), _ = jax.lax.scan(
        round_fn, (p0, steps0, best0), None, length=n_rounds)
    return p, best


_compass_opt = partial(jax.jit, static_argnames=("n", "free", "n_rounds"))(
    _compass_core)


@partial(jax.jit, static_argnames=("n", "free", "n_rounds"))
def _compass_opt_batch(P0, steps0, psds, fy, fx, band, n: int, consts,
                       free: tuple, n_rounds: int):
    """vmapped compass: R independent (seed, PSD) searches in one
    dispatch — the per-region local defocus refinements of regions mode
    (reference ctf_estimate_from_micrograph OnePerRegion) run together."""
    return jax.vmap(
        lambda p0, psd: _compass_core(p0, steps0, psd, fy, fx, band, n,
                                      consts, free, n_rounds))(P0, psds)


def refine_defocus_batch(psds, seed_params, sampling, voltage=300.0,
                         Cs=2.7, Q0=0.07, Ca=2.0, min_freq=0.03,
                         max_freq=0.35, vpp_radius=0.0, maxiter=3):
    """Seeded per-PSD defocus refinement for a stack of piece PSDs, all
    in one device dispatch. Returns (R, NPARAMS) refined parameters.

    Accepts an already-sharded jax Array (parallel.engines
    .parallel_refine_defocus) — the sharding is preserved into the jitted
    compass dispatch, so the region axis partitions over the mesh."""
    if not isinstance(psds, jax.Array):
        psds = np.asarray(psds, np.float32)
    R, n = psds.shape[0], psds.shape[1]
    fy, fx = _freq_grids(n, float(sampling))
    r_dig = np.sqrt((fy * sampling) ** 2 + (fx * sampling) ** 2)
    band = jnp.asarray(((r_dig >= min_freq) & (r_dig <= max_freq))
                       .astype(np.float32))
    consts = (float(voltage), float(Cs), float(Ca), float(Q0),
              float(vpp_radius))
    free = tuple(STAGE_SETS["defocus"])
    steps = jnp.asarray(CTFEstimator._STEPS[list(free)], jnp.float32)
    P0 = jnp.broadcast_to(jnp.asarray(seed_params, jnp.float32),
                          (R, NPARAMS))
    P, _ = _compass_opt_batch(P0, steps, jnp.asarray(psds),
                              jnp.asarray(fy), jnp.asarray(fx), band, n,
                              consts, free, int(max(6 * maxiter, 8)))
    return np.array(P, np.float32)


# ---------------------------------------------------------------------------
# staged 2-D estimator
# ---------------------------------------------------------------------------

def _freq_grids(n: int, Ts: float):
    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / Ts
    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / Ts
    return fy, fx


class CTFEstimator:
    """Staged full-model CTF fit on a half (rfft-layout) PSD."""

    def __init__(self, psd_half: np.ndarray, sampling: float,
                 voltage: float = 300.0, Cs: float = 2.7, Q0: float = 0.07,
                 Ca: float = 2.0, min_freq: float = 0.03,
                 max_freq: float = 0.35, defocus_range=(2000.0, 40000.0),
                 vpp_radius: float = 0.0, fast: bool = False):
        self.psd = np.asarray(psd_half, np.float32)
        self.n = self.psd.shape[0]
        self.Ts = float(sampling)
        self.consts = (float(voltage), float(Cs), float(Ca), float(Q0),
                       float(vpp_radius))
        fy, fx = _freq_grids(self.n, self.Ts)
        self.fy = jnp.asarray(fy)
        self.fx = jnp.asarray(fx)
        self.psd_j = jnp.asarray(self.psd)
        r_dig = np.sqrt((fy * self.Ts) ** 2 + (fx * self.Ts) ** 2)
        self.band = jnp.asarray(((r_dig >= min_freq) & (r_dig <= max_freq))
                                .astype(np.float32))
        self.min_freq_dig = min_freq
        self.max_freq_dig = max_freq
        self.defocus_range = defocus_range
        self.fast = fast
        self.params = np.zeros(NPARAMS, np.float32)

    # -- fitness plumbing -------------------------------------------------
    def _cost(self, p):
        return float(_fitness(jnp.asarray(p, jnp.float32), self.psd_j,
                              self.fy, self.fx, self.band, self.n,
                              self.consts))

    def _cost_batch(self, P):
        return np.asarray(_fitness_batch(jnp.asarray(P, jnp.float32),
                                         self.psd_j, self.fy, self.fx,
                                         self.band, self.n, self.consts))

    # per-parameter pattern-search step scales (same role as the
    # reference's Powell step vector)
    _STEPS = np.array([150.0, 150.0, 4.0, 0.25,        # defU defV ang logK
                       0.3, 2e-4, 20.0, 0.5, 0.05, 0.05,  # envelope
                       0.05, 0.2, 2.0, 2.0, 10.0,     # base sqrtK sqU/V ang
                       0.2, 500.0, 500.0, 10.0, 0.01, 0.01,   # gauss1
                       0.2, 500.0, 500.0, 10.0, 0.01, 0.01,   # gauss2
                       0.1], np.float32)               # phase shift

    def _powell(self, free, maxiter=4):
        """Batched compass/pattern search over the `free` subset — the
        reference's powellOptimizer role, re-shaped for the device: every
        round evaluates ALL +/-step coordinate candidates in ONE vmapped
        fitness call (a serial scipy Powell would pay one host<->device
        round-trip per evaluation, which dominates under the axon relay)."""
        free = list(free)
        p = self.params.copy()
        steps = self._STEPS[free].copy()
        # scale data-dependent magnitudes
        psd_scale = float(np.abs(self.psd).mean()) + 1e-12
        for j, idx in enumerate(free):
            if idx in (BASE, SQK, G1K, G2K):
                steps[j] = max(steps[j] * psd_scale, 1e-6)
        n_rounds = max(6 * maxiter, 8)
        p_out, best = _compass_opt(
            jnp.asarray(p, jnp.float32), jnp.asarray(steps, jnp.float32),
            self.psd_j, self.fy, self.fx, self.band, self.n, self.consts,
            free=tuple(free), n_rounds=int(n_rounds))
        self.params = np.array(p_out, np.float32)   # writable copy
        self.final_fitness = float(best)
        return self.final_fitness

    # -- stage 1: sqrt + baseline background ------------------------------
    def fit_background(self):
        from xmipp3_tpu.ops.psd import radial_profile
        freqs_dig, prof = radial_profile(self.psd)
        freqs = np.asarray(freqs_dig) / self.Ts
        prof = np.asarray(prof)
        sel = (freqs_dig > 0.02) & (freqs_dig < 0.45)
        x, y = freqs[sel], prof[sel]

        def resid(q):
            base, sqrtK, sq = q
            bg = base + np.abs(sqrtK) * np.exp(-np.abs(sq) * np.sqrt(x))
            return np.log1p(np.maximum(bg, 0)) - np.log1p(y)

        p0 = np.array([np.percentile(y, 5),
                       max(y.max() - y.min(), 1e-3), 5.0])
        res = scipy.optimize.least_squares(resid, p0, method="lm",
                                           max_nfev=200)
        base, sqrtK, sq = res.x
        self.params[BASE] = max(base, 0.0)
        self.params[SQK] = abs(sqrtK)
        self.params[SQU] = self.params[SQV] = abs(sq)
        self.params[SQANG] = 0.0
        return base, abs(sqrtK), abs(sq)

    # -- stage 2: first Gaussian background --------------------------------
    def fit_gaussian1(self):
        from xmipp3_tpu.ops.psd import radial_profile
        freqs_dig, prof = radial_profile(self.psd)
        freqs = np.asarray(freqs_dig) / self.Ts
        prof = np.asarray(prof)
        bg = (self.params[BASE] + self.params[SQK]
              * np.exp(-self.params[SQU] * np.sqrt(np.maximum(freqs, 0))))
        res = prof - bg
        sel = (freqs_dig > 0.01) & (freqs_dig < 0.2) & (res > 0)
        if sel.sum() < 4:
            return
        i = np.argmax(res * sel)
        c = freqs[i]
        K = max(res[i], 1e-6)
        # half-width at half-max -> sigma
        half = res[i] / 2
        width = 0.02 / self.Ts
        for j in range(i, len(res)):
            if not sel[j] or res[j] < half:
                width = max(freqs[j] - c, 1e-4)
                break
        sigma = np.log(2.0) / width ** 2
        self.params[G1K] = K
        self.params[G1SU] = self.params[G1SV] = sigma
        self.params[G1CU] = self.params[G1CV] = c
        self._powell(STAGE_SETS["bg_sqrt"] + STAGE_SETS["bg_gauss"],
                     maxiter=2)

    # -- stage 3: astigmatic defocus grid search ---------------------------
    def grid_search_defocus(self, n_coarse: int = 60, n_astig: int = 13,
                            n_angles: int = 6):
        lo, hi = self.defocus_range
        logK0 = np.log(max(np.asarray(self.psd).max() * 1e-2, 1e-8))
        # coarse isotropic pass, two gain hypotheses, one vmapped batch
        defs = np.linspace(lo, hi, n_coarse, dtype=np.float32)
        cands = []
        for logK in (logK0, logK0 + np.log(10.0)):
            for d in defs:
                p = self.params.copy()
                p[DEFU] = p[DEFV] = d
                p[ANGLE] = 0.0
                p[LOGK] = logK
                cands.append(p)
        P = np.stack(cands)
        costs = self._cost_batch(P)
        best = P[int(np.argmin(costs))].copy()
        if self.fast:
            astig_span = 0.15 * best[DEFU]
            n_astig = 7
            n_angles = 4
        else:
            astig_span = max(0.25 * best[DEFU], 2500.0)
        # astigmatic refinement around the winner (reference estimate_defoci
        # (defU, defV, angle) grid, ctf_estimate_from_psd.cpp:1778):
        # two levels — high defocus packs Thon rings near the grid
        # resolution and a single coarse level aliases into local optima
        def astig_level(center, span, n_ast, angs):
            dU = center[DEFU] + np.linspace(-span, span, n_ast,
                                            dtype=np.float32)
            dV = center[DEFV] + np.linspace(-span, span, n_ast,
                                            dtype=np.float32)
            cands = []
            for u in dU:
                for v in dV:
                    if v > u:      # canonical: defU >= defV
                        continue
                    for a in angs if u != v else angs[:1]:
                        p = center.copy()
                        p[DEFU], p[DEFV], p[ANGLE] = u, v, a
                        cands.append(p)
            P = np.stack(cands)
            costs = self._cost_batch(P)
            k = int(np.argmin(costs))
            return P[k].astype(np.float32), float(costs[k])

        # adaptive band: beyond f_lim the Thon-ring spacing
        # 1/(2 lambda def f) falls under ~2.5 PSD grid samples and the
        # aliased rings only add noise to the fit (the failure mode at
        # high defocus on small PSDs)
        voltage = self.consts[0]
        lam = 12.2643247 / np.sqrt(voltage * 1e3
                                   * (1 + 0.978466e-6 * voltage * 1e3))
        df_grid = 1.0 / (self.n * self.Ts)
        f_lim = 1.0 / (2.0 * lam * max(best[DEFU], 1.0) * 2.5 * df_grid)
        if f_lim * self.Ts < self.max_freq_dig:
            fy, fx = _freq_grids(self.n, self.Ts)
            r_dig = np.sqrt((fy * self.Ts) ** 2 + (fx * self.Ts) ** 2)
            self.band = jnp.asarray(
                ((r_dig >= self.min_freq_dig)
                 & (r_dig <= max(f_lim * self.Ts, 2 * self.min_freq_dig)))
                .astype(np.float32))

        angs = np.linspace(0.0, 180.0, n_angles, endpoint=False,
                           dtype=np.float32)
        best, cost = astig_level(best, astig_span, n_astig, angs)
        fine_angs = (best[ANGLE] + np.linspace(-20.0, 20.0, 9)) \
            .astype(np.float32)
        best, cost = astig_level(best, astig_span / 5.0, n_astig, fine_angs)
        self.params = best
        return cost

    # -- full pipeline ------------------------------------------------------
    def estimate(self) -> CTFDescription:
        self.fit_background()
        self.fit_gaussian1()
        self.grid_search_defocus()
        self._powell(STAGE_SETS["defocus"], maxiter=3)
        if not self.fast:
            self._powell(STAGE_SETS["envelope"], maxiter=3)
            # second Gaussian init: deepest residual valley at mid freq
            self.params[G2CU] = self.params[G2CV] = \
                0.9 * 0.5 / self.Ts
            self.params[G2SU] = self.params[G2SV] = 100.0 * self.Ts ** 2
            self.params[G2K] = 0.0
            self._powell(STAGE_SETS["bg_gauss2"], maxiter=2)
            self._powell(STAGE_SETS["all"], maxiter=4)
        else:
            self._powell(STAGE_SETS["defocus"], maxiter=2)
        if abs(self.consts[4]) > 1e-3:       # VPP mode
            self._powell(STAGE_SETS["all_vpp"], maxiter=2)
        return self.to_ctf()

    def to_ctf(self) -> CTFDescription:
        p = self.params.astype(np.float64)
        defU, defV, ang = float(p[DEFU]), float(p[DEFV]), float(p[ANGLE])
        if defU < defV:
            defU, defV = defV, defU
            ang += 90.0
        ang = ang % 180.0
        voltage, Cs, Ca, Q0, vpp_r = self.consts
        return CTFDescription(
            sampling_rate=self.Ts, voltage=voltage, Cs=Cs, Ca=Ca, Q0=Q0,
            defocusU=defU, defocusV=defV, azimuthal_angle=ang,
            K=float(np.exp(p[LOGK])), espr=float(abs(p[ESPR])),
            alpha=float(abs(p[ALPHA])), DeltaF=float(abs(p[DELTAF])),
            DeltaR=float(abs(p[DELTAR])), envR1=float(p[ENVR1]),
            envR2=float(p[ENVR2]),
            base_line=float(max(p[BASE], 0.0)), sqrt_K=float(abs(p[SQK])),
            sqU=float(abs(p[SQU])), sqV=float(abs(p[SQV])),
            sqrt_angle=float(p[SQANG] % 180.0),
            gaussian_K=float(abs(p[G1K])), sigmaU=float(abs(p[G1SU])),
            sigmaV=float(abs(p[G1SV])), gaussian_angle=float(p[G1ANG] % 180.0),
            cU=float(abs(p[G1CU])), cV=float(abs(p[G1CV])),
            gaussian_K2=float(abs(p[G2K])), sigmaU2=float(abs(p[G2SU])),
            sigmaV2=float(abs(p[G2SV])),
            gaussian_angle2=float(p[G2ANG] % 180.0),
            cU2=float(abs(p[G2CU])), cV2=float(abs(p[G2CV])),
            phase_shift=float(abs(p[PHASE_SHIFT])), VPP_radius=vpp_r)


def estimate_ctf_from_psd(psd_half, sampling, voltage=300.0, Cs=2.7,
                          Q0=0.07, **kw) -> CTFDescription:
    est = CTFEstimator(psd_half, sampling, voltage, Cs, Q0, **kw)
    return est.estimate()


# ---------------------------------------------------------------------------
# 1-D radial variant (reference ctf_estimate_from_psd_fast — a distinct
# program: ProgCTFEstimateFromPSDFast fits the radially averaged profile)
# ---------------------------------------------------------------------------

@jax.jit
def _model_1d(p, u, consts):
    fy = jnp.zeros_like(u)
    return _model_psd(p, fy, u, 0, consts)


@jax.jit
def _fitness_1d(p, prof, u, w, consts):
    model = _model_1d(p, u, consts)
    lm = jnp.log1p(jnp.maximum(model, 0.0))
    lo = jnp.log1p(jnp.maximum(prof, 0.0))
    wsum = w.sum()
    mw = (lm * w).sum() / wsum
    ow = (lo * w).sum() / wsum
    num = ((lm - mw) * (lo - ow) * w).sum()
    den = jnp.sqrt(((lm - mw) ** 2 * w).sum() * ((lo - ow) ** 2 * w).sum())
    return -(num / jnp.maximum(den, 1e-12))


@partial(jax.jit, static_argnames=("free", "mirror", "n_rounds"))
def _compass_opt_1d(p0, steps0, prof, u, w, consts, free: tuple,
                    mirror: tuple, n_rounds: int):
    """1-D profile analog of _compass_opt: isotropic fit with V-params
    mirrored from U after every move, one dispatch for the whole search."""
    F = len(free)
    E = np.zeros((2 * F + 1, NPARAMS), np.float32)
    for j, idx in enumerate(free):
        E[1 + 2 * j, idx] = 1.0
        E[2 + 2 * j, idx] = -1.0
    E = jnp.asarray(E)

    def _mirror(q):
        for dst, src in mirror:
            q = q.at[..., dst].set(q[..., src])
        return q

    def round_fn(carry, _):
        p, steps, best = carry
        srow = jnp.concatenate([jnp.zeros((1,), jnp.float32),
                                jnp.repeat(steps, 2)])
        cands = _mirror(p[None, :] + E * srow[:, None])
        costs = jax.vmap(
            lambda q: _fitness_1d(q, prof, u, w, consts))(cands)
        k = jnp.argmin(costs)
        improved = (k != 0) & (costs[k] < best - 1e-7)
        p = jnp.where(improved, cands[k], p)
        steps = jnp.where(improved, steps, steps * 0.5)
        best = jnp.where(improved, costs[k], best)
        return (p, steps, best), None

    best0 = _fitness_1d(_mirror(p0), prof, u, w, consts)
    (p, _, best), _ = jax.lax.scan(
        round_fn, (_mirror(p0), steps0, best0), None, length=n_rounds)
    return p, best


_fitness_1d_batch = jax.jit(jax.vmap(_fitness_1d,
                                     in_axes=(0, None, None, None, None)))


def estimate_ctf_1d(psd_half, sampling, voltage=300.0, Cs=2.7, Q0=0.07,
                    Ca=2.0, min_freq=0.03, max_freq=0.35,
                    defocus_range=(2000.0, 40000.0)) -> CTFDescription:
    """Reference ctf_estimate_from_psd_fast: isotropic fit on the radial
    average (fast 1-D variant; astigmatism is NOT estimated)."""
    from xmipp3_tpu.ops.psd import radial_profile
    freqs_dig, prof = radial_profile(np.asarray(psd_half, np.float32))
    freqs_dig = np.asarray(freqs_dig)
    prof = np.asarray(prof, np.float32)
    Ts = float(sampling)
    u = jnp.asarray(freqs_dig / Ts, jnp.float32)
    w = jnp.asarray(((freqs_dig >= min_freq) & (freqs_dig <= max_freq))
                    .astype(np.float32))
    prof_j = jnp.asarray(prof)
    consts = (float(voltage), float(Cs), float(Ca), float(Q0), 0.0)

    p = np.zeros(NPARAMS, np.float32)
    # background init on the profile tail
    sel = freqs_dig > 0.35
    p[BASE] = float(prof[sel].mean()) if sel.any() else float(prof.min())
    p[SQK] = max(float(prof.max() - p[BASE]), 1e-3)
    p[SQU] = p[SQV] = 5.0

    lo, hi = defocus_range
    logK0 = np.log(max(prof.max() * 1e-2, 1e-8))
    cands = []
    for logK in (logK0, logK0 + np.log(10.0)):
        for d in np.linspace(lo, hi, 120, dtype=np.float32):
            q = p.copy()
            q[DEFU] = q[DEFV] = d
            q[LOGK] = logK
            cands.append(q)
    P = jnp.asarray(np.stack(cands))
    costs = np.asarray(_fitness_1d_batch(P, prof_j, u, w, consts))
    p = np.asarray(P[int(np.argmin(costs))]).copy()

    # device-side compass refinement over the isotropic subset (same
    # single-dispatch scan as the 2-D _compass_opt; V-params mirror U)
    free = (DEFU, LOGK, BASE, SQK, SQU, G1K, G1SU, G1CU)
    mirror = ((DEFV, DEFU), (SQV, SQU), (G1SV, G1SU), (G1CV, G1CU))
    steps = np.array([150.0, 0.25, max(0.05 * abs(p[BASE]), 1e-3),
                      max(0.2 * abs(p[SQK]), 1e-3), 0.5,
                      max(0.2 * abs(p[G1K]) + 1e-3, 1e-3), 500.0, 0.01],
                     np.float32)
    p_out, _ = _compass_opt_1d(jnp.asarray(p), jnp.asarray(steps),
                               prof_j, u, w, consts, free=free,
                               mirror=mirror, n_rounds=24)
    p = np.array(p_out, np.float32)
    return CTFDescription(
        sampling_rate=Ts, voltage=voltage, Cs=Cs, Ca=Ca, Q0=Q0,
        defocusU=float(p[DEFU]), defocusV=float(p[DEFV]), azimuthal_angle=0.0,
        K=float(np.exp(p[LOGK])), base_line=float(max(p[BASE], 0.0)),
        sqrt_K=float(abs(p[SQK])), sqU=float(abs(p[SQU])),
        sqV=float(abs(p[SQV])), gaussian_K=float(abs(p[G1K])),
        sigmaU=float(abs(p[G1SU])), sigmaV=float(abs(p[G1SV])),
        cU=float(abs(p[G1CU])), cV=float(abs(p[G1CV])))


# ---------------------------------------------------------------------------
# local defocus plane fit (reference ctf_estimate_from_micrograph.cpp:470-560
# OnePerRegion: fit defocus(x, y) = a + b x + c y over region centers)
# ---------------------------------------------------------------------------

def fit_defocus_plane(xs, ys, values):
    """Least-squares plane v = a + b*x + c*y; returns (a, b, c)."""
    A = np.stack([np.ones_like(xs), xs, ys], axis=1).astype(np.float64)
    coef, *_ = np.linalg.lstsq(A, np.asarray(values, np.float64), rcond=None)
    return coef
