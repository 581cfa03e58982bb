"""CTF forward model (astigmatic, with envelopes and noise background).

Rebuilds the physics of the reference's CTFDescription (data/ctf.h:782,
produceSideInfo data/ctf.cpp:645-678,1392-1401, getValuePureAt data/ctf.h:452-,
getValueNoiseAt data/ctf.h:1140-1175) as vectorized jnp math over frequency
grids — one fused elementwise evaluation instead of per-pixel virtual calls.

Model (frequencies u in 1/Å, angles in rad):
  λ = 12.2643247 / sqrt(V (1 + 0.978466e-6 V)),  V = 1000·kV        [Å]
  Δf(θ) = defocus_average + defocus_deviation·cos 2(θ − azimuth)
      defocus_average  = −(DeltafU + DeltafV)/2
      defocus_deviation= −(DeltafU − DeltafV)/2
  χ(u,θ) = VPP + πλ·Δf·u² + (π/2)·Cs λ³·u⁴
  CTF_pure = −K·(√(1−Q0²)·sin χ − Q0·cos χ)·E(u)
  E = exp(−K3 u⁴)·J0(K5 u²)·sinc(u·ΔR)·exp(−K6 (K7 u³ + Δf u)²)
      + envR0 + envR1·u + envR2·u²   (clipped ≥ 0)
  noise(u,θ) = baseline + gK e^{−σ(θ)(u−c(θ))²} + sqrtK e^{−sq(θ)√u}
               − gK2 e^{−σ2(θ)(u−c2(θ))²} + bgR1 u + bgR2 u² + bgR3 u³
"""
from __future__ import annotations

from dataclasses import dataclass, field, fields

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.core.metadata import MetaData


@dataclass
class CTFDescription:
    """Parameter set; mirrors the .ctfparam metadata contract."""
    sampling_rate: float = 2.0      # Tm, Å/px
    voltage: float = 100.0          # kV
    defocusU: float = 0.0           # Å (positive = underfocus)
    defocusV: float = 0.0
    azimuthal_angle: float = 0.0    # deg
    Cs: float = 0.0                 # mm
    Ca: float = 0.0                 # mm (chromatic aberration)
    espr: float = 0.0               # energy spread (eV)
    ispr: float = 0.0               # lens stability (ppm)
    alpha: float = 0.0              # convergence cone (mrad-ish, xmipp units rad)
    DeltaF: float = 0.0             # longitudinal displacement (Å)
    DeltaR: float = 0.0             # transversal displacement (Å)
    Q0: float = 0.0                 # amplitude contrast
    K: float = 1.0                  # global gain
    envR0: float = 0.0
    envR1: float = 0.0
    envR2: float = 0.0
    phase_shift: float = 0.0        # VPP phase shift (rad)
    VPP_radius: float = 0.0
    # noise background
    base_line: float = 0.0
    gaussian_K: float = 0.0
    sigmaU: float = 0.0
    sigmaV: float = 0.0
    cU: float = 0.0
    cV: float = 0.0
    gaussian_angle: float = 0.0
    sqrt_K: float = 0.0
    sqU: float = 0.0
    sqV: float = 0.0
    sqrt_angle: float = 0.0
    gaussian_K2: float = 0.0
    sigmaU2: float = 0.0
    sigmaV2: float = 0.0
    cU2: float = 0.0
    cV2: float = 0.0
    gaussian_angle2: float = 0.0
    bgR1: float = 0.0
    bgR2: float = 0.0
    bgR3: float = 0.0

    # ------------------------------------------------------------------
    _MD_MAP = {
        "sampling_rate": "ctfSamplingRate", "voltage": "ctfVoltage",
        "defocusU": "ctfDefocusU", "defocusV": "ctfDefocusV",
        "azimuthal_angle": "ctfDefocusAngle",
        "Cs": "ctfSphericalAberration", "Ca": "ctfChromaticAberration",
        "espr": "ctfEnergyLoss", "ispr": "ctfLensStability",
        "alpha": "ctfConvergenceCone", "DeltaF": "ctfLongitudinalDisplacement",
        "DeltaR": "ctfTransversalDisplacement", "Q0": "ctfQ0", "K": "ctfK",
        "envR0": "ctfEnvR0", "envR1": "ctfEnvR1", "envR2": "ctfEnvR2",
        "phase_shift": "ctfVPPphaseshift", "VPP_radius": "ctfVPPRadius",
        "base_line": "ctfBgBaseline", "gaussian_K": "ctfBgGaussianK",
        "sigmaU": "ctfBgGaussianSigmaU", "sigmaV": "ctfBgGaussianSigmaV",
        "cU": "ctfBgGaussianCU", "cV": "ctfBgGaussianCV",
        "gaussian_angle": "ctfBgGaussianAngle",
        "sqrt_K": "ctfBgSqrtK", "sqU": "ctfBgSqrtU", "sqV": "ctfBgSqrtV",
        "sqrt_angle": "ctfBgSqrtAngle",
        "gaussian_K2": "ctfBgGaussian2K", "sigmaU2": "ctfBgGaussian2SigmaU",
        "sigmaV2": "ctfBgGaussian2SigmaV", "cU2": "ctfBgGaussian2CU",
        "cV2": "ctfBgGaussian2CV", "gaussian_angle2": "ctfBgGaussian2Angle",
    }

    @classmethod
    def from_row(cls, row) -> "CTFDescription":
        """Build from a metadata row's inline ctf* labels (reference
        CTFDescription::readFromMdRow)."""
        kwargs = {}
        for attr, label in cls._MD_MAP.items():
            if label in row:
                kwargs[attr] = float(row[label])
        return cls(**kwargs)

    @classmethod
    def from_metadata(cls, md_or_path) -> "CTFDescription":
        md = md_or_path if isinstance(md_or_path, MetaData) else \
            MetaData(md_or_path)
        row = md.getRow(md.firstObject())
        kwargs = {}
        for attr, label in cls._MD_MAP.items():
            if label in row:
                kwargs[attr] = float(row[label])
        return cls(**kwargs)

    def to_metadata(self) -> MetaData:
        md = MetaData.fromRows(
            [{label: getattr(self, attr) for attr, label in self._MD_MAP.items()}])
        md.row_format = True
        return md

    def write(self, path: str) -> None:
        self.to_metadata().write(path, block="fullMicrograph")

    @property
    def Tm(self) -> float:
        """Reference-parity alias for the sampling rate (A/px)."""
        return self.sampling_rate

    # ------------------------------------------------------------------
    def side_info(self) -> dict:
        """K1..K7 etc. (reference produceSideInfo, ctf.cpp:645-678)."""
        local_Cs = self.Cs * 1e7
        local_Ca = self.Ca * 1e7
        local_kV = self.voltage * 1e3
        local_ispr = self.ispr * 1e6
        lam = 12.2643247 / np.sqrt(local_kV * (1 + 0.978466e-6 * local_kV))
        K1 = np.pi * lam
        K2 = np.pi / 2 * local_Cs * lam ** 3
        K3 = (0.25 * np.pi * local_Ca * lam *
              (self.espr / self.voltage + 2 * local_ispr)) ** 2 / np.log(2.0)
        K5 = np.pi * self.DeltaF * lam
        K6 = np.pi ** 2 * self.alpha ** 2
        K7 = local_Cs * lam ** 2
        Ksin = np.sqrt(max(1 - self.Q0 ** 2, 0.0))
        Kcos = self.Q0
        return dict(lam=lam, K1=K1, K2=K2, K3=K3, K5=K5, K6=K6, K7=K7,
                    Ksin=Ksin, Kcos=Kcos,
                    defocus_average=-(self.defocusU + self.defocusV) / 2,
                    defocus_deviation=-(self.defocusU - self.defocusV) / 2,
                    rad_azimuth=np.deg2rad(self.azimuthal_angle))

    # ------------------------------------------------------------------
    @staticmethod
    def _cos_sin_2theta(fx, fy):
        """cos(2θ), sin(2θ) computed algebraically — exactly Hermitian-symmetric
        in floating point (atan2-based forms are not, which would break
        phase-flip involution at CTF zero crossings)."""
        u2 = fx * fx + fy * fy
        safe = jnp.maximum(u2, 1e-30)
        return (fx * fx - fy * fy) / safe, 2 * fx * fy / safe

    def _deltaf(self, fx, fy, si):
        c2t, s2t = self._cos_sin_2theta(fx, fy)
        az = si["rad_azimuth"]
        cos2 = c2t * np.cos(2 * az) + s2t * np.sin(2 * az)
        return si["defocus_average"] + si["defocus_deviation"] * cos2

    def pure_at(self, fx, fy, damped: bool = True):
        """CTF value on continuous frequencies (1/Å). fx, fy broadcastable."""
        si = self.side_info()
        fx = jnp.asarray(fx, jnp.float32)
        fy = jnp.asarray(fy, jnp.float32)
        u2 = fx * fx + fy * fy
        u = jnp.sqrt(u2)
        u4 = u2 * u2
        deltaf = jnp.where(u2 > 0, self._deltaf(fx, fy, si), 0.0)
        if self.VPP_radius != 0.0:
            VPP = -self.phase_shift * (1 - jnp.exp(-u2 / (2 * self.VPP_radius ** 2)))
        else:
            VPP = 0.0
        arg = VPP + si["K1"] * deltaf * u2 + si["K2"] * u4
        ctf = -(si["Ksin"] * jnp.sin(arg) - si["Kcos"] * jnp.cos(arg))
        if damped:
            Eespr = jnp.exp(-si["K3"] * u4)
            EdeltaF = _bessel_j0(si["K5"] * u2)
            EdeltaR = jnp.sinc(u * self.DeltaR)
            aux = si["K7"] * u2 * u + deltaf * u
            Ealpha = jnp.exp(-si["K6"] * aux * aux)
            E = Eespr * EdeltaF * EdeltaR * Ealpha + \
                self.envR0 + self.envR1 * u + self.envR2 * u2
            E = jnp.maximum(E, 0.0)
            ctf = ctf * E
        return self.K * ctf

    def argument_at(self, fx, fy):
        """The CTF phase argument chi(f) (reference getValueArgument)."""
        si = self.side_info()
        fx = jnp.asarray(fx, jnp.float32)
        fy = jnp.asarray(fy, jnp.float32)
        u2 = fx * fx + fy * fy
        deltaf = jnp.where(u2 > 0, self._deltaf(fx, fy, si), 0.0)
        return si["K1"] * deltaf * u2 + si["K2"] * u2 * u2

    def noise_at(self, fx, fy):
        """Background noise power model (reference getValueNoiseAt)."""
        fx = jnp.asarray(fx, jnp.float32)
        fy = jnp.asarray(fy, jnp.float32)
        u2 = fx * fx + fy * fy
        u = jnp.sqrt(u2)
        c2t, s2t = self._cos_sin_2theta(fx, fy)

        def ellip(valU, valV, angle_deg):
            a = np.deg2rad(angle_deg)
            cos2d = c2t * np.cos(2 * a) + s2t * np.sin(2 * a)
            c2 = (1 + cos2d) / 2
            s2 = (1 - cos2d) / 2
            return jnp.sqrt(valU * valU * c2 + valV * valV * s2)

        sq = ellip(self.sqU, self.sqV, self.sqrt_angle)
        c = ellip(self.cU, self.cV, self.gaussian_angle)
        sigma = ellip(self.sigmaU, self.sigmaV, self.gaussian_angle)
        c2_ = ellip(self.cU2, self.cV2, self.gaussian_angle2)
        sigma2 = ellip(self.sigmaU2, self.sigmaV2, self.gaussian_angle2)
        return (self.base_line
                + self.gaussian_K * jnp.exp(-sigma * (u - c) ** 2)
                + self.sqrt_K * jnp.exp(-sq * jnp.sqrt(u))
                - self.gaussian_K2 * jnp.exp(-sigma2 * (u - c2_) ** 2)
                + self.bgR1 * u + self.bgR2 * u2 + self.bgR3 * u2 * u)

    # ------------------------------------------------------------------
    def generate_2d(self, h: int, w: int, rfft_layout: bool = True,
                    damped: bool = True):
        """Sampled CTF image (reference generateCTF, data/ctf.h:650-716).

        In rfft layout the fx=0.5 (Nyquist) column aliases ±0.5; the mask is
        symmetrized there so real-filter application preserves realness."""
        Ts = self.sampling_rate
        if rfft_layout:
            fy = np.fft.fftfreq(h).astype(np.float32)[:, None] / Ts
            fx = np.fft.rfftfreq(w).astype(np.float32)[None, :] / Ts
            out = self.pure_at(fx, fy, damped=damped)
            return _hermitianize_rfft_mask(out, w)
        fy = np.fft.fftshift(np.fft.fftfreq(h)).astype(np.float32)[:, None] / Ts
        fx = np.fft.fftshift(np.fft.fftfreq(w)).astype(np.float32)[None, :] / Ts
        return self.pure_at(fx, fy, damped=damped)

    def damping_2d(self, h: int, w: int, rfft_layout: bool = True):
        Ts = self.sampling_rate
        if rfft_layout:
            fy = np.fft.fftfreq(h).astype(np.float32)[:, None] / Ts
            fx = np.fft.rfftfreq(w).astype(np.float32)[None, :] / Ts
        else:
            fy = np.fft.fftshift(np.fft.fftfreq(h)).astype(np.float32)[:, None] / Ts
            fx = np.fft.fftshift(np.fft.fftfreq(w)).astype(np.float32)[None, :] / Ts
        si = self.side_info()
        u2 = fx * fx + fy * fy
        u = jnp.sqrt(u2)
        u4 = u2 * u2
        deltaf = jnp.where(u2 > 0, self._deltaf(fx, fy, si), 0.0)
        Eespr = jnp.exp(-si["K3"] * u4)
        EdeltaF = _bessel_j0(si["K5"] * u2)
        EdeltaR = jnp.sinc(u * self.DeltaR)
        aux = si["K7"] * u2 * u + deltaf * u
        Ealpha = jnp.exp(-si["K6"] * aux * aux)
        E = jnp.maximum(Eespr * EdeltaF * EdeltaR * Ealpha +
                        self.envR0 + self.envR1 * u + self.envR2 * u2, 0.0)
        return self.K * E

    def first_zero_freq(self, n_samples: int = 4096) -> float:
        """Radial frequency (1/Å) of the first CTF zero along azimuth=0."""
        f = np.linspace(1e-6, 0.5 / self.sampling_rate, n_samples)
        vals = np.asarray(self.pure_at(f, np.zeros_like(f), damped=False))
        sign = np.sign(vals)
        idx = np.where(sign[:-1] * sign[1:] < 0)[0]
        return float(f[idx[0]]) if len(idx) else float(f[-1])


def _hermitianize_rfft_mask(mask, w: int):
    """Force the self-conjugate columns (fx=0 and, for even w, fx=Nyquist) of
    an rfft-layout real mask to satisfy m[ky] == m[-ky] by averaging."""
    def sym_col(col):
        flipped = jnp.concatenate([col[:1], col[1:][::-1]])
        return 0.5 * (col + flipped)

    mask = mask.at[:, 0].set(sym_col(mask[:, 0]))
    if w % 2 == 0:
        mask = mask.at[:, -1].set(sym_col(mask[:, -1]))
    return mask


def _bessel_j0(x):
    """J0 via polynomial approximation (Abramowitz & Stegun 9.4.1/9.4.3),
    accurate to ~1e-7 — jnp-traceable on TPU."""
    x = jnp.asarray(x, jnp.float32)
    ax = jnp.abs(x)
    # |x| < 8 (rational approximation, Abramowitz & Stegun / standard tables)
    y = ax * ax
    p1 = (57568490574.0 + y * (-13362590354.0 + y * (651619640.7 + y * (
        -11214424.18 + y * (77392.33017 + y * (-184.9052456))))))
    q1 = (57568490411.0 + y * (1029532985.0 + y * (9494680.718 + y * (
        59272.64853 + y * (267.8532712 + y)))))
    small = p1 / q1
    # |x| >= 8
    z = 8.0 / jnp.maximum(ax, 1e-8)
    y2 = z * z
    xx = ax - 0.785398164
    p2 = (1.0 + y2 * (-0.1098628627e-2 + y2 * (0.2734510407e-4 + y2 * (
        -0.2073370639e-5 + y2 * 0.2093887211e-6))))
    q2 = (-0.1562499995e-1 + y2 * (0.1430488765e-3 + y2 * (
        -0.6911147651e-5 + y2 * (0.7621095161e-6 + y2 * -0.934935152e-7))))
    big = jnp.sqrt(0.636619772 / jnp.maximum(ax, 1e-8)) * (
        jnp.cos(xx) * p2 - z * jnp.sin(xx) * q2)
    return jnp.where(ax < 8.0, small, big)


# ---------------------------------------------------------------------------
# batched application (ops for programs)
# ---------------------------------------------------------------------------

def apply_ctf(imgs, ctf: CTFDescription, absPhase: bool = False):
    """Multiply images by the (damped) CTF in Fourier space
    (reference applyCTF, data/ctf.h:636-639)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    ctf_img = ctf.generate_2d(H, W, rfft_layout=True)
    if absPhase:
        ctf_img = jnp.abs(ctf_img)
    out = jnp.fft.irfft2(jnp.fft.rfft2(imgs) * ctf_img[None], s=(H, W))
    return out[0] if single else out


def phase_flip(imgs, ctf: CTFDescription):
    """Correct CTF phase by sign flip (reference correctPhase/ctf_phase_flip)."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    sign = jnp.sign(ctf.generate_2d(H, W, rfft_layout=True, damped=False))
    sign = jnp.where(sign == 0, 1.0, sign)
    out = jnp.fft.irfft2(jnp.fft.rfft2(imgs) * sign[None], s=(H, W))
    return out[0] if single else out


def wiener_filter_2d(imgs, ctf: CTFDescription, wiener_constant: float = 0.1,
                     isIsotropic: bool = False, phase_flipped: bool = False,
                     pad: float = 1.0, correct_envelope: bool = False):
    """2-D Wiener CTF correction (reference Wiener2D, data/wiener2d.h:36).

    wiener_constant < 0 uses the FREALIGN default (10% of the mean CTF
    power); isIsotropic replaces the astigmatic defocus by its mean; pad
    Fourier-pads by the factor before filtering (ctf_correct_wiener2d.cpp:
    48-53); correct_envelope includes the damping envelope in the inverted
    CTF."""
    imgs = jnp.asarray(imgs, jnp.float32)
    single = imgs.ndim == 2
    if single:
        imgs = imgs[None]
    B, H, W = imgs.shape
    if isIsotropic:
        import copy
        ctf = copy.copy(ctf)
        d = 0.5 * (float(ctf.defocusU) + float(ctf.defocusV))
        ctf.defocusU = ctf.defocusV = d
        ctf.azimuthal_angle = 0.0
    Hp = int(round(H * max(pad, 1.0)))
    Wp = int(round(W * max(pad, 1.0)))
    c = ctf.generate_2d(Hp, Wp, rfft_layout=True,
                        damped=bool(correct_envelope))
    if phase_flipped:
        c = jnp.abs(c)
    wc = wiener_constant
    if wc < 0:
        wc = 0.1 * jnp.mean(c * c)
    wien = c / (c * c + wc)
    if (Hp, Wp) != (H, W):
        py, px = (Hp - H) // 2, (Wp - W) // 2
        padded = jnp.pad(imgs, ((0, 0), (py, Hp - H - py),
                                (px, Wp - W - px)))
        out = jnp.fft.irfft2(jnp.fft.rfft2(padded) * wien[None], s=(Hp, Wp))
        out = out[:, py:py + H, px:px + W]
    else:
        out = jnp.fft.irfft2(jnp.fft.rfft2(imgs) * wien[None], s=(H, W))
    return out[0] if single else out


# ---------------------------------------------------------------------------
# CTF comparison metrics (reference data/ctf.cpp:107-330:
# errorBetween2CTFs, errorMaxFreqCTFs, errorMaxFreqCTFs2D — embedded
# expected values transliterated in tests/test_golden_ctf.py)
# ---------------------------------------------------------------------------

def _full_freq_grid(xdim: int, Tm: float):
    f = np.fft.fftfreq(xdim) / Tm
    return f[:, None], f[None, :]


def error_between_2ctfs(ctf1: "CTFDescription", ctf2: "CTFDescription",
                        xdim: int, min_freq: float, max_freq: float) -> float:
    """Sum over the full FFT grid of |CTF2_pure - CTF1_pure| (undamped pure
    values) restricted to digital |f| in [min_freq, max_freq] (converted to
    1/A with ctf1's sampling)."""
    fy, fx = _full_freq_grid(xdim, ctf1.Tm)
    mod = np.sqrt(fx * fx + fy * fy)
    lo, hi = min_freq / ctf1.Tm, max_freq / ctf1.Tm
    sel = (mod >= lo) & (mod <= hi)
    a = np.asarray(ctf1.pure_at(fx, fy, damped=False), np.float64)
    b = np.asarray(ctf2.pure_at(fx, fy, damped=False), np.float64)
    return float(np.abs(b - a)[sel].sum())


def error_max_freq_ctfs(ctf1: "CTFDescription", phase_rad: float) -> float:
    """Resolution (A) at which the astigmatic phase difference reaches
    phase_rad: 1/sqrt(phase/(K1·|dfU - dfV|))."""
    si = ctf1.side_info()
    return float(1.0 / np.sqrt(
        phase_rad / (si["K1"] * abs(ctf1.defocusU - ctf1.defocusV))))


def error_max_freq_ctfs_2d(ctf1: "CTFDescription", ctf2: "CTFDescription",
                           xdim: int, phase_rad: float) -> float:
    """Resolution (A) from the area of the Fourier plane where the two CTFs'
    phase arguments differ by less than phase_rad."""
    fy, fx = _full_freq_grid(xdim, ctf1.Tm)
    a = np.asarray(ctf1.argument_at(fx, fy), np.float64)
    b = np.asarray(ctf2.argument_at(fx, fy), np.float64)
    counter = int((np.abs(b - a) < phase_rad).sum())
    total = np.pi * xdim * xdim / 4.0
    max_freq_a = 1.0 / (2.0 * ctf1.Tm)
    res_inv = max_freq_a if counter > total else counter * max_freq_a / total
    return float(1.0 / res_inv)


def generate_image_with_2ctfs(ctf1: "CTFDescription",
                              ctf2: "CTFDescription", xdim: int):
    """Centered CTF display image: right half (fx in [0, 0.5)) from ctf1,
    left half from ctf2 (reference generateCTFImageWith2CTFs)."""
    fy, fx = _full_freq_grid(xdim, ctf1.Tm)
    v1 = np.asarray(ctf1.pure_at(fx * 0 + fx, fy + 0 * fx, damped=True))
    v2 = np.asarray(ctf2.pure_at(fx * 0 + fx, fy + 0 * fx, damped=True))
    right = np.fft.fftfreq(xdim) >= 0
    out = np.where(right[None, :], v1, v2)
    return np.fft.fftshift(out)


# ---------------------------------------------------------------------------
# Batched per-image CTF evaluation + gridding inversion factors
# (reference reconstruct_fourier.cpp:576-625: per-Fourier-sample
#  wCTF/wModulator computed from each row's CTF inside the gridding loop)
# ---------------------------------------------------------------------------

# CTFDescription fields consumed by the pure (signal) model, in the order
# expected by ctf_pure_batched's parameter dict.
CTF_PURE_FIELDS = ("defocusU", "defocusV", "azimuthal_angle", "voltage",
                   "Cs", "Ca", "espr", "ispr", "alpha", "DeltaF", "DeltaR",
                   "Q0", "K", "envR0", "envR1", "envR2", "phase_shift",
                   "VPP_radius")


def ctf_params_arrays(ctfs) -> dict:
    """Stack a sequence of CTFDescription (or row dicts) into a dict of
    (C,) float32 numpy arrays keyed by CTF_PURE_FIELDS."""
    out = {}
    for f in CTF_PURE_FIELDS:
        if isinstance(ctfs[0], CTFDescription):
            out[f] = np.array([getattr(c, f) for c in ctfs], np.float32)
        else:
            label = CTFDescription._MD_MAP[f]
            default = getattr(CTFDescription, "__dataclass_fields__")[f].default
            out[f] = np.array([float(c.get(label, default)) for c in ctfs],
                              np.float32)
    return out


def ctf_pure_batched(fx, fy, p: dict, damped: bool = True):
    """Damped pure CTF for a batch of images at shared frequencies.

    fx, fy: (S,) continuous frequencies (1/A); p: dict of (C,) arrays
    (CTF_PURE_FIELDS). Returns (C, S) float32 — the batched equivalent of
    CTFDescription.pure_at / reference getValuePureNoKAt (data/ctf.h:499,
    produceSideInfo ctf.cpp:645-678), evaluated as one fused elementwise
    pass so per-image CTFs ride the VPU instead of a per-row Python loop."""
    fx = jnp.asarray(fx, jnp.float32)[None, :]
    fy = jnp.asarray(fy, jnp.float32)[None, :]
    g = lambda k: jnp.asarray(p[k], jnp.float32)[:, None]
    local_Cs = g("Cs") * 1e7
    local_Ca = g("Ca") * 1e7
    local_kV = g("voltage") * 1e3
    local_ispr = g("ispr") * 1e6
    lam = 12.2643247 / jnp.sqrt(local_kV * (1 + 0.978466e-6 * local_kV))
    K1 = jnp.pi * lam
    K2 = jnp.pi / 2 * local_Cs * lam ** 3
    K3 = (0.25 * jnp.pi * local_Ca * lam *
          (g("espr") / g("voltage") + 2 * local_ispr)) ** 2 / np.log(2.0)
    K5 = jnp.pi * g("DeltaF") * lam
    K6 = jnp.pi ** 2 * g("alpha") ** 2
    K7 = local_Cs * lam ** 2
    Q0 = g("Q0")
    Ksin = jnp.sqrt(jnp.maximum(1 - Q0 * Q0, 0.0))
    defocus_average = -(g("defocusU") + g("defocusV")) / 2
    defocus_deviation = -(g("defocusU") - g("defocusV")) / 2
    az = jnp.deg2rad(g("azimuthal_angle"))

    u2 = fx * fx + fy * fy
    u = jnp.sqrt(u2)
    u4 = u2 * u2
    safe = jnp.maximum(u2, 1e-30)
    c2t = (fx * fx - fy * fy) / safe
    s2t = 2 * fx * fy / safe
    cos2 = c2t * jnp.cos(2 * az) + s2t * jnp.sin(2 * az)
    deltaf = jnp.where(u2 > 0,
                       defocus_average + defocus_deviation * cos2, 0.0)
    vppr = g("VPP_radius")
    vpp_on = jnp.round(vppr * 1000) != 0
    VPP = jnp.where(
        vpp_on,
        -g("phase_shift") * (1 - jnp.exp(-u2 / (2 * jnp.maximum(vppr, 1e-6) ** 2))),
        0.0)
    arg = VPP + K1 * deltaf * u2 + K2 * u4
    ctf = -(Ksin * jnp.sin(arg) - Q0 * jnp.cos(arg))
    if damped:
        Eespr = jnp.exp(-K3 * u4)
        EdeltaF = _bessel_j0(K5 * u2)
        EdeltaR = jnp.sinc(u * g("DeltaR"))
        aux = K7 * u2 * u + deltaf * u
        Ealpha = jnp.exp(-K6 * aux * aux)
        E = Eespr * EdeltaF * EdeltaR * Ealpha + \
            g("envR0") + g("envR1") * u + g("envR2") * u2
        ctf = ctf * jnp.maximum(E, 0.0)
    return g("K") * ctf


def gridding_ctf_factors(cvals, min_ctf, phase_flipped: bool):
    """Per-sample data/weight multipliers for CTF-weighted Fourier gridding.

    Exact transliteration of the reference branch logic
    (reconstruct_fourier.cpp:600-625): with c the CTF value at a sample,
      |c| >= minCTF : data *= 1/c,      weights *= 1
      |c| <  minCTF : data *= sgn(c),   weights *= |c|
    NaN CTF values zero both factors (the reference's DC special case
    never triggers in practice: the pure CTF at (0,0) is finite). With
    --phaseFlipped the data factor takes fabs (the sign was already
    removed from the images). Returns (m_data, m_w), both shaped like
    cvals."""
    a = jnp.abs(cvals)
    below = a < min_ctf
    m_w = jnp.where(below, a, 1.0)
    m_data = jnp.where(below, jnp.sign(cvals),
                       1.0 / jnp.where(below, 1.0, cvals))
    bad = jnp.isnan(cvals)
    m_w = jnp.where(bad, 0.0, m_w)
    m_data = jnp.where(bad, 0.0, m_data)
    if phase_flipped:
        m_data = jnp.abs(m_data)
    return m_data, m_w
