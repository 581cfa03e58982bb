"""CTF correction programs: phase_flip, correct_wiener2d, group, sort_psds,
enhance_psd.

Contracts: reference ctf_phase_flip.{h,cpp}, ctf_correct_wiener2d,
ctf_group, ctf_sort_psds (PSDEvaluation, ctf_sort_psds.h:36),
ctf_enhance_psd (SURVEY.md §2.3 CTF block).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import XmippMetadataProgram
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.ops.ctf import CTFDescription, phase_flip, wiener_filter_2d


def _row_ctf(row, sampling=None) -> CTFDescription:
    if "ctfModel" in row and row["ctfModel"]:
        ctf = CTFDescription.from_metadata(str(row["ctfModel"]))
    else:
        kwargs = {}
        for attr, label in CTFDescription._MD_MAP.items():
            if label in row:
                kwargs[attr] = float(row[label])
        ctf = CTFDescription(**kwargs)
    if sampling:
        ctf.sampling_rate = sampling
    return ctf


class ProgCTFPhaseFlip(XmippMetadataProgram):
    name = "xmipp_ctf_phase_flip"
    apply_geo = False

    def defineProcessParams(self):
        self.addUsageLine("Correct the phase of the CTF (sign flip).")
        self.addParamsLine("  [--ctf <ctfparam=\"\">] : CTF file (else per-row ctf columns)")
        self.addParamsLine("  [--sampling <Ts=0>]  : Override sampling rate")

    def readProcessParams(self):
        self.fn_ctf = self.getParam("--ctf") if self.checkParam("--ctf") else ""
        self.Ts = self.getDoubleParam("--sampling")

    def processBatch(self, imgs, rows):
        if self.fn_ctf:
            ctf = CTFDescription.from_metadata(self.fn_ctf)
            if self.Ts > 0:
                ctf.sampling_rate = self.Ts
            return np.asarray(phase_flip(imgs, ctf))
        out = np.empty_like(imgs)
        for i, r in enumerate(rows):
            ctf = _row_ctf(r, self.Ts if self.Ts > 0 else None)
            out[i] = np.asarray(phase_flip(imgs[i][None], ctf))[0]
        return out


class ProgCTFCorrectWiener2D(XmippMetadataProgram):
    name = "xmipp_ctf_correct_wiener2d"

    def defineProcessParams(self):
        self.addUsageLine("Wiener-filter CTF correction of images.")
        self.addParamsLine("  [--ctf <ctfparam=\"\">] : CTF file (else per-row ctf columns)")
        self.addParamsLine("  [--sampling_rate <Ts=0>] : Override sampling")
        self.addParamsLine("  [--wc <w=0.05>]      : Wiener constant")
        self.addParamsLine("  [--phase_flipped]    : Images are already phase flipped")

    def readProcessParams(self):
        self.fn_ctf = self.getParam("--ctf") if self.checkParam("--ctf") else ""
        self.Ts = self.getDoubleParam("--sampling_rate")
        self.wc = self.getDoubleParam("--wc")
        self.flipped = self.checkParam("--phase_flipped")

    def processBatch(self, imgs, rows):
        if self.fn_ctf:
            ctf = CTFDescription.from_metadata(self.fn_ctf)
            if self.Ts > 0:
                ctf.sampling_rate = self.Ts
            return np.asarray(wiener_filter_2d(imgs, ctf, self.wc,
                                               phase_flipped=self.flipped))
        out = np.empty_like(imgs)
        for i, r in enumerate(rows):
            ctf = _row_ctf(r, self.Ts if self.Ts > 0 else None)
            out[i] = np.asarray(wiener_filter_2d(
                imgs[i][None], ctf, self.wc,
                phase_flipped=self.flipped))[0]
        return out


class ProgCTFGroup(XmippProgram):
    name = "xmipp_ctf_group"

    def defineParams(self):
        self.addUsageLine("Group images by similar CTF (defocus clustering).")
        self.addParamsLine("   --ctfdat <metadata> : Metadata with per-image CTF info")
        self.addParamsLine("  [--oroot <root=ctf_group>] : Output rootname")
        self.addParamsLine("  [--error <e=0.5>]   : Max error (in CTF units) within a group")
        self.addParamsLine("  [--maxdiff <d=1000>] : Max defocus difference within a group (A)")

    def run(self):
        md = MetaData(self.getParam("--ctfdat"))
        maxdiff = self.getDoubleParam("--maxdiff")
        defocus = 0.5 * (md.getColumn("ctfDefocusU").astype(float) +
                         md.getColumn("ctfDefocusV", 0.0).astype(float)
                         if md.containsLabel("ctfDefocusV")
                         else md.getColumn("ctfDefocusU").astype(float))
        order = np.argsort(defocus)
        groups = np.zeros(len(md), int)
        g = 0
        start_val = None
        for k in order:
            if start_val is None or defocus[k] - start_val > maxdiff:
                g += 1
                start_val = defocus[k]
            groups[k] = g
        rows = []
        for i in md:
            r = md.getRow(i)
            r["defGroup"] = int(groups[i])
            rows.append(r)
        MetaData.fromRows(rows).write(self.getParam("--oroot") + ".xmd")
        if self.verbose:
            print(f"Created {g} CTF groups")
        self.n_groups = g


class ProgCTFSortPSDs(XmippProgram):
    name = "xmipp_ctf_sort_psds"

    def defineParams(self):
        self.addUsageLine("Evaluate CTF estimation quality (PSD criteria).")
        self.addParamsLine("   -i <metadata> : Metadata with ctfModel/psd columns")
        self.addParamsLine("  [-o <metadata=\"\">] : Output (default in-place)")

    def run(self):
        md = MetaData(self.getParam("-i"))
        rows = []
        for i in md:
            r = md.getRow(i)
            crits = {}
            try:
                import dataclasses
                ctf = _row_ctf(r)
                fz = ctf.first_zero_freq()
                crits["ctfCritFirstZero"] = fz
                crits["ctfCritFirstZeroRatio"] = (
                    max(ctf.defocusU, ctf.defocusV) /
                    max(min(ctf.defocusU, ctf.defocusV), 1.0))
                crits["ctfCritDamping"] = float(np.asarray(
                    ctf.damping_2d(64, 64)).mean())
                # azimuth-averaged first zero + astigmatic disagreement
                # (reference MDL_CTF_CRIT_FIRSTZEROAVG / DISAGREEMENT)
                zU = fz
                ctfV = dataclasses.replace(ctf, defocusU=ctf.defocusV,
                                           defocusV=ctf.defocusV)
                zV = ctfV.first_zero_freq()
                crits["ctfCritFirstZeroAvg"] = 0.5 * (zU + zV)
                crits["ctfCritFirstZeroDisagreement"] = abs(zU - zV)
                # first minimum of |CTF| after the first zero vs first zero
                # (reference FIRSTMINIMUM_FIRSTZERO_RATIO / _DIFF_RATIO)
                f = np.linspace(1e-4, 0.5 / ctf.sampling_rate, 2048)
                vals = np.abs(np.asarray(
                    ctf.pure_at(f, np.zeros_like(f), damped=False)))
                iz = int(np.searchsorted(f, fz))
                if 0 < iz < len(f) - 2:
                    seg = vals[iz:]
                    imin = iz + int(np.argmin(seg[: max(len(seg) // 4, 2)]))
                    fmin = f[imin]
                    crits["ctfCritFirstMinFirstZeroRatio"] =                         float(fmin / max(fz, 1e-9))
                    crits["ctfCritFirstMinFirstZeroDiffRatio"] =                         float((fmin - fz) / max(fz, 1e-9))
                # max meaningful frequency: envelope drops below 1%
                # (reference MDL_CTF_CRIT_MAXFREQ)
                damp = np.abs(np.asarray(
                    ctf.pure_at(f, np.zeros_like(f), damped=True)))
                env_ok = np.where(damp > 0.01 * damp.max())[0]
                crits["ctfCritMaxFreq"] = float(
                    1.0 / max(f[env_ok[-1]], 1e-6)) if len(env_ok) else 0.0
                # non-astigmatic validity (reference
                # MDL_CTF_CRIT_NONASTIGMATICVALIDITY): zero-crossing count
                # agreement between U and V profiles inside max freq
                crits["ctfCritNonAstigmaticValidity"] = float(
                    abs(zU - zV) / max(0.5 * (zU + zV), 1e-9))
            except Exception:
                pass
            if "psd" in r and r["psd"]:
                try:
                    psd = np.squeeze(Image(str(r["psd"])).data)
                    crits["ctfCritPsdStdQ"] = float(psd.std() /
                                                    max(psd.mean(), 1e-12))
                    from xmipp3_tpu.ops.psd import radial_profile
                    n = psd.shape[0]
                    half = np.ascontiguousarray(
                        np.fft.ifftshift(psd)[:, : n // 2 + 1])
                    _, prof = radial_profile(half)
                    crits["ctfCritPsdRadialIntegral"] = float(prof.sum())
                    # 90-degree self-correlation: low for astigmatic or
                    # drifted PSDs (reference MDL_CTF_CRIT_PSDCORRELATION90)
                    rot90 = np.rot90(psd)
                    a = psd - psd.mean()
                    b = rot90 - rot90.mean()
                    crits["ctfCritPsdCorr90"] = float(
                        (a * b).sum() / max(np.linalg.norm(a)
                                            * np.linalg.norm(b), 1e-12))
                    # background-residual normality z (reference
                    # MDL_CTF_CRIT_NORMALITY): kurtosis+skew test of the
                    # high-frequency half of the PSD
                    import scipy.stats
                    hf = psd[np.abs(np.fft.fftshift(
                        np.fft.fftfreq(n)))[:, None] > 0.25]
                    if hf.size > 32:
                        crits["ctfCritNormality"] = float(
                            scipy.stats.normaltest(hf.ravel()).statistic)
                except Exception:
                    pass
            # model-vs-PSD fitting correlations (reference FITTINGSCORE /
            # FITTINGCORR13): overall and first-third-band agreement
            if "psd" in r and r["psd"] and "ctfCritFirstZero" in crits:
                try:
                    from xmipp3_tpu.models.ctf_estimation import (
                        NPARAMS, _model_psd)
                    import jax.numpy as jnp
                    psd = np.squeeze(Image(str(r["psd"])).data)
                    n = psd.shape[0]
                    half = np.ascontiguousarray(
                        np.fft.ifftshift(psd)[:, : n // 2 + 1]
                    ).astype(np.float32)
                    Ts = ctf.sampling_rate
                    fy = np.fft.fftfreq(n).astype(np.float32)[:, None] / Ts
                    fx = np.fft.rfftfreq(n).astype(np.float32)[None, :] / Ts
                    model = np.asarray(ctf.pure_at(fx, fy)) ** 2 \
                        + np.asarray(ctf.noise_at(fx, fy))
                    lm = np.log1p(np.maximum(model, 0))
                    lo = np.log1p(np.maximum(half, 0))
                    rdig = np.sqrt((fy * Ts) ** 2 + (fx * Ts) ** 2)
                    def corr_in(sel):
                        aa = lm[sel] - lm[sel].mean()
                        bb = lo[sel] - lo[sel].mean()
                        return float((aa * bb).sum() /
                                     max(np.linalg.norm(aa)
                                         * np.linalg.norm(bb), 1e-12))
                    crits["ctfCritFittingScore"] = corr_in(
                        (rdig > 0.02) & (rdig < 0.45))
                    crits["ctfCritFittingCorr13"] = corr_in(
                        (rdig > 0.02) & (rdig < 0.45 / 3))
                except Exception:
                    pass
            r.update(crits)
            rows.append(r)
        out = MetaData.fromRows(rows)
        out.write(self.getParam("-o") if self.checkParam("-o") and
                  self.getParam("-o") else self.getParam("-i"))


class ProgCTFEnhancePSD(XmippMetadataProgram):
    name = "xmipp_ctf_enhance_psd"

    def defineProcessParams(self):
        self.addUsageLine("Enhance PSD rings for visualization/fitting "
                          "(bandpass + local normalization).")
        self.addParamsLine("  [--f1 <w=0.02>] : Lower band limit")
        self.addParamsLine("  [--f2 <w=0.2>]  : Upper band limit")

    def readProcessParams(self):
        self.f1 = self.getDoubleParam("--f1")
        self.f2 = self.getDoubleParam("--f2")

    def processBatch(self, imgs, rows):
        from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                                   band_pass_mask)
        out = np.empty_like(imgs)
        for i in range(len(imgs)):
            p = np.log1p(np.maximum(imgs[i], 0))
            H, W = p.shape
            f = np.asarray(apply_fourier_mask_2d(
                p, band_pass_mask(H, W, self.f1, self.f2)))
            f = (f - f.mean()) / max(f.std(), 1e-12)
            out[i] = f
        return out


PROGRAM = None
