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
                ctf = _row_ctf(r)
                crits["ctfCritFirstZero"] = ctf.first_zero_freq()
                astig = abs(ctf.defocusU - ctf.defocusV)
                crits["ctfCritFirstZeroRatio"] = (
                    max(ctf.defocusU, ctf.defocusV) /
                    max(min(ctf.defocusU, ctf.defocusV), 1.0))
                crits["ctfCritDamping"] = float(np.asarray(
                    ctf.damping_2d(64, 64)).mean())
            except Exception:
                pass
            if "psd" in r and r["psd"]:
                try:
                    psd = np.squeeze(Image(str(r["psd"])).data)
                    crits["ctfCritPsdStdQ"] = float(psd.std() /
                                                    max(psd.mean(), 1e-12))
                    # radial integral criterion
                    from xmipp3_tpu.ops.psd import radial_profile
                    n = psd.shape[0]
                    half = np.ascontiguousarray(
                        np.fft.ifftshift(psd)[:, : n // 2 + 1])
                    _, prof = radial_profile(half)
                    crits["ctfCritPsdRadialIntegral"] = float(prof.sum())
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
