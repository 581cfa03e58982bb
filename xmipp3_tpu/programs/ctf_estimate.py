"""CTF estimation programs.

xmipp_ctf_estimate_from_micrograph — tile micrograph, periodogram PSD,
  fit CTF model (reference ctf_estimate_from_micrograph.cpp:289-460).
xmipp_ctf_estimate_from_psd — fit on a precomputed PSD
  (reference ctf_estimate_from_psd.cpp).
"""
from __future__ import annotations

import os

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.models.ctf_estimation import CTFEstimator
from xmipp3_tpu.ops.psd import estimate_psd, psd_half_to_full_centered


class _CTFFitMixin:
    def _define_fit_params(self):
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size (Å)")
        self.addParamsLine("     alias -s;")
        self.addParamsLine("  [--kV <v=300>]       : Acceleration voltage")
        self.addParamsLine("  [--Cs <cs=2.7>]      : Spherical aberration (mm)")
        self.addParamsLine("  [--Q0 <q=0.07>]      : Amplitude contrast")
        self.addParamsLine("  [--min_freq <f=0.03>] : Minimum digital freq for fit")
        self.addParamsLine("  [--max_freq <f=0.35>] : Maximum digital freq for fit")
        self.addParamsLine("  [--defocus_range <min=2000> <max=40000>] : Search range (Å)")

    def _read_fit_params(self):
        self.Ts = self.getDoubleParam("--sampling_rate")
        self.kV = self.getDoubleParam("--kV")
        self.Cs = self.getDoubleParam("--Cs")
        self.Q0 = self.getDoubleParam("--Q0")
        self.min_freq = self.getDoubleParam("--min_freq")
        self.max_freq = self.getDoubleParam("--max_freq")
        self.def_range = (self.getDoubleParam("--defocus_range", 0),
                          self.getDoubleParam("--defocus_range", 1))

    def _fit(self, psd_half):
        est = CTFEstimator(psd_half, self.Ts, self.kV, self.Cs, self.Q0,
                           min_freq=self.min_freq, max_freq=self.max_freq,
                           defocus_range=self.def_range)
        ctf = est.estimate()
        self.fitness = est.final_fitness
        return ctf


class ProgCTFEstimateFromMicrograph(XmippProgram, _CTFFitMixin):
    name = "xmipp_ctf_estimate_from_micrograph"

    def defineParams(self):
        self.addUsageLine("Estimate the CTF from a micrograph: periodogram "
                          "PSD + model fit.")
        self.addParamsLine("   --micrograph <file> : Input micrograph")
        self.addParamsLine("     alias -i;")
        self.addParamsLine("  [--oroot <root=\"\">]  : Output rootname (default: micrograph name)")
        self.addParamsLine("  [--pieceDim <d=512>] : Tile size for periodogram")
        self.addParamsLine("  [--overlap <o=0.5>]  : Tile overlap fraction")
        self.addParamsLine("  [--dont_estimate_ctf] : Only compute the PSD")
        self._define_fit_params()

    def readParams(self):
        self.fn_mic = self.getParam("--micrograph")
        self.oroot = self.getParam("--oroot") if self.checkParam("--oroot") \
            else os.path.splitext(self.fn_mic)[0]
        self.piece = self.getIntParam("--pieceDim")
        self.overlap = self.getDoubleParam("--overlap")
        self.only_psd = self.checkParam("--dont_estimate_ctf")
        self._read_fit_params()

    def run(self):
        mic = np.squeeze(Image(self.fn_mic).data).astype(np.float32)
        psd = np.asarray(estimate_psd(mic, self.piece, self.overlap))
        n = psd.shape[0]
        save_image(self.oroot + ".psd",
                   psd_half_to_full_centered(psd, n))
        if self.only_psd:
            return
        ctf = self._fit(psd)
        ctf.write(self.oroot + ".ctfparam")
        if self.verbose:
            print(f"DefocusU={ctf.defocusU:.1f} A  DefocusV="
                  f"{ctf.defocusV:.1f} A  angle={ctf.azimuthal_angle:.1f} "
                  f"deg  fitness={-self.fitness:.4f}")


class ProgCTFEstimateFromPSD(XmippProgram, _CTFFitMixin):
    name = "xmipp_ctf_estimate_from_psd"

    def defineParams(self):
        self.addUsageLine("Adjust a parametric CTF model to a PSD.")
        self.addParamsLine("   --psd <file>  : PSD image (centered full plane)")
        self.addParamsLine("     alias -i;")
        self.addParamsLine("  [-o <ctfparam=\"\">] : Output .ctfparam")
        self._define_fit_params()

    def readParams(self):
        self.fn_psd = self.getParam("--psd")
        self.fn_out = self.getParam("-o") if self.checkParam("-o") else \
            os.path.splitext(self.fn_psd)[0] + ".ctfparam"
        self._read_fit_params()

    def run(self):
        full = np.squeeze(Image(self.fn_psd).data).astype(np.float32)
        n = full.shape[0]
        # centered full plane -> rfft half layout
        unshift = np.fft.ifftshift(full)
        psd_half = np.ascontiguousarray(unshift[:, : n // 2 + 1])
        ctf = self._fit(psd_half)
        ctf.write(self.fn_out)
        if self.verbose:
            print(f"DefocusU={ctf.defocusU:.1f} A  DefocusV="
                  f"{ctf.defocusV:.1f} A  angle={ctf.azimuthal_angle:.1f} deg")


PROGRAM = None  # registered individually
