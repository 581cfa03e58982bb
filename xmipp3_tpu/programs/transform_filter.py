"""xmipp_transform_filter — apply Fourier/real-space filters to images.

Contract: reference program_filter.{h,cpp} + data/fourier_filter.cpp
defineParams (the `--fourier <filter_type>` where-choice grammar).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.metadata_program import XmippMetadataProgram
from xmipp3_tpu.ops.fourier_filter import FourierFilter


class ProgTransformFilter(XmippMetadataProgram):
    name = "xmipp_transform_filter"

    def defineProcessParams(self):
        self.addUsageLine("Filter images or volumes in Fourier or real space.")
        self.addParamsLine("== Fourier ==")
        self.addParamsLine("  [--fourier <filter_type>]    : Filter in Fourier space")
        self.addParamsLine("         where <filter_type>")
        self.addParamsLine("            low_pass  <w1> <raisedw=0.02>      : Cutoff freq (<1/2 or A)")
        self.addParamsLine("            high_pass <w1> <raisedw=0.02>      : Cutoff freq (<1/2 or A)")
        self.addParamsLine("            band_pass <w1> <w2> <raisedw=0.02> : Cutoff freq (<1/2 or A)")
        self.addParamsLine("            stop_band <w1> <w2> <raisedw=0.02> : Cutoff freq (<1/2 or A)")
        self.addParamsLine("            stop_lowbandx <w1> <raisedw=0.02>  : Cutoff freq (<1/2 or A)")
        self.addParamsLine("            stop_lowbandy <w1> <raisedw=0.02>  : Cutoff freq (<1/2 or A)")
        self.addParamsLine("            real_gaussian <w1>                 : Gaussian in real space, sigma=w1")
        self.addParamsLine("            gaussian <w1>                      : Gaussian in Fourier space, sigma=w1")
        self.addParamsLine("            sparsify <p=0.975>                 : Delete smallest Fourier coefficients")
        self.addParamsLine("            ctf <ctfile>                       : Provide a .ctfparam file")
        self.addParamsLine("            ctfpos <ctfile>                    : .ctfparam, phase corrected before applying")
        self.addParamsLine("            ctfinv <ctfile> <minCTF=0.05>      : Apply inverse of the CTF")
        self.addParamsLine("            ctfposinv <ctfile> <minCTF=0.05>   : Apply inverse of abs(CTF)")
        self.addParamsLine("            ctfdef <kV> <Cs> <Q0> <defocus>    : CTF from parameters")
        self.addParamsLine("            ctfdefastig <kV> <Cs> <Q0> <defocusU> <defocusV> <defocusAngle> : Astigmatic CTF")
        self.addParamsLine("            bfactor <B>                        : Exponential filter")
        self.addParamsLine("               requires --sampling;")
        self.addParamsLine("            fsc <metadata>                     : Filter with FSC profile")
        self.addParamsLine("               requires --sampling;")
        self.addParamsLine("            binary_file <file>                 : Binary file with the filter")
        self.addParamsLine("         alias -f;")
        self.addParamsLine("  [--sampling <sampling_rate>]   : Sampling rate (Å/pixel); pass frequencies in Å")
        self.addParamsLine("         alias -s;")
        self.addParamsLine("== Wavelets ==")
        self.addParamsLine("  [--wavelet <type=DAUB4> <mode=remove_scale>] : Wavelet denoising (reference program_filter wavelet branch): DAUB4 (db4, soft-threshold) or HAAR")
        self.addParamsLine("  [--waveletThreshold <s=3>] : Soft threshold (noise sigmas)")
        self.addParamsLine("== Real space ==")
        self.addParamsLine("  [--tv <weight=0.1> <iters=50>] : Total-variation denoising")

    def readProcessParams(self):
        self.sampling = (self.getDoubleParam("--sampling")
                         if self.checkParam("--sampling") else None)
        self.filter = None
        self.wavelet = None
        self.tv = None
        if self.checkParam("--wavelet"):
            self.wavelet = (self.getParam("--wavelet"),
                            self.getDoubleParam("--waveletThreshold"))
            return
        if self.checkParam("--tv"):
            self.tv = (self.getDoubleParam("--tv", 0),
                       self.getIntParam("--tv", 1))
            return
        toks = self.getListParam("--fourier")
        if not toks:
            from xmipp3_tpu.core.errors import ErrCode, XmippError
            raise XmippError(ErrCode.ARG_MISSING, "--fourier")
        self.filter = FourierFilter(toks[0], toks[1:], sampling=self.sampling)

    def processBatch(self, imgs, rows):
        if self.wavelet is not None:
            kind, thr = self.wavelet
            if kind.upper().startswith("DAUB"):
                from xmipp3_tpu.ops.denoise import db4_denoise_2d
                return np.asarray(db4_denoise_2d(imgs, thr))
            from xmipp3_tpu.ops.denoise import wavelet_denoise_2d
            return np.asarray(wavelet_denoise_2d(imgs, thr))
        if self.tv is not None:
            from xmipp3_tpu.ops.denoise import tv_denoise_2d
            return np.asarray(tv_denoise_2d(imgs, self.tv[0],
                                            int(self.tv[1])))
        return np.asarray(self.filter.apply(imgs))


PROGRAM = ProgTransformFilter
