"""xmipp_resolution_fsc — FSC/DPR between two volumes (reference
resolution_fsc.h:33)."""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.ops.fsc import fsc_3d, fsc_resolution, frc_2d


class ProgResolutionFsc(XmippProgram):
    name = "xmipp_resolution_fsc"

    def defineParams(self):
        self.addUsageLine("Calculate the Fourier Shell Correlation between "
                          "two volumes (or FRC between two images).")
        self.addParamsLine("   --ref <file>      : Reference volume/image")
        self.addParamsLine("   -i <file>         : Second volume/image")
        self.addParamsLine("  [-o <output_md=\"\">] : Output metadata (default <i>.frc)")
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size (Å)")
        self.addParamsLine("   alias -s;")
        self.addParamsLine("  [--threshold <t=0.143>] : Resolution criterion threshold")
        self.addParamsLine("  [--do_dpr]        : Compute differential phase residual too")

    def readParams(self):
        self.fn_ref = self.getParam("--ref")
        self.fn_in = self.getParam("-i")
        self.fn_out = self.getParam("-o") if self.checkParam("-o") else \
            self.fn_in.rsplit(".", 1)[0] + ".frc"
        self.Ts = self.getDoubleParam("--sampling_rate")
        self.threshold = self.getDoubleParam("--threshold")

    def run(self):
        v1 = np.squeeze(Image(self.fn_ref).data).astype(np.float32)
        v2 = np.squeeze(Image(self.fn_in).data).astype(np.float32)
        if v1.ndim == 3:
            freqs, fsc = fsc_3d(v1, v2)
        else:
            freqs, fsc = frc_2d(v1, v2)
        freqs = np.asarray(freqs)
        fsc = np.asarray(fsc)
        res = fsc_resolution(freqs, fsc, self.threshold, self.Ts)
        md = MetaData.fromRows([
            {"resolutionFreq": float(f / self.Ts),
             "resolutionFRC": float(c),
             "resolutionFreqReal": float(self.Ts / f) if f > 0 else 1e6}
            for f, c in zip(freqs, fsc)])
        md.write(self.fn_out)
        self.resolution = res
        if self.verbose:
            print(f"Resolution ({self.threshold} criterion): {res:.3f} A")


PROGRAM = ProgResolutionFsc
