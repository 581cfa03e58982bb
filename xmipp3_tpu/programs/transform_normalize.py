"""xmipp_transform_normalize — image normalization (reference data/normalize.h:201)."""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.metadata_program import XmippMetadataProgram
from xmipp3_tpu.ops.normalize import normalize


class ProgNormalize(XmippMetadataProgram):
    name = "xmipp_transform_normalize"

    def defineProcessParams(self):
        self.addUsageLine("Normalize images: zero background mean, unit noise variance.")
        self.addParamsLine("[--method <mth=NewXmipp>]  : Normalization method")
        self.addParamsLine("    where <mth>")
        self.addParamsLine("       OldXmipp   : (I-m)/s of whole image")
        self.addParamsLine("       NewXmipp   : (I-bg_plane)/bg_std using background ring")
        self.addParamsLine("       Ramp       : remove background ramp, divide by bg std")
        self.addParamsLine("       Robust     : (I-median)/MAD")
        self.addParamsLine("       Michael    : (I-bg_mean)/bg_mean")
        self.addParamsLine("[--background <mode>] : Background region")
        self.addParamsLine("    where <mode>")
        self.addParamsLine("       circle <r> : outside radius r")
        self.addParamsLine("       frame <w>  : frame of width w")
        self.addParamsLine("[--invert]  : Invert contrast")

    def readProcessParams(self):
        self.method = self.getParam("--method") if self.checkParam("--method") \
            else "NewXmipp"
        self.bg_radius = None
        if self.checkParam("--background"):
            if self.getParam("--background") == "circle":
                self.bg_radius = self.getDoubleParam("--background", 1)
        self.invert = self.checkParam("--invert")

    def processBatch(self, imgs, rows):
        out = np.asarray(normalize(imgs, self.method, self.bg_radius))
        return -out if self.invert else out


PROGRAM = ProgNormalize
