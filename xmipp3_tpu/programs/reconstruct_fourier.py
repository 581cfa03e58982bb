"""xmipp_reconstruct_fourier — direct Fourier 3-D reconstruction.

Contract: reference reconstruct_fourier CLI (reconstruction/
reconstruct_fourier.cpp:36-62 defineParams; FSC-halves mode :1002-1047).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.ops.reconstruct import FourierReconstructor


class ProgRecFourier(XmippProgram):
    name = "xmipp_reconstruct_fourier"

    def defineParams(self):
        self.addUsageLine("Generate 3D reconstructions from projections using "
                          "direct Fourier interpolation with arbitrary geometry.")
        self.addParamsLine("   -i <md_file>                : Metadata file with input projections")
        self.addParamsLine("  [-o <volume_file=\"rec_fourier.vol\">]  : Filename for output volume")
        self.addParamsLine("  [--iter <iterations=1>]      : Number of iterations for weight correction")
        self.addParamsLine("  [--sym <symfile=c1>]         : Enforce symmetry in projections")
        self.addParamsLine("  [--padding <proj=2.0> <vol=2.0>]  : Padding used for projections and volume")
        self.addParamsLine("  [--prepare_fsc <fscfile>]    : Filename root for FSC files")
        self.addParamsLine("  [--max_resolution <p=0.5>]   : Max resolution (Nyquist=0.5)")
        self.addParamsLine("  [--weight]                   : Use weights stored in the image metadata")
        self.addParamsLine("  [--batch <b=256>]            : Images per device batch")
        self.addExampleLine("   xmipp_reconstruct_fourier -i reconstruction.sel --sym i3 --weight")

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.fn_out = self.getParam("-o")
        self.sym = self.getParam("--sym")
        self.pad = self.getDoubleParam("--padding", 1)
        self.max_res = self.getDoubleParam("--max_resolution")
        self.use_weights = self.checkParam("--weight")
        self.batch = self.getIntParam("--batch")
        self.fn_fsc = self.getParam("--prepare_fsc") if \
            self.checkParam("--prepare_fsc") else ""

    def show(self):
        if self.verbose:
            print(f"Input metadata    : {self.fn_in}")
            print(f"Output volume     : {self.fn_out}")
            print(f"Symmetry          : {self.sym}")
            print(f"Padding factor    : {self.pad}")
            print(f"Max resolution    : {self.max_res}")

    def _reconstruct_subset(self, md: MetaData, rows_idx, N: int):
        rec = FourierReconstructor(N, self.pad, self.sym, self.max_res)
        rows = [md.getRow(i) for i in rows_idx]
        for s in range(0, len(rows), self.batch):
            chunk = rows[s:s + self.batch]
            imgs = np.stack([np.squeeze(Image(r["image"]).data)
                             for r in chunk]).astype(np.float32)
            get = lambda k, d=0.0: np.array(
                [float(r.get(k, d)) for r in chunk], np.float32)
            rec.add_batch(imgs, get("angleRot"), get("angleTilt"),
                          get("anglePsi"), get("shiftX"), get("shiftY"),
                          get("weight", 1.0) if self.use_weights else None,
                          flip=get("flip", 0.0).astype(bool))
            if self.verbose:
                print(f"  processed {min(s + self.batch, len(rows))}/{len(rows)}")
        return np.asarray(rec.finish())

    def run(self):
        md = MetaData(self.fn_in)
        md.removeDisabled()
        first = Image()
        first.read(md.getRow(md.firstObject())["image"], header_only=True)
        N = first.header.shape[-1]
        all_idx = list(md)
        if self.fn_fsc:
            # split halves (even/odd), write *_1/2 recons + merged
            h1 = self._reconstruct_subset(md, all_idx[0::2], N)
            h2 = self._reconstruct_subset(md, all_idx[1::2], N)
            root = self.fn_fsc
            save_image(root + "_1_recons.vol", h1)
            save_image(root + "_2_recons.vol", h2)
            vol = 0.5 * (h1 + h2)
        else:
            vol = self._reconstruct_subset(md, all_idx, N)
        save_image(self.fn_out, vol)
        if self.verbose:
            print(f"Reconstruction written to {self.fn_out}")


PROGRAM = ProgRecFourier
