"""xmipp_angular_project_library — generate a projection gallery over an even
angular sampling of the asymmetric unit.

Contract: reference angular_project_library (angular_project_library.h:47):
writes <root>.stk (gallery) + <root>.doc (angles metadata) + sampling file.
"""
from __future__ import annotations

import os

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.core.sampling import Sampling
from xmipp3_tpu.ops.project import FourierProjector


class ProgAngularProjectLibrary(XmippProgram):
    name = "xmipp_angular_project_library"

    def defineParams(self):
        self.addUsageLine("Create a gallery of projections from a volume over "
                          "an even sampling of the projection sphere.")
        self.addParamsLine("   -i <input_volume>     : Volume to project")
        self.addParamsLine("   -o <root_file_name>   : Output rootname (.stk/.doc)")
        self.addParamsLine("  [--sampling_rate <Ts=5>] : Angular distance between neighbors (deg)")
        self.addParamsLine("  [--sym <symmetry=c1>] : Symmetry group")
        self.addParamsLine("  [--min_tilt_angle <t=0>]  : Minimum tilt")
        self.addParamsLine("  [--max_tilt_angle <t=180>] : Maximum tilt")
        self.addParamsLine("  [--method <m=fourier>] : fourier | real_space")
        self.addParamsLine("  [--batch <b=256>]      : Projections per device batch")

    def readParams(self):
        self.fn_vol = self.getParam("-i")
        self.fn_root = self.getParam("-o")
        if self.fn_root.endswith(".stk"):
            self.fn_root = self.fn_root[:-4]
        self.rate = self.getDoubleParam("--sampling_rate")
        self.sym = self.getParam("--sym")
        self.tilt0 = self.getDoubleParam("--min_tilt_angle")
        self.tiltF = self.getDoubleParam("--max_tilt_angle")
        self.batch = self.getIntParam("--batch")

    def run(self):
        vol = np.squeeze(Image(self.fn_vol).data).astype(np.float32)
        sampling = Sampling(self.rate, self.sym, (self.tilt0, self.tiltF))
        angles = sampling.angles
        if self.verbose:
            print(f"Projecting {len(angles)} directions (sym {self.sym}, "
                  f"{self.rate} deg)")
        projector = FourierProjector(vol, pad_factor=2.0)
        out = []
        for s in range(0, len(angles), self.batch):
            a = angles[s:s + self.batch]
            out.append(np.asarray(projector.project_euler(
                a[:, 0].astype(np.float32), a[:, 1].astype(np.float32),
                np.zeros(len(a), np.float32))))
        gallery = np.concatenate(out)
        fn_stk = self.fn_root + ".stk"
        save_image(fn_stk, gallery)
        md = MetaData.fromRows([
            {"image": f"{i + 1:06d}@{fn_stk}", "angleRot": float(a[0]),
             "angleTilt": float(a[1]), "anglePsi": 0.0, "itemId": i + 1}
            for i, a in enumerate(angles)])
        md.write(self.fn_root + ".doc")
        # sampling summary (reference writes a sampling file too)
        md_s = MetaData.fromRows([{"sampling_rate": self.rate,
                                   "symmetry": self.sym,
                                   "pointsAsymmetricUnit": len(angles)}])
        md_s.row_format = True
        md_s.write(self.fn_root + "_sampling.xmd", block="extra")
        if self.verbose:
            print(f"Gallery: {fn_stk} ({len(angles)} projections)")


PROGRAM = ProgAngularProjectLibrary
