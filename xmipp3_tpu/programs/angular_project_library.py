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
        self.addParamsLine("  [--compute_neighbors]  : Write per-gallery-direction neighbor lists (consumed by projection matching; reference Sampling::computeNeighbors, data/sampling.h:203)")
        self.addParamsLine("  [--near_exp_data <md=\"\">] : Experimental metadata with prior angles; neighbors are computed per experimental image")
        self.addParamsLine("  [--angular_distance <a=-1>] : Neighborhood radius (deg; required with --compute_neighbors)")
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
        if self.checkParam("--compute_neighbors"):
            self._write_neighbors(angles)
        if self.verbose:
            print(f"Gallery: {fn_stk} ({len(angles)} projections)")


    def _write_neighbors(self, angles):
        """Neighbor lists (reference mysampling.computeNeighbors +
        my_neighbors output): one row per query direction with the
        space-separated gallery indices (1-based) within
        --angular_distance. Queries = --near_exp_data rows when given
        (per-experimental-image neighborhoods), else the gallery itself."""
        from xmipp3_tpu.core.sampling import compute_neighbors
        from xmipp3_tpu.core.sym import SymList
        ad = self.getDoubleParam("--angular_distance")
        if ad <= 0:
            raise ValueError("--compute_neighbors requires "
                             "--angular_distance > 0")
        fn_exp = self.getParam("--near_exp_data")             if self.checkParam("--near_exp_data") else ""
        if fn_exp:
            md_e = MetaData(fn_exp)
            q = np.stack([[float(r.get("angleRot", 0.0)),
                           float(r.get("angleTilt", 0.0))]
                          for r in md_e.iterRows()])
            names = [str(r.get("image", i + 1))
                     for i, r in enumerate(md_e.iterRows())]
        else:
            q = angles[:, :2]
            names = [str(i + 1) for i in range(len(angles))]
        nb = compute_neighbors(q, angles[:, :2], ad, SymList(self.sym))
        rows = []
        for i, lst in enumerate(nb):
            rows.append({"image": names[i],
                         "neighbors": " ".join(str(int(j) + 1)
                                               for j in lst),
                         "neighborCount": int(len(lst))})
        MetaData.fromRows(rows).write(self.fn_root + "_neighbors.xmd")
        if self.verbose:
            counts = [len(l) for l in nb]
            print(f"neighbors: {len(rows)} rows, median "
                  f"{int(np.median(counts))} per direction "
                  f"(radius {ad} deg)")


PROGRAM = ProgAngularProjectLibrary
