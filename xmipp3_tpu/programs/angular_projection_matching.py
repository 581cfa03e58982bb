"""xmipp_angular_projection_matching — discrete 5-D (rot/tilt/psi/x/y)
projection matching against a gallery.

Contract: reference angular_projection_matching.{h,cpp} (call stack SURVEY.md
§3.3). TPU redesign: the pthread-per-image loop with an LRU reference cache
becomes one batched multireference alignment — gallery ring-FFTs are computed
once and live in HBM; each particle batch is matched against ALL references
by batched polar correlation + shift refinement (no cache, no worker state).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.ops.match import match_to_gallery


class ProgAngularProjectionMatching(XmippProgram):
    name = "xmipp_angular_projection_matching"

    def defineParams(self):
        self.addUsageLine("Assign angles by matching experimental images "
                          "against a projection gallery.")
        self.addParamsLine("   -i <md_file>  : Metadata with experimental images")
        self.addParamsLine("   -o <md_file>  : Output metadata with assignments")
        self.addParamsLine("   --ref <gallery_root> : Gallery rootname or .doc from angular_project_library")
        self.addParamsLine("  [--max_shift <s=-1>] : Maximum translation (pixels)")
        self.addParamsLine("  [--search5d_shift <s=0>] : 5D shift search range (compat; merged with max_shift)")
        self.addParamsLine("  [--Ri <r=1>]   : Inner polar radius")
        self.addParamsLine("  [--Ro <r=-1>]  : Outer polar radius (-1 = dim/2-2)")
        self.addParamsLine("  [--append]     : Append assignments to output metadata")
        self.addParamsLine("  [--batch <b=512>] : Particles per device batch")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.fn_out = self.getParam("-o")
        self.fn_ref = self.getParam("--ref")
        self.max_shift = self.getIntParam("--max_shift")
        self.Ri = self.getIntParam("--Ri")
        self.Ro = self.getIntParam("--Ro")
        self.batch = self.getIntParam("--batch")
        from xmipp3_tpu.parallel.cli import read_mesh_params
        read_mesh_params(self)

    def run(self):
        root = self.fn_ref
        for suffix in (".doc", ".stk"):
            if root.endswith(suffix):
                root = root[: -len(suffix)]
        md_ref = MetaData(root + ".doc")
        refs = np.stack([np.squeeze(Image(r["image"]).data)
                         for r in md_ref.iterRows()]).astype(np.float32)
        ref_rot = md_ref.getColumn("angleRot").astype(np.float32)
        ref_tilt = md_ref.getColumn("angleTilt").astype(np.float32)

        md_in = MetaData(self.fn_in)
        md_in.removeDisabled()
        rows = list(md_in.iterRows())
        H = refs.shape[-1]
        max_shift = self.max_shift if self.max_shift > 0 else H // 4
        Ro = self.Ro if self.Ro > 0 else H // 2 - 2

        from xmipp3_tpu.core.metadata_program import (BatchPrefetcher,
                                                      load_image_rows)
        from xmipp3_tpu.core.timing import timed_phase
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             resolve_mesh)
        maybe_init_distributed(self)
        mesh, mesh_mode = resolve_mesh(self.mesh_mode)
        if mesh is not None and self.verbose:
            # parallel_match_* pad the particle axis to a mesh multiple
            print(f"mesh: {mesh_mode} over {len(mesh.devices.ravel())} "
                  f"devices")
        out_rows = []
        # double-buffered loader: the next batch reads while this one matches
        for s, chunk, imgs in BatchPrefetcher(rows, self.batch,
                                              loader=load_image_rows):
            with timed_phase("match_to_gallery"):
                if mesh is None:
                    res = match_to_gallery(refs, imgs, max_shift=max_shift,
                                           radius_min=max(self.Ri, 2),
                                           radius_max=Ro)
                elif mesh_mode == "tp":
                    from xmipp3_tpu.parallel.match import parallel_match_tp
                    res = parallel_match_tp(mesh, refs, imgs,
                                            max_shift=max_shift,
                                            radius_min=max(self.Ri, 2),
                                            radius_max=Ro)
                else:
                    from xmipp3_tpu.parallel.match import parallel_match_full
                    res = parallel_match_full(mesh, refs, imgs,
                                              max_shift=max_shift,
                                              radius_min=max(self.Ri, 2),
                                              radius_max=Ro)
                res = {k: np.asarray(v) for k, v in res.items()}
            ref_idx = np.asarray(res["ref_idx"])
            psi = np.asarray(res["psi"])
            sx = np.asarray(res["sx"])
            sy = np.asarray(res["sy"])
            corr = np.asarray(res["corr"])
            flip = np.asarray(res["flip"])
            for i, r in enumerate(chunk):
                d = dict(r)
                k = int(ref_idx[i])
                d.update({
                    "angleRot": float(ref_rot[k]),
                    "angleTilt": float(ref_tilt[k]),
                    "anglePsi": float(psi[i]),
                    "shiftX": float(sx[i]),
                    "shiftY": float(sy[i]),
                    "ref": k + 1,
                    "flip": int(flip[i]),
                    "maxCC": float(corr[i]),
                })
                out_rows.append(d)
            if self.verbose:
                print(f"  matched {min(s + self.batch, len(rows))}/{len(rows)}")
        md_out = MetaData.fromRows(out_rows)
        md_out.write(self.fn_out, append=self.checkParam("--append"))


PROGRAM = ProgAngularProjectionMatching
