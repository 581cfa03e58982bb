"""Metadata utility programs: split, import, histogram.

Contracts: reference metadata_split, metadata_import, metadata_histogram
(SURVEY.md Appendix A metadata_*).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram


class ProgMetadataSplit(XmippProgram):
    name = "xmipp_metadata_split"

    def defineParams(self):
        self.addUsageLine("Split a metadata into several parts.")
        self.addParamsLine("   -i <metadata>  : Input metadata")
        self.addParamsLine("  [-n <parts=2>]  : Number of output parts")
        self.addParamsLine("  [--oroot <root=\"\">] : Output rootname (default input name)")
        self.addParamsLine("  [--dont_randomize] : Keep input order")
        self.addParamsLine("  [--seed <s=0>]  : Random seed")

    def run(self):
        import os
        fn = self.getParam("-i")
        md = MetaData(fn)
        n = self.getIntParam("-n")
        root = self.getParam("--oroot") or os.path.splitext(fn)[0]
        ext = os.path.splitext(fn)[1] or ".xmd"
        idx = np.arange(len(md))
        if not self.checkParam("--dont_randomize"):
            rng = np.random.default_rng(self.getIntParam("--seed"))
            idx = rng.permutation(idx)
        parts = np.array_split(idx, n)
        for k, p in enumerate(parts):
            sub = MetaData(md.df.iloc[np.sort(p)].reset_index(drop=True))
            sub.write(f"{root}{k + 1:06d}{ext}")


class ProgMetadataImport(XmippProgram):
    name = "xmipp_metadata_import"

    def defineParams(self):
        self.addUsageLine("Import a plain text (columns) file as metadata.")
        self.addParamsLine("   -i <text_file>  : Input text file")
        self.addParamsLine("   -o <metadata>   : Output metadata")
        self.addParamsLine("   --columns <...> : Label names of the columns")

    def run(self):
        labels = self.getListParam("--columns")
        rows = []
        with open(self.getParam("-i")) as f:
            for line in f:
                line = line.strip()
                if not line or line.startswith("#") or line.startswith(";"):
                    continue
                toks = line.split()
                row = {}
                for lab, tok in zip(labels, toks):
                    try:
                        row[lab] = int(tok)
                    except ValueError:
                        try:
                            row[lab] = float(tok)
                        except ValueError:
                            row[lab] = tok
                rows.append(row)
        MetaData.fromRows(rows).write(self.getParam("-o"))


class ProgMetadataHistogram(XmippProgram):
    name = "xmipp_metadata_histogram"

    def defineParams(self):
        self.addUsageLine("Histogram of a metadata column.")
        self.addParamsLine("   -i <metadata>  : Input metadata")
        self.addParamsLine("   --col <label>  : Column to histogram")
        self.addParamsLine("  [-o <out=\"\">]   : Output metadata (stdout if absent)")
        self.addParamsLine("  [--steps <n=100>] : Number of bins")
        self.addParamsLine("  [--range <min> <max>] : Histogram range")

    def run(self):
        md = MetaData(self.getParam("-i"))
        vals = md.getColumn(self.getParam("--col")).astype(float)
        n = self.getIntParam("--steps")
        if self.checkParam("--range"):
            rng = (self.getDoubleParam("--range", 0),
                   self.getDoubleParam("--range", 1))
        else:
            rng = (float(vals.min()), float(vals.max()))
        counts, edges = np.histogram(vals, bins=n, range=rng)
        centers = 0.5 * (edges[:-1] + edges[1:])
        out = MetaData.fromRows([{"x": float(c), "count": int(v)}
                                 for c, v in zip(centers, counts)])
        if self.checkParam("-o") and self.getParam("-o"):
            out.write(self.getParam("-o"))
        else:
            for c, v in zip(centers, counts):
                print(f"{c:14.6f} {v}")


class ProgAngularDistance(XmippProgram):
    name = "xmipp_angular_distance"

    def defineParams(self):
        self.addUsageLine("Angular distance between two angle assignments "
                          "(symmetry aware).")
        self.addParamsLine("   --ang1 <metadata> : First angle set")
        self.addParamsLine("   --ang2 <metadata> : Second angle set")
        self.addParamsLine("  [--oroot <root=\"\">] : Output rootname")
        self.addParamsLine("  [--sym <s=c1>]    : Symmetry group")
        self.addParamsLine("  [--check_mirrors] : Consider antipodal directions equal")

    def run(self):
        from xmipp3_tpu.core.sampling import directions_from_angles
        from xmipp3_tpu.core.sym import SymList
        md1 = MetaData(self.getParam("--ang1"))
        md2 = MetaData(self.getParam("--ang2"))
        get = lambda md: np.stack(
            [md.getColumn("angleRot").astype(float),
             md.getColumn("angleTilt").astype(float)], axis=1)
        a1, a2 = get(md1), get(md2)
        d1 = directions_from_angles(a1)
        d2 = directions_from_angles(a2)
        sym = SymList(self.getParam("--sym"))
        mats = sym.sym_matrices().astype(np.float64)
        orbit = np.einsum("sij,nj->nsi", mats, d2)
        cos = np.einsum("ni,nsi->ns", d1, orbit).max(axis=1)
        if self.checkParam("--check_mirrors"):
            cos_m = np.einsum("ni,nsi->ns", d1, -orbit).max(axis=1)
            cos = np.maximum(cos, cos_m)
        ang = np.degrees(np.arccos(np.clip(cos, -1, 1)))
        self.distances = ang
        if self.verbose:
            print(f"Mean angular distance: {ang.mean():.3f} deg "
                  f"(median {np.median(ang):.3f})")
        root = self.getParam("--oroot")
        if root:
            rows = []
            for i in md1:
                r = md1.getRow(i)
                r["angleDiff"] = float(ang[i])
                rows.append(r)
            MetaData.fromRows(rows).write(root + ".xmd")


class ProgAngularRotate(XmippProgram):
    name = "xmipp_angular_rotate"

    def defineParams(self):
        self.addUsageLine("Apply a 3D rotation to a set of Euler angles.")
        self.addParamsLine("   -i <metadata>  : Input angles")
        self.addParamsLine("   -o <metadata>  : Output angles")
        self.addParamsLine("   --rotate <rot> <tilt> <psi> : Rotation to compose")

    def run(self):
        from xmipp3_tpu.core.geometry import euler_matrix, matrix_to_euler
        md = MetaData(self.getParam("-i"))
        R = np.asarray(euler_matrix(self.getDoubleParam("--rotate", 0),
                                    self.getDoubleParam("--rotate", 1),
                                    self.getDoubleParam("--rotate", 2)),
                       np.float64)
        rows = []
        for i in md:
            r = md.getRow(i)
            A = np.asarray(euler_matrix(float(r.get("angleRot", 0)),
                                        float(r.get("angleTilt", 0)),
                                        float(r.get("anglePsi", 0))),
                           np.float64)
            rot, tilt, psi = matrix_to_euler(A @ R)
            r["angleRot"], r["angleTilt"], r["anglePsi"] = rot, tilt, psi
            rows.append(r)
        MetaData.fromRows(rows).write(self.getParam("-o"))


PROGRAM = None


class ProgMetadataConvertEMX(XmippProgram):
    name = "xmipp_metadata_convert_emx"

    def defineParams(self):
        self.addUsageLine("Convert between EMX exchange files and .xmd "
                          "metadata (direction by extension).")
        self.addParamsLine("   -i <input>  : .emx or .xmd file")
        self.addParamsLine("   -o <output> : .xmd or .emx file")
        self.addParamsLine("  [--entity <e=particle>] : EMX entity on export/import")

    def run(self):
        from xmipp3_tpu.core.emx import read_emx, write_emx
        fn_in = self.getParam("-i")
        fn_out = self.getParam("-o")
        entity = self.getParam("--entity")
        if fn_in.endswith(".emx"):
            tables = read_emx(fn_in)
            md = tables.get(entity) or next(iter(tables.values()))
            md.write(fn_out)
        else:
            write_emx(fn_out, MetaData(fn_in), entity)
