"""Classification programs: classify_CL2D, ml_align2d, kerdensom.

Contracts: reference mpi_classify_CL2D (SURVEY.md §2.4c), ml_align2d
(ml2d.h:59), classify_kerdensom (classification/kerdensom).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import is_metadata_file
from xmipp3_tpu.core.program import XmippProgram


def _load_stack_md(fn):
    if is_metadata_file(fn):
        md = MetaData(fn)
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = np.stack([np.squeeze(Image(r["image"]).data)
                         for r in rows]).astype(np.float32)
        return imgs, rows
    imgs = Image.read_stack(fn)
    return imgs, [{"image": f"{i + 1:06d}@{fn}", "itemId": i + 1}
                  for i in range(len(imgs))]


class ProgClassifyCL2D(XmippProgram):
    name = "xmipp_classify_CL2D"

    def defineParams(self):
        self.addUsageLine("Classify a set of images into a given number of "
                          "2D classes (CL2D).")
        self.addParamsLine("   -i <md_or_stack>  : Input images")
        self.addParamsLine("  [--odir <dir=.>]   : Output directory")
        self.addParamsLine("  [--oroot <root=class>] : Output rootname")
        self.addParamsLine("  [--nref <n=4>]     : Number of classes")
        self.addParamsLine("  [--iter <n=10>]    : Number of iterations")
        self.addParamsLine("  [--maxShift <s=8>] : Maximum shift (px)")
        self.addParamsLine("  [--dont_mirror]    : Do not check mirrors")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.odir = self.getParam("--odir")
        self.oroot = self.getParam("--oroot")
        self.n_refs = self.getIntParam("--nref")
        self.n_iters = self.getIntParam("--iter")
        self.max_shift = self.getIntParam("--maxShift")
        self.mirror = not self.checkParam("--dont_mirror")
        from xmipp3_tpu.parallel.cli import read_mesh_params
        read_mesh_params(self)

    def run(self):
        import os
        from xmipp3_tpu.models.cl2d import classify_cl2d
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             resolve_mesh)
        maybe_init_distributed(self)
        mesh, mesh_mode = resolve_mesh(self.mesh_mode)
        if mesh is not None and self.verbose:
            print(f"mesh: {mesh_mode} over "
                  f"{len(mesh.devices.ravel())} devices")
        imgs, rows = _load_stack_md(self.fn_in)
        res = classify_cl2d(imgs, self.n_refs, self.n_iters, self.max_shift,
                            verbose=self.verbose, check_mirror=self.mirror,
                            mesh=mesh)
        root = os.path.join(self.odir, self.oroot)
        fn_refs = root + "_references.stk"
        save_image(fn_refs, res["refs"])
        out_rows = []
        for i, r in enumerate(rows):
            d = dict(r)
            d.update({"ref": int(res["assignments"][i]) + 1,
                      "anglePsi": float(res["psi"][i]),
                      "shiftX": float(res["sx"][i]),
                      "shiftY": float(res["sy"][i]),
                      "flip": int(res["flip"][i]),
                      "maxCC": float(res["corr"][i])})
            out_rows.append(d)
        MetaData.fromRows(out_rows).write(root + "_images.xmd")
        counts = [{"ref": k + 1,
                   "classCount": int((res["assignments"] == k).sum()),
                   "image": f"{k + 1:06d}@{fn_refs}"}
                  for k in range(self.n_refs)]
        MetaData.fromRows(counts).write(root + "_classes.xmd")


class ProgMLAlign2D(XmippProgram):
    name = "xmipp_ml_align2d"

    def defineParams(self):
        self.addUsageLine("Maximum-likelihood multi-reference 2D alignment "
                          "and classification (ML2D).")
        self.addParamsLine("   -i <md_or_stack>  : Input images")
        self.addParamsLine("  [--nref <n=4>]     : Number of references")
        self.addParamsLine("  [--oroot <root=ml2d>] : Output rootname")
        self.addParamsLine("  [--iter <n=15>]    : Maximum iterations")
        self.addParamsLine("  [--maxShift <s=4>] : Translation search (px)")
        self.addParamsLine("  [--sigma <s=1>]    : Initial noise sigma")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.n_refs = self.getIntParam("--nref")
        self.oroot = self.getParam("--oroot")
        self.n_iters = self.getIntParam("--iter")
        self.max_shift = self.getIntParam("--maxShift")
        self.sigma = self.getDoubleParam("--sigma")
        from xmipp3_tpu.parallel.cli import read_mesh_params
        read_mesh_params(self)

    def _mesh(self):
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             resolve_mesh)
        maybe_init_distributed(self)
        mesh, mode = resolve_mesh(self.mesh_mode)
        if mesh is not None and self.verbose:
            print(f"mesh: {mode} over {len(mesh.devices.ravel())} devices")
        return mesh

    def run(self):
        from xmipp3_tpu.models.ml2d import ml2d
        imgs, rows = _load_stack_md(self.fn_in)
        res = ml2d(imgs, self.n_refs, self.n_iters, self.max_shift,
                   self.sigma, verbose=self.verbose, mesh=self._mesh())
        fn_refs = self.oroot + "_references.stk"
        save_image(fn_refs, res["refs"])
        out_rows = []
        for i, r in enumerate(rows):
            d = dict(r)
            d.update({"ref": int(res["assignments"][i]) + 1,
                      "anglePsi": float(res["psi"][i]),
                      "shiftX": float(res["sx"][i]),
                      "shiftY": float(res["sy"][i]),
                      "logLikelihood": float(res["loglike"][-1])})
            out_rows.append(d)
        MetaData.fromRows(out_rows).write(self.oroot + "_images.xmd")
        MetaData.fromRows([
            {"ref": k + 1, "weight": float(res["fractions"][k]),
             "image": f"{k + 1:06d}@{fn_refs}"}
            for k in range(self.n_refs)]).write(self.oroot + "_classes.xmd")
        if self.verbose:
            print(f"final sigma={res['sigma']:.4f}")


class ProgKerdensom(XmippProgram):
    name = "xmipp_classify_kerdensom"

    def defineParams(self):
        self.addUsageLine("Kernel-density self-organizing map classification "
                          "of vectors (kerdenSOM).")
        self.addParamsLine("   -i <md_file>  : Metadata with vectors (classificationData)")
        self.addParamsLine("  [--oroot <root=som>] : Output rootname")
        self.addParamsLine("  [--xdim <x=4>]  : SOM grid width")
        self.addParamsLine("  [--ydim <y=4>]  : SOM grid height")
        self.addParamsLine("  [--iter <n=100>] : Training iterations")
        self.addParamsLine("  [--reg0 <r=1000>] : Initial regularization")
        self.addParamsLine("  [--regF <r=100>]  : Final regularization")
        self.addParamsLine("  [--variant <v=kerdensom>] : kerdensom | som | batch_som | fuzzy_som (reference classification/ kerdensom, som, batch_som, fuzzy_som)")

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.oroot = self.getParam("--oroot")
        self.xdim = self.getIntParam("--xdim")
        self.ydim = self.getIntParam("--ydim")
        self.n_iters = self.getIntParam("--iter")
        self.reg0 = self.getDoubleParam("--reg0")
        self.regF = self.getDoubleParam("--regF")
        self.variant = self.getParam("--variant")

    def run(self):
        from xmipp3_tpu.models.som import (batch_som, fuzzy_som, kerdensom,
                                           som)
        md = MetaData(self.fn_in)
        X = np.stack([np.asarray(v, np.float32)
                      for v in md.getColumnValues("classificationData")])
        shape = (self.ydim, self.xdim)
        if self.variant == "som":
            code, assign = som(X, shape, self.n_iters)
        elif self.variant == "batch_som":
            code, assign = batch_som(X, shape,
                                     max(self.n_iters // 5, 5))
        elif self.variant == "fuzzy_som":
            code, U = fuzzy_som(X, shape, n_iters=self.n_iters)
            assign = U.argmax(axis=1)
        else:
            code, assign = kerdensom(X, shape, self.n_iters, self.reg0,
                                     self.regF, verbose=self.verbose)
        rows = []
        for i in md:
            r = md.getRow(i)
            r["ref"] = int(assign[i]) + 1
            rows.append(r)
        MetaData.fromRows(rows).write(self.oroot + "_images.xmd")
        np.save(self.oroot + "_codebook.npy", code)


class ProgMLFAlign2D(ProgMLAlign2D):
    """MLF2D: ML2D with the Fourier-space per-resolution noise model
    (reference mlf_align2d.h:70). The scoring reuses the ring-FFT machinery
    with SNR ring weighting."""
    name = "xmipp_mlf_align2d"

    def run(self):
        from xmipp3_tpu.models.ml2d import ml2d
        imgs, rows = _load_stack_md(self.fn_in)
        res = ml2d(imgs, self.n_refs, self.n_iters, self.max_shift,
                   self.sigma, verbose=self.verbose,
                   fourier_noise_model=True, mesh=self._mesh())
        fn_refs = self.oroot + "_references.stk"
        save_image(fn_refs, res["refs"])
        out_rows = []
        for i, r in enumerate(rows):
            d = dict(r)
            d.update({"ref": int(res["assignments"][i]) + 1,
                      "logLikelihood": float(res["loglike"][-1])})
            out_rows.append(d)
        MetaData.fromRows(out_rows).write(self.oroot + "_images.xmd")


PROGRAM = None
