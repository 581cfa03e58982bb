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
        self.addParamsLine("  [--blob <radius=1.9> <order=0> <alpha=15>] : Blob parameters (reference interpolant; radius<=0 selects trilinear)")
        self.addParamsLine("  [--interp <mode=kb>]         : Gridding window: kb (Kaiser-Bessel blob, reference default), tri (trilinear, fastest), tri+kb, nn")
        self.addParamsLine("  [--batch <b=256>]            : Images per device batch")
        self.addParamsLine("  [--useCTF]                   : Use CTF information if present (per-frequency 1/CTF inversion during gridding)")
        self.addParamsLine("  [--sampling <Ts=1>]          : sampling rate of the input images in Angstroms/pixel")
        self.addParamsLine("  [--phaseFlipped]             : Give this flag if images have been already phase flipped")
        self.addParamsLine("  [--minCTF <ctf=0.01>]        : Minimum value of the CTF that will be inverted")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)
        self.addExampleLine("   xmipp_reconstruct_fourier -i reconstruction.sel --sym i3 --weight")

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.fn_out = self.getParam("-o")
        self.sym = self.getParam("--sym")
        self.pad = self.getDoubleParam("--padding", 1)
        self.max_res = self.getDoubleParam("--max_resolution")
        self.use_weights = self.checkParam("--weight")
        self.batch = self.getIntParam("--batch")
        self.niter_weight = self.getIntParam("--iter")
        self.interp = self.getParam("--interp") if \
            self.checkParam("--interp") else "kb"
        self.blob = (self.getDoubleParam("--blob", 0),
                     self.getIntParam("--blob", 1),
                     self.getDoubleParam("--blob", 2))
        if self.blob[0] <= 0:
            self.interp = "tri"
        self.fn_fsc = self.getParam("--prepare_fsc") if \
            self.checkParam("--prepare_fsc") else ""
        self.use_ctf = self.checkParam("--useCTF")
        self.phase_flipped = self.checkParam("--phaseFlipped")
        self.min_ctf = self.getDoubleParam("--minCTF")
        self.sampling = self.getDoubleParam("--sampling")
        self._ctf_cache = {}
        from xmipp3_tpu.parallel.cli import read_mesh_params
        read_mesh_params(self)

    def show(self):
        if self.verbose:
            print(f"Input metadata    : {self.fn_in}")
            print(f"Output volume     : {self.fn_out}")
            print(f"Symmetry          : {self.sym}")
            print(f"Padding factor    : {self.pad}")
            print(f"Max resolution    : {self.max_res}")

    def _ctf_params_for(self, rows):
        """Per-row CTF parameter arrays for --useCTF gridding, or None.

        Matches the reference's hasCTF gate (ctfModel or ctfDefocusU label
        present AND --useCTF, reconstruct_fourier.cpp:335-336) and its
        per-row readFromMetadataRow (:367-372): inline ctf* labels, or a
        per-row ctfModel file (parsed once per distinct path)."""
        if not self.use_ctf:
            return None
        from xmipp3_tpu.ops.ctf import CTFDescription, ctf_params_arrays
        if not any(("ctfModel" in r) or ("ctfDefocusU" in r) for r in rows):
            return None
        descs = []
        for r in rows:
            if "ctfModel" in r and r["ctfModel"]:
                fn = str(r["ctfModel"])
                if fn not in self._ctf_cache:
                    self._ctf_cache[fn] = CTFDescription.from_metadata(fn)
                descs.append(self._ctf_cache[fn])
            else:
                descs.append(CTFDescription.from_row(r))
        return ctf_params_arrays(descs)

    def _reconstruct_subset(self, md: MetaData, rows_idx, N: int):
        rows = [md.getRow(i) for i in rows_idx]
        if self._mesh is not None:
            return self._reconstruct_mesh(rows, N)
        rec = FourierReconstructor(N, self.pad, self.sym, self.max_res,
                                   interp=self.interp,
                                   niter_weight=self.niter_weight,
                                   blob=self.blob, sampling=self.sampling,
                                   min_ctf=self.min_ctf,
                                   phase_flipped=self.phase_flipped)
        for s in range(0, len(rows), self.batch):
            chunk = rows[s:s + self.batch]
            imgs = np.stack([np.squeeze(Image(r["image"]).data)
                             for r in chunk]).astype(np.float32)
            get = lambda k, d=0.0: np.array(
                [float(r.get(k, d)) for r in chunk], np.float32)
            rec.add_batch(imgs, get("angleRot"), get("angleTilt"),
                          get("anglePsi"), get("shiftX"), get("shiftY"),
                          get("weight", 1.0) if self.use_weights else None,
                          flip=get("flip", 0.0).astype(bool),
                          ctfp=self._ctf_params_for(chunk))
            if self.verbose:
                print(f"  processed {min(s + self.batch, len(rows))}/{len(rows)}")
        return np.asarray(rec.finish())

    def _reconstruct_mesh(self, rows, N: int):
        """Mesh-parallel reconstruction (the mpi_reconstruct_fourier
        equivalent, parallel/mpi_reconstruct_fourier.cpp:325-420): dp =
        particle-sharded + psum volume reduction; slab = kz-slab volume
        sharding for cubes too large to replicate per chip."""
        from xmipp3_tpu.parallel.reconstruct import (parallel_reconstruct,
                                                     slab_reconstruct,
                                                     slab_reconstruct_2d)
        imgs = np.stack([np.squeeze(Image(r["image"]).data)
                         for r in rows]).astype(np.float32)
        get = lambda k, d=0.0: np.array(
            [float(r.get(k, d)) for r in rows], np.float32)
        w = get("weight", 1.0) if self.use_weights else None
        flip = get("flip", 0.0).astype(bool)
        ctf_kw = dict(ctfp=self._ctf_params_for(rows),
                      sampling=self.sampling, min_ctf=self.min_ctf,
                      phase_flipped=self.phase_flipped)
        if self._mesh_mode in ("slab", "slab2d"):
            if self.sym.lower() not in ("c1", ""):
                raise ValueError("--mesh slab currently supports c1 only; "
                                 "use --mesh dp for symmetric reconstructions")
            fn = slab_reconstruct_2d if self._mesh_mode == "slab2d" \
                else slab_reconstruct
            vol = fn(
                self._mesh, np.where(flip[:, None, None],
                                     imgs[:, :, ::-1], imgs),
                get("angleRot"), get("angleTilt"), get("anglePsi"),
                np.where(flip, -get("shiftX"), get("shiftX")), get("shiftY"),
                weights=w, pad_factor=self.pad, max_freq=self.max_res,
                interp=self.interp, niter_weight=self.niter_weight,
                **ctf_kw)
        else:
            vol = parallel_reconstruct(
                self._mesh, imgs, get("angleRot"), get("angleTilt"),
                get("anglePsi"), get("shiftX"), get("shiftY"), weights=w,
                pad_factor=self.pad, sym=self.sym, max_freq=self.max_res,
                flip=flip, interp=self.interp,
                niter_weight=self.niter_weight, **ctf_kw)
        return np.asarray(vol)

    def run(self):
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             resolve_mesh)
        maybe_init_distributed(self)
        self._mesh, self._mesh_mode = resolve_mesh(self.mesh_mode)
        if self.verbose and self._mesh is not None:
            print(f"mesh: {self._mesh_mode} over "
                  f"{len(self._mesh.devices.ravel())} devices")
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
