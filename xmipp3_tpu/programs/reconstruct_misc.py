"""Reconstruction programs: reconstruct_art, reconstruct_wbp,
reconstruct_significant.

Contracts: reference reconstruct_art/basic_art (basic_art.h:92),
reconstruct_wbp (reconstruct_wbp.h:47), reconstruct_significant
(reconstruct_significant.h:39).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram


def _load(md):
    rows = list(md.iterRows())
    imgs = load_image_rows(rows)
    get = lambda k, d=0.0: np.array([float(r.get(k, d)) for r in rows],
                                    np.float32)
    return imgs, get("angleRot"), get("angleTilt"), get("anglePsi"), \
        get("shiftX"), get("shiftY")


class ProgReconstructART(XmippProgram):
    name = "xmipp_reconstruct_art"

    def defineParams(self):
        self.addUsageLine("Algebraic (ART/SIRT) 3D reconstruction from "
                          "projections.")
        self.addParamsLine("   -i <md_file>  : Metadata with projections")
        self.addParamsLine("  [-o <volume=rec_art.vol>] : Output volume")
        self.addParamsLine("  [-n <iters=5>] : Number of iterations")
        self.addParamsLine("  [-l <lambdas=0.5>] : Relaxation parameter(s), comma-separated per iteration")
        self.addParamsLine("  [--POCS_positivity] : Positivity constraint")
        self.addParamsLine("  [--POCS_freq <f=1>] : Apply POCS every f block updates")
        self.addParamsLine("  [--surface <mask=\"\">] : Surface mask volume (forced to 0 where mask=1)")
        self.addParamsLine("  [--parallel_mode <m=SIRT>] : ART|pCAV|pAVSP|pSART|pBiCAV|pSIRT|pfSIRT|SIRT (basic_art.h:92)")
        self.addParamsLine("  [--block_size <b=-1>] : Projections per parallel block")
        self.addParamsLine("  [--random_sort] : Random projection order")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def run(self):
        from xmipp3_tpu.ops.art import art_reconstruct
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             read_mesh_params, resolve_mesh)
        read_mesh_params(self)
        maybe_init_distributed(self)
        mesh, _ = resolve_mesh(self.mesh_mode)
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        imgs, rot, tilt, psi, sx, sy = _load(md)
        lambdas = [float(v) for v in
                   str(self.getParam("-l")).split(",") if v]
        bs = self.getIntParam("--block_size")
        surf = None
        if self.checkParam("--surface") and self.getParam("--surface"):
            surf = np.squeeze(Image(self.getParam("--surface")).data)
        vol, hist = art_reconstruct(
            imgs, rot, tilt, psi, mode=self.getParam("--parallel_mode"),
            n_iters=self.getIntParam("-n"), lambda_list=lambdas,
            block_size=None if bs <= 0 else bs,
            positivity=self.checkParam("--POCS_positivity"),
            surface_mask=surf, pocs_freq=self.getIntParam("--POCS_freq"),
            random_sort=self.checkParam("--random_sort"),
            verbose=self.verbose, sx=sx, sy=sy, mesh=mesh)
        save_image(self.getParam("-o"), vol)
        self.residual_history = hist


class ProgReconstructWBP(XmippProgram):
    name = "xmipp_reconstruct_wbp"

    def defineParams(self):
        self.addUsageLine("Weighted back-projection 3D reconstruction.")
        self.addParamsLine("   -i <md_file>  : Metadata with projections")
        self.addParamsLine("  [-o <volume=wbp.vol>] : Output volume")
        self.addParamsLine("  [--diameter <d=-1>] : Object diameter for the ramp filter")

    def run(self):
        from xmipp3_tpu.ops.art import wbp_reconstruct
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        imgs, rot, tilt, psi, sx, sy = _load(md)
        if np.any(sx) or np.any(sy):
            from xmipp3_tpu.ops.fourier import fourier_shift_2d
            imgs = np.asarray(fourier_shift_2d(imgs, sx, sy))
        d = self.getDoubleParam("--diameter")
        vol = wbp_reconstruct(imgs, rot, tilt, psi,
                              filter_diameter=None if d <= 0 else d)
        save_image(self.getParam("-o"), vol)


class ProgReconstructSignificant(XmippProgram):
    name = "xmipp_reconstruct_significant"

    def defineParams(self):
        self.addUsageLine("Initial-volume estimation by significance-weighted "
                          "angular assignment iterations.")
        self.addParamsLine("   -i <md_file>  : Metadata/stack with class averages")
        self.addParamsLine("  [--odir <dir=.>] : Output directory")
        self.addParamsLine("  [--initvolumes <md=\"\">] : Initial volume(s); else random")
        self.addParamsLine("  [--sym <s=c1>] : Symmetry")
        self.addParamsLine("  [--iter <n=10>] : Iterations")
        self.addParamsLine("  [--alpha0 <a=0.05>] : Initial significance level")
        self.addParamsLine("  [--angularSampling <a=15>] : Gallery sampling (deg)")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def run(self):
        import os
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        from xmipp3_tpu.core.sampling import Sampling
        from xmipp3_tpu.ops.match import match_to_gallery
        from xmipp3_tpu.ops.project import FourierProjector
        from xmipp3_tpu.ops.reconstruct import reconstruct_fourier

        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             read_mesh_params, resolve_mesh)
        read_mesh_params(self)
        maybe_init_distributed(self)
        mesh, _ = resolve_mesh(self.mesh_mode)

        fn_in = self.getParam("-i")
        if is_metadata_file(fn_in):
            md = MetaData(fn_in)
            md.removeDisabled()
            imgs = load_image_rows(list(md.iterRows()))
        else:
            imgs = Image.read_stack(fn_in)
        B, N, _ = imgs.shape
        sym = self.getParam("--sym")
        n_iters = self.getIntParam("--iter")
        rate = self.getDoubleParam("--angularSampling")
        sampling = Sampling(rate, sym)
        angles = sampling.angles.astype(np.float32)
        rng = np.random.default_rng(0)

        if self.checkParam("--initvolumes") and self.getParam("--initvolumes"):
            vol = np.squeeze(Image(self.getParam("--initvolumes")).data
                             ).astype(np.float32)
        else:
            # random-angle bootstrap (reference's random initial assignment)
            rot0 = rng.uniform(-180, 180, B).astype(np.float32)
            tilt0 = np.degrees(np.arccos(rng.uniform(-1, 1, B))
                               ).astype(np.float32)
            psi0 = rng.uniform(-180, 180, B).astype(np.float32)
            if mesh is not None:
                from xmipp3_tpu.parallel.reconstruct import \
                    parallel_reconstruct
                vol = np.asarray(parallel_reconstruct(
                    mesh, imgs, rot0, tilt0, psi0, sym=sym))
            else:
                vol = np.asarray(reconstruct_fourier(
                    imgs, rot0, tilt0, psi0, sym=sym, batch=B))

        alpha0 = self.getDoubleParam("--alpha0")
        for it in range(n_iters):
            proj = FourierProjector(vol)
            refs = []
            for s in range(0, len(angles), 256):
                a = angles[s:s + 256]
                refs.append(np.asarray(proj.project_euler(
                    a[:, 0], a[:, 1], np.zeros(len(a), np.float32))))
            refs = np.concatenate(refs)
            if mesh is not None:
                # dp over particles: the reference's
                # mpi_reconstruct_significant image distribution
                from xmipp3_tpu.parallel.match import parallel_match_full
                res = parallel_match_full(mesh, refs, imgs,
                                          max_shift=N // 8)
            else:
                res = match_to_gallery(refs, imgs, max_shift=N // 8)
            corr = np.asarray(res["corr"])
            ref_idx = np.asarray(res["ref_idx"])
            # significance: keep the best (1-alpha growing) fraction
            frac = min(1.0, alpha0 + (1.0 - alpha0) * (it + 1) / n_iters)
            thresh = np.quantile(corr, 1.0 - frac)
            keep = corr >= thresh
            w = np.where(keep, np.maximum(corr, 0), 0).astype(np.float32)
            rec_kw = dict(sx=np.asarray(res["sx"], np.float32),
                          sy=np.asarray(res["sy"], np.float32),
                          weights=w, sym=sym,
                          flip=np.asarray(res["flip"]))
            if mesh is not None:
                from xmipp3_tpu.parallel.reconstruct import \
                    parallel_reconstruct
                vol = np.asarray(parallel_reconstruct(
                    mesh, imgs, angles[ref_idx, 0], angles[ref_idx, 1],
                    np.asarray(res["psi"], np.float32), **rec_kw))
            else:
                vol = np.asarray(reconstruct_fourier(
                    imgs, angles[ref_idx, 0], angles[ref_idx, 1],
                    np.asarray(res["psi"], np.float32), batch=B, **rec_kw))
            if self.verbose:
                print(f"  significant iter {it + 1}: mean corr "
                      f"{corr.mean():.4f} kept {keep.mean() * 100:.0f}%")
        odir = self.getParam("--odir")
        save_image(os.path.join(odir, "significant_volume.vol"), vol)
        self.volume = vol


PROGRAM = None
