"""xmipp_movie_alignment_correlation — frame alignment by cross-correlation
(the FlexAlign path; reference movie_alignment_correlation_base.cpp grammar)
+ xmipp_movie_filter_dose + xmipp_movie_estimate_gain.
"""
from __future__ import annotations

import os

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import is_metadata_file
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.ops import movie as mops


def _load_movie(fn) -> np.ndarray:
    if is_metadata_file(fn):
        md = MetaData(fn)
        return np.stack([np.squeeze(Image(r["image"]).data)
                         for r in md.iterRows()]).astype(np.float32)
    return Image.read_stack(fn)


class ProgMovieAlignmentCorrelation(XmippProgram):
    name = "xmipp_movie_alignment_correlation"

    def defineParams(self):
        self.addUsageLine("Align a set of frames by cross-correlation of the frames")
        self.addParamsLine("   -i <metadata>               : Movie stack or metadata with frames")
        self.addParamsLine("  [-o <fn=\"out.xmd\">]          : Metadata with the shifts of each frame")
        self.addParamsLine("  [--maxShift <s=50>]          : Maximum shift allowed in A")
        self.addParamsLine("  [--sampling <Ts=1>]          : Sampling rate (A/pixel)")
        self.addParamsLine("  [--oaligned <fn=\"\">]         : Write the aligned movie stack")
        self.addParamsLine("  [--oavgInitial <fn=\"\">]      : Unaligned (initial) micrograph")
        self.addParamsLine("  [--oavg <fn=\"\">]             : Aligned micrograph")
        self.addParamsLine("  [--dark <fn=\"\">]             : Dark correction image")
        self.addParamsLine("  [--gain <fn=\"\">]             : Gain correction image (multiplied)")
        self.addParamsLine("  [--skipLocalAlignment]       : Only global alignment")
        self.addParamsLine("  [--controlPoints <x=6> <y=6> <t=5>] : BSpline control points")
        self.addParamsLine("  [--patches <x=7> <y=7>]      : Patches for local alignment")
        self.addParamsLine("  [--frameRange <n0=-1> <nF=-1>] : First and last frame to align")
        self.addParamsLine("  [--dose_per_frame <d=0>]     : e/A^2 per frame (enables dose weighting)")
        self.addParamsLine("  [--voltage <kV=300>]         : For dose weighting")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.fn_out = self.getParam("-o")
        self.max_shift_A = self.getDoubleParam("--maxShift")
        self.Ts = self.getDoubleParam("--sampling")
        self.fn_aligned = self.getParam("--oaligned") if self.checkParam("--oaligned") else ""
        self.fn_avg0 = self.getParam("--oavgInitial") if self.checkParam("--oavgInitial") else ""
        self.fn_avg = self.getParam("--oavg") if self.checkParam("--oavg") else ""
        self.fn_dark = self.getParam("--dark") if self.checkParam("--dark") else ""
        self.fn_gain = self.getParam("--gain") if self.checkParam("--gain") else ""
        self.local = not self.checkParam("--skipLocalAlignment")
        self.patches = (self.getIntParam("--patches", 1),
                        self.getIntParam("--patches", 0))
        self.dose = self.getDoubleParam("--dose_per_frame") if \
            self.checkParam("--dose_per_frame") else 0.0
        self.kV = self.getDoubleParam("--voltage")
        from xmipp3_tpu.parallel.cli import read_mesh_params
        read_mesh_params(self)

    def run(self):
        frames = _load_movie(self.fn_in)
        F, H, W = frames.shape
        if self.fn_dark:
            frames = frames - np.squeeze(Image(self.fn_dark).data)
        if self.fn_gain:
            frames = frames * np.squeeze(Image(self.fn_gain).data)
        if self.fn_avg0:
            save_image(self.fn_avg0, frames.mean(axis=0))

        max_shift_px = max(int(self.max_shift_A / self.Ts), 4)
        pos = mops.global_align(frames, max_shift_px)
        if self.verbose:
            print("global per-frame shifts (px):")
            for i, (x, y) in enumerate(pos):
                print(f"  frame {i + 1}: {x:8.3f} {y:8.3f}")

        dose_f = None
        if self.dose > 0:
            dose_f = mops.dose_filter(H, F, self.dose, self.Ts,
                                      voltage=self.kV)

        if self.local and min(H, W) >= 128:
            from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                                 resolve_mesh)
            maybe_init_distributed(self)
            mesh, mesh_mode = resolve_mesh(self.mesh_mode)
            if mesh is not None:
                # patch axis sharded over the mesh (the FlexAlign stream
                # pool equivalent, movie_alignment_correlation_gpu.cpp:649)
                if self.verbose:
                    print(f"mesh: {mesh_mode} local alignment over "
                          f"{len(mesh.devices.ravel())} devices")
                from xmipp3_tpu.parallel.movie import local_align_mesh
                field, cys, cxs = local_align_mesh(mesh, frames, pos,
                                                   patches=self.patches,
                                                   max_shift_px=8)
            else:
                field, cys, cxs = mops.local_align(frames, pos,
                                                   patches=self.patches,
                                                   max_shift_px=8)
            total = field + pos[None, None]
            # gather-free tiled warp (Fourier-shifted Hann tiles)
            avg = np.asarray(mops.warp_sum_frames_tiled(
                frames, total, cys, cxs)) / F
            aligned = None
        else:
            avg = np.asarray(mops.shift_sum_frames(
                frames, -pos[:, 0], -pos[:, 1], dose_f)) / \
                (1.0 if dose_f is not None else F)
            aligned = np.asarray(mops.shift_sum_frames_keep(
                frames, -pos[:, 0], -pos[:, 1]))

        if self.fn_avg:
            save_image(self.fn_avg, avg, sampling=self.Ts)
        if self.fn_aligned:
            if aligned is None:
                aligned = np.asarray(mops.shift_sum_frames_keep(
                    frames, -pos[:, 0], -pos[:, 1]))
            save_image(self.fn_aligned, aligned, sampling=self.Ts)
        md = MetaData.fromRows([
            {"image": f"{i + 1:06d}@{self.fn_in}", "shiftX": float(pos[i, 0]),
             "shiftY": float(pos[i, 1]), "itemId": i + 1} for i in range(F)])
        md.write(self.fn_out)


class ProgMovieFilterDose(XmippProgram):
    name = "xmipp_movie_filter_dose"

    def defineParams(self):
        self.addUsageLine("Apply dose-dependent frequency weighting "
                          "(Grant & Grigorieff) to movie frames.")
        self.addParamsLine("   -i <movie>       : Input movie stack")
        self.addParamsLine("   -o <movie>       : Output weighted stack")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size (A)")
        self.addParamsLine("  [--dose_per_frame <d=1>] : e/A^2 per frame")
        self.addParamsLine("  [--pre_dose <d=0>]  : Dose before first frame")
        self.addParamsLine("  [--voltage <kV=300>] : Acceleration voltage")

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.fn_out = self.getParam("-o")
        self.Ts = self.getDoubleParam("--sampling")
        self.dose = self.getDoubleParam("--dose_per_frame")
        self.pre = self.getDoubleParam("--pre_dose")
        self.kV = self.getDoubleParam("--voltage")

    def run(self):
        import jax.numpy as jnp
        frames = _load_movie(self.fn_in)
        F, H, W = frames.shape
        q = mops.dose_filter(H, F, self.dose, self.Ts, self.pre, self.kV)
        spec = jnp.fft.rfft2(jnp.asarray(frames))
        out = np.asarray(jnp.fft.irfft2(spec * q, s=(H, W)))
        save_image(self.fn_out, out, sampling=self.Ts)


class ProgMovieEstimateGain(XmippProgram):
    name = "xmipp_movie_estimate_gain"

    def defineParams(self):
        self.addUsageLine("Estimate the gain image of a camera from a movie.")
        self.addParamsLine("   -i <movie>   : Input movie")
        self.addParamsLine("  [--oroot <root=gain_estimated>] : Output rootname")

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.oroot = self.getParam("--oroot")

    def run(self):
        frames = _load_movie(self.fn_in)
        gain = mops.estimate_gain(frames)
        save_image(self.oroot + ".xmp", gain)


PROGRAM = None
