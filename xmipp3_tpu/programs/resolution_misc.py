"""Resolution & map post-processing programs: monogenic_signal (MonoRes),
fso, localfilter, monotomo, volume_correct_bfactor, volume_structure_factor.

Contracts: reference resolution_monogenic_signal.h:49, resolution_fso.h:38,
resolution_localfilter, resolution_monotomo.h:46, volume_correct_bfactor,
volume_structure_factor (SURVEY.md §2.3 resolution block).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.ops.mask import circular_mask
from xmipp3_tpu.ops.monogenic import (fso_directional,
                                      local_filter_by_resolution,
                                      local_resolution_monores)


class ProgMonoRes(XmippProgram):
    name = "xmipp_resolution_monogenic_signal"

    def defineParams(self):
        self.addUsageLine("Local resolution by monogenic-amplitude "
                          "hypothesis testing (MonoRes).")
        self.addParamsLine("   --vol <volume>   : Input map (or half map 1)")
        self.addParamsLine("  [--vol2 <volume=\"\">] : Half map 2 (averaged with 1)")
        self.addParamsLine("  [--mask <mask=\"\">]  : Binary mask of the particle")
        self.addParamsLine("  [-o <output=monores.vol>] : Local resolution map")
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size (Å)")
        self.addParamsLine("  [--minRes <r=-1>]  : Lowest tested resolution (Å)")
        self.addParamsLine("  [--maxRes <r=-1>]  : Highest tested resolution (Å)")
        self.addParamsLine("  [--significance <s=0.95>] : Noise percentile")
        self.addParamsLine("  [--steps <n=30>]   : Number of frequency bands")

    def readParams(self):
        self.fn_vol = self.getParam("--vol")
        self.fn_vol2 = self.getParam("--vol2") if self.checkParam("--vol2") else ""
        self.fn_mask = self.getParam("--mask") if self.checkParam("--mask") else ""
        self.fn_out = self.getParam("-o")
        self.Ts = self.getDoubleParam("--sampling_rate")
        self.min_res = self.getDoubleParam("--minRes")
        self.max_res = self.getDoubleParam("--maxRes")
        self.significance = self.getDoubleParam("--significance")
        self.steps = self.getIntParam("--steps")

    def run(self):
        vol = np.squeeze(Image(self.fn_vol).data).astype(np.float32)
        if self.fn_vol2:
            vol = 0.5 * (vol + np.squeeze(Image(self.fn_vol2).data))
        if self.fn_mask:
            mask = np.squeeze(Image(self.fn_mask).data) > 0.5
        else:
            mask = circular_mask(vol.shape, vol.shape[0] // 2 - 4) > 0.5
        res_map, freqs, frac = local_resolution_monores(
            vol, mask, self.Ts,
            None if self.min_res <= 0 else self.min_res,
            None if self.max_res <= 0 else self.max_res,
            n_freqs=self.steps, significance=self.significance)
        res_map = np.where(mask, res_map, 0.0).astype(np.float32)
        save_image(self.fn_out, res_map, sampling=self.Ts)
        vals = res_map[mask]
        self.median_resolution = float(np.median(vals))
        if self.verbose:
            print(f"Median local resolution: {self.median_resolution:.2f} A "
                  f"(min {vals.min():.2f}, max {vals.max():.2f})")


class ProgMonoTomo(ProgMonoRes):
    """Local resolution for tomograms: same monogenic machinery with the
    noise estimated from the two half-tomograms (reference
    resolution_monotomo.h:46 — here the association is by difference map)."""
    name = "xmipp_resolution_monotomo"


class ProgFSO(XmippProgram):
    name = "xmipp_resolution_fso"

    def defineParams(self):
        self.addUsageLine("Fourier Shell Occupancy: directional resolution "
                          "anisotropy from two half maps.")
        self.addParamsLine("   --half1 <v1>    : Half map 1")
        self.addParamsLine("   --half2 <v2>    : Half map 2")
        self.addParamsLine("  [-o <out_md=fso.xmd>] : FSO curve metadata")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")
        self.addParamsLine("  [--anglecone <a=20>] : Cone half angle (deg)")
        self.addParamsLine("  [--threshold <t=0.143>] : FSC threshold")

    def readParams(self):
        self.fn1 = self.getParam("--half1")
        self.fn2 = self.getParam("--half2")
        self.fn_out = self.getParam("-o")
        self.Ts = self.getDoubleParam("--sampling")
        self.cone = self.getDoubleParam("--anglecone")
        self.threshold = self.getDoubleParam("--threshold")

    def run(self):
        v1 = np.squeeze(Image(self.fn1).data).astype(np.float32)
        v2 = np.squeeze(Image(self.fn2).data).astype(np.float32)
        freqs, fso = fso_directional(v1, v2, self.Ts, cone_deg=self.cone,
                                     threshold=self.threshold)
        md = MetaData.fromRows([
            {"resolutionFreq": float(f / self.Ts), "resolutionFRC": float(o),
             "resolutionFreqReal": float(self.Ts / f) if f > 0 else 1e6}
            for f, o in zip(freqs, fso)])
        md.write(self.fn_out)
        # global anisotropy summary: freq where FSO crosses 0.5 and 0.9
        self.fso = fso
        if self.verbose:
            for t in (0.9, 0.5, 0.1):
                below = np.where(fso < t)[0]
                if len(below) and below[0] > 0:
                    print(f"FSO {t:.1f} at "
                          f"{self.Ts / freqs[below[0]]:.2f} A")


class ProgResolutionLocalFilter(XmippProgram):
    name = "xmipp_resolution_localfilter"

    def defineParams(self):
        self.addUsageLine("Filter a map locally according to a local "
                          "resolution map.")
        self.addParamsLine("   --vol <volume>  : Map to filter")
        self.addParamsLine("   --resvol <res>  : Local resolution map (Å)")
        self.addParamsLine("  [-o <out=filtered.vol>] : Output")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")

    def readParams(self):
        self.fn_vol = self.getParam("--vol")
        self.fn_res = self.getParam("--resvol")
        self.fn_out = self.getParam("-o")
        self.Ts = self.getDoubleParam("--sampling")

    def run(self):
        vol = np.squeeze(Image(self.fn_vol).data).astype(np.float32)
        res = np.squeeze(Image(self.fn_res).data).astype(np.float32)
        res = np.where(res <= 0, res[res > 0].max() if (res > 0).any()
                       else 2 * self.Ts, res)
        out = local_filter_by_resolution(vol, res, self.Ts)
        save_image(self.fn_out, out, sampling=self.Ts)


class ProgVolumeCorrectBfactor(XmippProgram):
    name = "xmipp_volume_correct_bfactor"

    def defineParams(self):
        self.addUsageLine("Sharpen a map by automatic B-factor correction "
                          "(Guinier-plot fit, Rosenthal & Henderson).")
        self.addParamsLine("   -i <volume>     : Input map")
        self.addParamsLine("  [-o <out=\"\">]    : Output (default: overwrite)")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")
        self.addParamsLine("  [--auto]        : Automatic B-factor from Guinier fit")
        self.addParamsLine("  [--adhoc <B=0>] : Apply this B-factor (Å^2, negative sharpens)")
        self.addParamsLine("  [--maxres <r=-1>] : Max resolution for fit/application (Å)")
        self.addParamsLine("  [--fit_minres <r=15>] : Min resolution of Guinier fit (Å)")

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.fn_out = self.getParam("-o") if self.checkParam("-o") else self.fn_in
        self.Ts = self.getDoubleParam("--sampling")
        self.auto = self.checkParam("--auto") or not self.checkParam("--adhoc")
        self.B = self.getDoubleParam("--adhoc") if self.checkParam("--adhoc") else 0.0
        self.maxres = self.getDoubleParam("--maxres")
        self.fit_minres = self.getDoubleParam("--fit_minres")

    def run(self):
        import jax.numpy as jnp
        vol = np.squeeze(Image(self.fn_in).data).astype(np.float32)
        D = vol.shape[0]
        F = np.fft.rfftn(vol)
        from xmipp3_tpu.ops.fourier import freq_grid_3d
        fz, fy, fx = freq_grid_3d(*vol.shape)
        r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2) / self.Ts      # 1/Å
        nbins = D // 2
        bins = np.minimum((r * self.Ts / 0.5 * nbins).astype(np.int32),
                          nbins - 1)
        amp2 = np.abs(F) ** 2
        radial = np.bincount(bins.ravel(), amp2.ravel(), minlength=nbins)
        counts = np.bincount(bins.ravel(), minlength=nbins)
        radial = radial / np.maximum(counts, 1)
        freqs = ((np.arange(nbins) + 0.5) * (0.5 / nbins)) / self.Ts
        if self.auto:
            maxres = self.maxres if self.maxres > 0 else 2.2 * self.Ts
            sel = (freqs > 1.0 / self.fit_minres) & (freqs < 1.0 / maxres) & \
                (radial > 0)
            if sel.sum() >= 3:
                x = freqs[sel] ** 2
                y = 0.5 * np.log(radial[sel])    # ln|F| = ln sqrt(P)
                slope, icept = np.polyfit(x, y, 1)
                self.B = 4.0 * slope             # ln|F| = c - (B/4) f^2
            else:
                self.B = 0.0
        maxres = self.maxres if self.maxres > 0 else 2.0 * self.Ts
        corr = np.exp(-(self.B / 4.0) * r ** 2)
        corr = np.where(r <= 1.0 / maxres, corr, 0.0)
        out = np.fft.irfftn(F * corr, s=vol.shape,
                            axes=(0, 1, 2)).astype(np.float32)
        save_image(self.fn_out, out, sampling=self.Ts)
        if self.verbose:
            print(f"Applied B-factor: {self.B:.1f} A^2")


class ProgVolumeStructureFactor(XmippProgram):
    name = "xmipp_volume_structure_factor"

    def defineParams(self):
        self.addUsageLine("Radial structure factor (rotationally averaged "
                          "power spectrum) of a volume.")
        self.addParamsLine("   -i <volume>  : Input map")
        self.addParamsLine("  [-o <out=structureFactor.xmd>] : Output metadata")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.fn_out = self.getParam("-o")
        self.Ts = self.getDoubleParam("--sampling")

    def run(self):
        vol = np.squeeze(Image(self.fn_in).data).astype(np.float32)
        D = vol.shape[0]
        F = np.fft.rfftn(vol)
        from xmipp3_tpu.ops.fourier import freq_grid_3d
        fz, fy, fx = freq_grid_3d(*vol.shape)
        r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
        nbins = D // 2
        bins = np.minimum((r / 0.5 * nbins).astype(np.int32), nbins - 1)
        amp2 = np.abs(F) ** 2
        radial = np.bincount(bins.ravel(), amp2.ravel(), minlength=nbins)
        counts = np.bincount(bins.ravel(), minlength=nbins)
        radial = radial / np.maximum(counts, 1)
        freqs = (np.arange(nbins) + 0.5) * (0.5 / nbins)
        md = MetaData.fromRows([
            {"resolutionFreq": float(f / self.Ts),
             "resolutionFreqReal": float(self.Ts / f),
             "logStructureFactor": float(np.log(max(p, 1e-30)))}
            for f, p in zip(freqs, radial)])
        md.write(self.fn_out)


PROGRAM = None
