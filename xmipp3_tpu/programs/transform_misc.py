"""Small transform programs: window, add_noise, threshold, mirror,
center_image, randomize_phases, downsample.

Contracts: reference transform_* programs (SURVEY.md Appendix A transform_*;
threshold.h:38, transform_downsample.h, data/xmipp_image_over for window).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.metadata_program import XmippMetadataProgram
from xmipp3_tpu.ops.geo import window_2d


class ProgTransformWindow(XmippMetadataProgram):
    name = "xmipp_transform_window"

    def defineProcessParams(self):
        self.addUsageLine("Crop or pad images to a new size (centered).")
        self.addParamsLine("[--size <x> <y=-1> <z=-1>] : New size")
        self.addParamsLine("[--crop <x> <y=-1> <z=-1>] : Crop this many pixels (negative pads)")
        self.addParamsLine("[--fill_value <v=0>] : Padding fill value")

    def readProcessParams(self):
        self.size = None
        self.crop = None
        if self.checkParam("--size"):
            x = self.getIntParam("--size", 0)
            y = self.getIntParam("--size", 1)
            self.size = (x, x if y < 0 else y)
        elif self.checkParam("--crop"):
            x = self.getIntParam("--crop", 0)
            y = self.getIntParam("--crop", 1)
            self.crop = (x, x if y == -1 else y)
        self.fill = self.getDoubleParam("--fill_value") if \
            self.checkParam("--fill_value") else 0.0

    def processBatch(self, imgs, rows):
        H, W = imgs.shape[-2:]
        if self.size:
            out_w, out_h = self.size
        else:
            out_w, out_h = W - self.crop[0], H - self.crop[1]
        return np.asarray(window_2d(imgs, out_h, out_w, fill=self.fill))


class ProgTransformAddNoise(XmippMetadataProgram):
    name = "xmipp_transform_add_noise"

    def defineProcessParams(self):
        self.addUsageLine("Add random noise to images.")
        self.addParamsLine("[--type <noise_type=gaussian>] : Noise model")
        self.addParamsLine("    where <noise_type>")
        self.addParamsLine("       gaussian <stddev=1> <avg=0> : Gaussian noise")
        self.addParamsLine("       student <df=3> <stddev=1> <avg=0> : t-Student noise")
        self.addParamsLine("       uniform <min=0> <max=1>     : Uniform noise")
        self.addParamsLine("[--seed <s=-1>] : Random seed (-1 = nondeterministic)")

    def readProcessParams(self):
        toks = self.getListParam("--type") or ["gaussian", "1", "0"]
        self.noise_type = toks[0]
        self.noise_args = [float(t) for t in toks[1:]]
        seed = self.getIntParam("--seed") if self.checkParam("--seed") else -1
        self.rng = np.random.default_rng(None if seed < 0 else seed)

    def processBatch(self, imgs, rows):
        shape = imgs.shape
        t = self.noise_type
        if t == "gaussian":
            std = self.noise_args[0] if self.noise_args else 1.0
            avg = self.noise_args[1] if len(self.noise_args) > 1 else 0.0
            return imgs + self.rng.normal(avg, std, shape).astype(np.float32)
        if t == "student":
            df, std = self.noise_args[0], self.noise_args[1] if \
                len(self.noise_args) > 1 else 1.0
            avg = self.noise_args[2] if len(self.noise_args) > 2 else 0.0
            return imgs + (avg + std * self.rng.standard_t(df, shape)
                           ).astype(np.float32)
        if t == "uniform":
            lo = self.noise_args[0] if self.noise_args else 0.0
            hi = self.noise_args[1] if len(self.noise_args) > 1 else 1.0
            return imgs + self.rng.uniform(lo, hi, shape).astype(np.float32)
        raise ValueError(t)


class ProgTransformThreshold(XmippMetadataProgram):
    name = "xmipp_transform_threshold"

    def defineProcessParams(self):
        self.addUsageLine("Threshold image values (reference threshold.h:38).")
        self.addParamsLine(" --select <mode>  : Select values")
        self.addParamsLine("    where <mode>")
        self.addParamsLine("       abs_below <th> : |v| below threshold")
        self.addParamsLine("       below <th>     : v below threshold")
        self.addParamsLine("       above <th>     : v above threshold")
        self.addParamsLine("[--substitute <sub_mode=value>] : Replace by")
        self.addParamsLine("    where <sub_mode>")
        self.addParamsLine("       binarize  : selected 0, rest 1")
        self.addParamsLine("       value <new=0> : a constant")
        self.addParamsLine("       noise <avg=0> <stddev=1> : random values")

    def readProcessParams(self):
        toks = self.getListParam("--select")
        self.mode, self.th = toks[0], float(toks[1])
        stoks = self.getListParam("--substitute") or ["value", "0"]
        self.sub = stoks[0]
        self.sub_args = [float(t) for t in stoks[1:]]

    def processBatch(self, imgs, rows):
        if self.mode == "abs_below":
            sel = np.abs(imgs) < self.th
        elif self.mode == "below":
            sel = imgs < self.th
        else:
            sel = imgs > self.th
        if self.sub == "binarize":
            return np.where(sel, 0.0, 1.0).astype(np.float32)
        if self.sub == "noise":
            avg = self.sub_args[0] if self.sub_args else 0.0
            std = self.sub_args[1] if len(self.sub_args) > 1 else 1.0
            noise = np.random.default_rng(0).normal(avg, std, imgs.shape)
            return np.where(sel, noise, imgs).astype(np.float32)
        val = self.sub_args[0] if self.sub_args else 0.0
        return np.where(sel, val, imgs).astype(np.float32)


class ProgTransformMirror(XmippMetadataProgram):
    name = "xmipp_transform_mirror"

    def defineProcessParams(self):
        self.addUsageLine("Mirror images about an axis.")
        self.addParamsLine("[--flipX] : Mirror in X")
        self.addParamsLine("[--flipY] : Mirror in Y")
        self.addParamsLine("[--flipZ] : Mirror in Z (volumes)")

    def readProcessParams(self):
        self.fx = self.checkParam("--flipX")
        self.fy = self.checkParam("--flipY")
        self.fz = self.checkParam("--flipZ")

    def processBatch(self, imgs, rows):
        out = imgs
        if self.fx:
            out = out[..., ::-1]
        if self.fy:
            out = out[..., ::-1, :]
        if self.fz and out.ndim >= 3:
            out = out[..., ::-1, :, :]
        return np.ascontiguousarray(out)


class ProgTransformRandomizePhases(XmippMetadataProgram):
    name = "xmipp_transform_randomize_phases"

    def defineProcessParams(self):
        self.addUsageLine("Randomize Fourier phases beyond a frequency "
                          "(gold-standard FSC validation input).")
        self.addParamsLine("[--freq <w=0.25>] : Digital frequency above which phases are randomized")
        self.addParamsLine("[--seed <s=0>]    : Random seed")

    def readProcessParams(self):
        self.freq = self.getDoubleParam("--freq") if self.checkParam("--freq") else 0.25
        self.seed = self.getIntParam("--seed") if self.checkParam("--seed") else 0

    def processBatch(self, imgs, rows):
        from xmipp3_tpu.ops.fourier import radial_freq_2d
        H, W = imgs.shape[-2:]
        r = radial_freq_2d(H, W)
        rng = np.random.default_rng(self.seed)
        spec = np.fft.rfft2(imgs)
        phases = rng.uniform(0, 2 * np.pi, spec.shape).astype(np.float32)
        rand = np.abs(spec) * np.exp(1j * phases)
        out_spec = np.where(r[None] > self.freq, rand, spec)
        return np.fft.irfft2(out_spec, s=(H, W)).astype(np.float32)


class ProgTransformDownsample(XmippMetadataProgram):
    name = "xmipp_transform_downsample"

    def defineProcessParams(self):
        self.addUsageLine("Downsample micrographs/images (Fourier crop).")
        self.addParamsLine(" --step <factor> : Downsampling factor (>1)")
        self.addParamsLine("[--method <mth=fourier>] : fourier | smooth")

    def readProcessParams(self):
        self.factor = self.getDoubleParam("--step")

    def processBatch(self, imgs, rows):
        H, W = imgs.shape[-2:]
        oh = int(round(H / self.factor / 2)) * 2
        ow = int(round(W / self.factor / 2)) * 2
        from xmipp3_tpu.ops.resize import fourier_resize_2d
        return np.asarray(fourier_resize_2d(imgs, oh, ow))


PROGRAM = None  # multi-program module; see registry
