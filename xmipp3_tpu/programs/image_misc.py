"""Image utility programs: resize, convert, header, statistics, histogram.

Contracts: reference image_resize/image_convert/image_header/image_statistics/
image_histogram program CLIs (SURVEY.md Appendix A image_*).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import XmippMetadataProgram
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.ops.resize import fourier_resize_2d, spline_resize_2d


class ProgImageResize(XmippMetadataProgram):
    name = "xmipp_image_resize"

    def defineProcessParams(self):
        self.addUsageLine("Resize images (fourier = band-limited, spline = interpolation).")
        self.addParamsLine("[--dim <x> <y=-1>]   : New dimensions")
        self.addParamsLine("[--factor <f=1>]     : Resize factor (0.5 halves)")
        self.addParamsLine("[--fourier]          : Use Fourier crop/pad (default spline)")
        self.addParamsLine("[--interp <i=spline>] : spline | linear")

    def readProcessParams(self):
        self.dim = None
        self.factor = None
        if self.checkParam("--dim"):
            x = self.getIntParam("--dim", 0)
            y = self.getIntParam("--dim", 1)
            self.dim = (x, x if y < 0 else y)
        elif self.checkParam("--factor"):
            self.factor = self.getDoubleParam("--factor")
        self.use_fourier = self.checkParam("--fourier")
        self.order = 1 if (self.checkParam("--interp") and
                           self.getParam("--interp") == "linear") else 3

    def processBatch(self, imgs, rows):
        H, W = imgs.shape[-2:]
        if self.dim:
            ow, oh = self.dim
        else:
            oh, ow = int(round(H * self.factor)), int(round(W * self.factor))
        if self.use_fourier:
            return np.asarray(fourier_resize_2d(imgs, oh, ow))
        return np.asarray(spline_resize_2d(imgs, oh, ow, order=self.order))


class ProgImageConvert(XmippMetadataProgram):
    name = "xmipp_image_convert"
    apply_geo = True   # the reference converts WITH geometry unless
    #                    --dont_apply_geo (ProgConvImg, XmippMetadataProgram)

    def defineProcessParams(self):
        self.addUsageLine("Convert between image formats (by output extension).")
        self.addParamsLine("[--type <output_type=auto>] : auto|img|stk|vol")

    def readProcessParams(self):
        pass

    def processBatch(self, imgs, rows):
        return imgs


class ProgImageHeader(XmippProgram):
    name = "xmipp_image_header"

    def defineParams(self):
        self.addUsageLine("Print image header information.")
        self.addParamsLine(" -i <input_file> : Image, stack or metadata")

    def run(self):
        fn = self.getParam("-i")
        img = Image()
        img.read(fn, header_only=True)
        n, z, y, x = img.header.shape
        print(f"Image file       : {fn}")
        print(f"Dimensions       : {n} x {z} x {y} x {x} ((N)Objects x Zdim x Ydim x Xdim)")
        print(f"Data type        : {img.header.dtype}")
        print(f"Sampling rate    : {img.header.sampling:.4f} A/px")
        print(f"Format           : {img.header.format}")


class ProgImageStatistics(XmippMetadataProgram):
    name = "xmipp_image_statistics"
    produces_an_output = False

    def defineProcessParams(self):
        self.addUsageLine("Display min/max/avg/stddev statistics of images.")

    def run(self):
        self.setup_input()
        rows = list(self.mdIn.iterRows())
        imgs = self.load_batch(rows)
        mn, mx = float(imgs.min()), float(imgs.max())
        avg, std = float(imgs.mean()), float(imgs.std())
        print(f"min= {mn:.6g} max= {mx:.6g} avg= {avg:.6g} stddev= {std:.6g}")
        self.stats = dict(min=mn, max=mx, avg=avg, stddev=std)
        out_rows = []
        for i, r in enumerate(rows):
            d = dict(r)
            d.update({"min": float(imgs[i].min()), "max": float(imgs[i].max()),
                      "avg": float(imgs[i].mean()),
                      "stddev": float(imgs[i].std())})
            out_rows.append(d)
        self.mdOut = MetaData.fromRows(out_rows)
        if self.checkParam("-o"):
            self.mdOut.write(self.getParam("-o"))


class ProgImageHistogram(XmippMetadataProgram):
    name = "xmipp_image_histogram"
    produces_an_output = False

    def defineProcessParams(self):
        self.addUsageLine("Compute the histogram of image values.")
        self.addParamsLine("[--steps <n=100>]  : Number of bins")
        self.addParamsLine("[--range <min> <max>] : Value range (default: data range)")

    def run(self):
        self.setup_input()
        rows = list(self.mdIn.iterRows())
        imgs = self.load_batch(rows)
        nbins = self.getIntParam("--steps") if self.checkParam("--steps") else 100
        if self.checkParam("--range"):
            lo = self.getDoubleParam("--range", 0)
            hi = self.getDoubleParam("--range", 1)
        else:
            lo, hi = float(imgs.min()), float(imgs.max())
        counts, edges = np.histogram(imgs, bins=nbins, range=(lo, hi))
        centers = 0.5 * (edges[:-1] + edges[1:])
        self.mdOut = MetaData.fromRows(
            [{"x": float(c), "count": int(n)} for c, n in zip(centers, counts)])
        if self.checkParam("-o"):
            self.mdOut.write(self.getParam("-o"))
        elif self.verbose:
            for c, n in zip(centers, counts):
                print(f"{c:12.5f} {n}")


PROGRAM = None  # multi-program module; see registry
