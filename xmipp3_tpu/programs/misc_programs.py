"""Remaining utility programs: transform_dimred, angular_distribution_show,
image_odd_even, transform_adjust_image_grey_levels, local_volume_adjust,
volume_local_sharpening, transform_morphology, transform_center_image.

Contracts: SURVEY.md Appendix A (transform_*, image_*, volume_* leftovers).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import (XmippMetadataProgram,
                                              load_image_rows)
from xmipp3_tpu.core.program import XmippProgram


class ProgTransformDimred(XmippProgram):
    name = "xmipp_transform_dimred"

    def defineParams(self):
        self.addUsageLine("Dimensionality reduction of an image set "
                          "(vectorize + reduce).")
        self.addParamsLine("   -i <md_or_stack> : Input images")
        self.addParamsLine("   -o <md_file>     : Output metadata with coords")
        self.addParamsLine("  [--method <m=PCA>] : PCA|pPCA|kPCA|LE|LPP|LLE|NPE|LTSA|LLTSA|HLLE|DM|Sammon|SPE|NCA|GPLVM")
        self.addParamsLine("  [--dout <d=2>]     : Output dimension")

    def run(self):
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        from xmipp3_tpu.models.dimred import reduce_dimensionality
        fn = self.getParam("-i")
        if is_metadata_file(fn):
            md = MetaData(fn)
            rows = list(md.iterRows())
            imgs = load_image_rows(rows)
        else:
            imgs = Image.read_stack(fn)
            rows = [{"image": f"{i + 1:06d}@{fn}", "itemId": i + 1}
                    for i in range(len(imgs))]
        X = imgs.reshape(len(imgs), -1).astype(np.float64)
        Y = reduce_dimensionality(X, self.getParam("--method"),
                                  self.getIntParam("--dout"))
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["dimred"] = np.asarray(Y[i], np.float32)
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o"))


class ProgAngularDistributionShow(XmippProgram):
    name = "xmipp_angular_distribution_show"

    def defineParams(self):
        self.addUsageLine("Summarize an angular distribution (direction "
                          "histogram over a sphere sampling).")
        self.addParamsLine("   -i <md_file>  : Metadata with angles")
        self.addParamsLine("   -o <md_file>  : Output distribution metadata")
        self.addParamsLine("  [--sampling <s=10>] : Bin size (deg)")
        self.addParamsLine("  [--up_down_correction] : Fold directions to "
                           "the upper hemisphere before binning")

    def run(self):
        from xmipp3_tpu.core.sampling import (Sampling,
                                              directions_from_angles)
        md = MetaData(self.getParam("-i"))
        angles = np.stack([md.getColumn("angleRot").astype(float),
                           md.getColumn("angleTilt").astype(float)], axis=1)
        d_exp = directions_from_angles(angles)
        if self.checkParam("--up_down_correction"):
            d_exp = np.where(d_exp[:, 2:3] < 0, -d_exp, d_exp)
        grid = Sampling(self.getDoubleParam("--sampling"), "c1")
        d_ref = grid.directions
        nearest = np.argmax(d_exp @ d_ref.T, axis=1)
        counts = np.bincount(nearest, minlength=len(d_ref))
        rows = []
        for k in range(len(d_ref)):
            rows.append({"angleRot": float(grid.angles[k, 0]),
                         "angleTilt": float(grid.angles[k, 1]),
                         "weight": float(counts[k]),
                         "X": d_ref[k, 0], "Y": d_ref[k, 1],
                         "Z": d_ref[k, 2]})
        MetaData.fromRows(rows).write(self.getParam("-o"))
        self.counts = counts


class ProgImageOddEven(XmippProgram):
    name = "xmipp_image_odd_even"

    def defineParams(self):
        self.addUsageLine("Split a stack/metadata into odd and even subsets "
                          "(gold-standard halves; reference image_odd_even "
                          "--img/--type/-o/-e grammar).")
        self.addParamsLine("  [-i <md_or_stack=\"\">] : Input")
        self.addParamsLine("     alias --img;")
        self.addParamsLine("  [--type <split_type=images>] : frames or "
                           "images (both split along the stack axis)")
        self.addParamsLine("  [--oroot <root=\"\">]   : Output rootname (_odd/_even)")
        self.addParamsLine("  [-o <odd=\"\">]  : Odd-half output (overrides --oroot)")
        self.addParamsLine("  [-e <even=\"\">] : Even-half output")
        self.addParamsLine("  [--sum_frames]    : Also write the two averages")

    def run(self):
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        fn = self.getParam("-i")
        root = self.getParam("--oroot")
        if is_metadata_file(fn):
            md = MetaData(fn)
            rows = list(md.iterRows())
        else:
            imgs = Image.read_stack(fn)
            rows = [{"image": f"{i + 1:06d}@{fn}", "itemId": i + 1}
                    for i in range(len(imgs))]
        odd = [r for i, r in enumerate(rows) if i % 2 == 0]
        even = [r for i, r in enumerate(rows) if i % 2 == 1]
        fn_odd = self.getParam("-o") or (root + "_odd.xmd")
        fn_even = self.getParam("-e") or (root + "_even.xmd")
        if fn_odd.endswith((".xmd", ".sel", ".star")):
            MetaData.fromRows(odd).write(fn_odd)
            MetaData.fromRows(even).write(fn_even)
        else:
            imgs = load_image_rows(rows)
            save_image(fn_odd, imgs[0::2])
            save_image(fn_even, imgs[1::2])
        if self.checkParam("--sum_frames"):
            imgs = load_image_rows(rows)
            base_o = fn_odd.rsplit(".", 1)[0]
            base_e = fn_even.rsplit(".", 1)[0]
            save_image(base_o + "_avg.mrc", imgs[0::2].mean(axis=0))
            save_image(base_e + "_avg.mrc", imgs[1::2].mean(axis=0))


class ProgAdjustGreyLevels(XmippMetadataProgram):
    name = "xmipp_transform_adjust_image_grey_levels"

    def defineProcessParams(self):
        self.addUsageLine("Adjust image grey levels to match reference "
                          "projections (a + b*I fit).")
        self.addParamsLine(" --ref <volume> : Reference volume")

    def readProcessParams(self):
        self.fn_ref = self.getParam("--ref")
        self._proj = None

    def processBatch(self, imgs, rows):
        from xmipp3_tpu.ops.project import FourierProjector
        if self._proj is None:
            vol = np.squeeze(Image(self.fn_ref).data).astype(np.float32)
            self._proj = FourierProjector(vol)
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        proj = np.asarray(self._proj.project_euler(
            get("angleRot"), get("angleTilt"), get("anglePsi")))
        pm = proj - proj.mean(axis=(1, 2), keepdims=True)
        im = imgs - imgs.mean(axis=(1, 2), keepdims=True)
        b = ((pm * im).sum(axis=(1, 2)) /
             np.maximum((im ** 2).sum(axis=(1, 2)), 1e-12))
        a = proj.mean(axis=(1, 2)) - b * imgs.mean(axis=(1, 2))
        return a[:, None, None] + b[:, None, None] * imgs


class ProgLocalVolumeAdjust(XmippProgram):
    name = "xmipp_local_volume_adjust"

    def defineParams(self):
        self.addUsageLine("Locally adjust the grey levels of a volume to "
                          "match a reference (sliding-window scale field).")
        self.addParamsLine("   --i1 <volume> : Reference volume")
        self.addParamsLine("   --i2 <volume> : Volume to adjust")
        self.addParamsLine("  [-o <out=adjusted.vol>] : Output")
        self.addParamsLine("  [--neighborhood <n=8>] : Window half-size (voxels)")

    def run(self):
        import jax.numpy as jnp
        v1 = np.squeeze(Image(self.getParam("--i1")).data).astype(np.float32)
        v2 = np.squeeze(Image(self.getParam("--i2")).data).astype(np.float32)
        n = self.getIntParam("--neighborhood")
        # box-filter moments via FFT convolution
        D = v1.shape[0]
        kern = np.zeros_like(v1)
        kern[:n, :n, :n] = 1.0
        kern = np.roll(kern, (-n // 2, -n // 2, -n // 2), axis=(0, 1, 2))
        K = jnp.fft.rfftn(jnp.asarray(kern))
        def box(x):
            return np.asarray(jnp.fft.irfftn(jnp.fft.rfftn(
                jnp.asarray(x)) * K, s=v1.shape)) / (n ** 3)
        m1, m2 = box(v1), box(v2)
        cov = box(v1 * v2) - m1 * m2
        var2 = np.maximum(box(v2 * v2) - m2 * m2, 1e-9)
        b = cov / var2
        a = m1 - b * m2
        save_image(self.getParam("-o"), a + b * v2)


class ProgVolumeLocalSharpening(XmippProgram):
    name = "xmipp_volume_local_sharpening"

    def defineParams(self):
        self.addUsageLine("Local sharpening driven by a local-resolution map "
                          "(LocalDeblur).")
        self.addParamsLine("   --vol <volume>  : Map to sharpen")
        self.addParamsLine("   --resvol <res>  : Local resolution map (Å)")
        self.addParamsLine("  [-o <out=sharpened.vol>] : Output")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")
        self.addParamsLine("  [-l <lambda=1>] : Sharpening strength")
        self.addParamsLine("  [-n <iters=3>]  : Iterations")

    def run(self):
        from xmipp3_tpu.ops.monogenic import local_filter_by_resolution
        vol = np.squeeze(Image(self.getParam("--vol")).data).astype(np.float32)
        res = np.squeeze(Image(self.getParam("--resvol")).data
                         ).astype(np.float32)
        Ts = self.getDoubleParam("--sampling")
        lam = self.getDoubleParam("-l")
        res = np.where(res <= 0, res[res > 0].max() if (res > 0).any()
                       else 2 * Ts, res)
        out = vol.copy()
        for _ in range(self.getIntParam("-n")):
            low = local_filter_by_resolution(out, res, Ts)
            out = out + lam * (vol - low)   # unsharp with local bandwidth
        save_image(self.getParam("-o"), out, sampling=Ts)


class ProgTransformMorphology(XmippMetadataProgram):
    name = "xmipp_transform_morphology"

    def defineProcessParams(self):
        self.addUsageLine("Binary morphology on masks (dilation/erosion/"
                          "opening/closing).")
        self.addParamsLine(" --binaryOperation <op> : Operation")
        self.addParamsLine("    where <op>")
        self.addParamsLine("       dilation <size=1> : Dilate")
        self.addParamsLine("       erosion <size=1>  : Erode")
        self.addParamsLine("       opening <size=1>  : Open")
        self.addParamsLine("       closing <size=1>  : Close")

    def readProcessParams(self):
        toks = self.getListParam("--binaryOperation")
        self.op = toks[0]
        self.size = int(float(toks[1])) if len(toks) > 1 else 1

    def processBatch(self, imgs, rows):
        from scipy import ndimage
        out = np.empty_like(imgs)
        for i in range(len(imgs)):
            b = imgs[i] > 0.5
            it = self.size
            if self.op == "dilation":
                r = ndimage.binary_dilation(b, iterations=it)
            elif self.op == "erosion":
                r = ndimage.binary_erosion(b, iterations=it)
            elif self.op == "opening":
                r = ndimage.binary_opening(b, iterations=it)
            else:
                r = ndimage.binary_closing(b, iterations=it)
            out[i] = r.astype(np.float32)
        return out


class ProgTransformCenterImage(XmippMetadataProgram):
    name = "xmipp_transform_center_image"

    def defineProcessParams(self):
        self.addUsageLine("Center images by the symmetry of their "
                          "autocorrelation (180° self-alignment).")

    def readProcessParams(self):
        pass

    def processBatch(self, imgs, rows):
        from xmipp3_tpu.ops.shift import best_shift
        from xmipp3_tpu.ops.fourier import fourier_shift_2d
        rot180 = imgs[:, ::-1, ::-1]
        sx, sy, _ = (np.asarray(v) for v in best_shift(imgs, rot180))
        # best_shift returns the shift registering rot180 onto img; moving the
        # image by the negative half puts the symmetry center at the origin
        return np.asarray(fourier_shift_2d(imgs, -sx / 2, -sy / 2))


PROGRAM = None
