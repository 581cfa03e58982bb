"""Remaining utility programs: transform_dimred, angular_distribution_show,
image_odd_even, transform_adjust_image_grey_levels, local_volume_adjust,
volume_local_sharpening, transform_morphology, transform_center_image.

Contracts: SURVEY.md Appendix A (transform_*, image_*, volume_* leftovers).
"""
from __future__ import annotations

import os
from functools import partial

import jax
import jax.numpy as jnp
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
        self.addParamsLine("  [--distance <d=Correlation>] : Image distance")
        self.addParamsLine("    where <d>")
        self.addParamsLine("      Euclidean   : Euclidean distance, no alignment")
        self.addParamsLine("      Correlation : Correlation after alignment (images are normalized and rotation/shift-aligned to the set average before vectorizing)")
        self.addParamsLine("  [--randomSample <file=\"\"> <num=3>] : Write a metadata sampling the reduced map on a num x num grid (nearest image per cell)")

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
        dist = (self.getParam("--distance")
                if self.checkParam("--distance") else "Correlation")
        if dist == "Correlation" and imgs.ndim == 3:
            # correlation distance = Euclidean on normalized ALIGNED images
            # (transform_dimred.cpp:61-64); align everything to the average
            from xmipp3_tpu.ops.align import iterative_align
            ref = imgs.mean(axis=0)
            imgs = np.asarray(iterative_align(ref, imgs)[-1])
            flat = imgs.reshape(len(imgs), -1).astype(np.float64)
            flat -= flat.mean(axis=1, keepdims=True)
            nrm = np.linalg.norm(flat, axis=1, keepdims=True)
            X = flat / np.maximum(nrm, 1e-12)
        else:
            X = imgs.reshape(len(imgs), -1).astype(np.float64)
        Y = reduce_dimensionality(X, self.getParam("--method"),
                                  self.getIntParam("--dout"))
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["dimred"] = np.asarray(Y[i], np.float32)
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o"))
        if self.checkParam("--randomSample") and \
                self.getParam("--randomSample", 0):
            fn_s = self.getParam("--randomSample", 0)
            num = self.getIntParam("--randomSample", 1)
            Y2 = np.asarray(Y)[:, :2]
            lo, hi = Y2.min(axis=0), Y2.max(axis=0)
            picked = []
            for gy in range(num):
                for gx in range(num):
                    c = lo + (np.array([gx, gy]) + 0.5) / num * (hi - lo)
                    k = int(np.argmin(((Y2 - c) ** 2).sum(axis=1)))
                    if k not in picked:
                        picked.append(k)
            MetaData.fromRows([out[k] for k in picked]).write(fn_s)


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
    """Full reference surface (transform_adjust_image_grey_levels.cpp:
    43-245): fit (a, b) minimizing ||a*P(rot,tilt,psi) + b -
    lowpass(I)||^2 subject to |a-1| <= --max_gray_scale and |b| <=
    --max_gray_shift * std(I); output image = (I - b)/a; a/b recorded
    as continuousA/continuousB.  The low-pass cutoff is
    --sampling/--max_resolution (raised cosine 0.02); --padding feeds
    the Fourier projector.  --Rmax is accepted for grammar parity: the
    reference builds its mask2D but both uses are dead code (cost loop
    and apply loop have the mask test commented/|| true).  TPU shape:
    the constrained fit is a batched CLOSED-FORM least squares (the
    per-image Powell AB/BA dance solves the same quadratic)."""
    name = "xmipp_transform_adjust_image_grey_levels"

    def defineProcessParams(self):
        self.addUsageLine("Adjust image grey levels to match reference "
                          "projections.")
        self.addParamsLine(" --ref <volume> : Reference volume")
        self.addParamsLine(" [--max_resolution <f=4>] : Maximum resolution (A)")
        self.addParamsLine(" [--max_gray_scale <a=0.05>] : Maximum gray scale change")
        self.addParamsLine(" [--max_gray_shift <b=0.05>] : Maximum gray shift as a factor of the image stddev")
        self.addParamsLine(" [--sampling <Ts=1>] : Sampling rate (A/px)")
        self.addParamsLine(" [--Rmax <R=-1>] : Maximum radius (px); dead in the reference cost (kept for parity)")
        self.addParamsLine(" [--padding <p=2>] : Projector padding factor")

    def readProcessParams(self):
        self.fn_ref = self.getParam("--ref")
        self.max_res = self.getDoubleParam("--max_resolution") \
            if self.checkParam("--max_resolution") else 4.0
        self.maxA = self.getDoubleParam("--max_gray_scale") \
            if self.checkParam("--max_gray_scale") else 0.05
        self.maxB = self.getDoubleParam("--max_gray_shift") \
            if self.checkParam("--max_gray_shift") else 0.05
        self.Ts = self.getDoubleParam("--sampling") \
            if self.checkParam("--sampling") else 1.0
        self.pad = self.getDoubleParam("--padding") \
            if self.checkParam("--padding") else 2.0
        self._proj = None

    def processBatch(self, imgs, rows):
        import jax.numpy as jnp

        from xmipp3_tpu.ops.fourier_filter import low_pass_mask
        from xmipp3_tpu.ops.project import FourierProjector
        if self._proj is None:
            vol = np.squeeze(Image(self.fn_ref).data).astype(np.float32)
            self._proj = FourierProjector(vol, pad_factor=self.pad)
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        proj = np.asarray(self._proj.project_euler(
            get("angleRot"), get("angleTilt"), get("anglePsi")))
        H, W = imgs.shape[-2:]
        w1 = min(self.Ts / self.max_res, 0.5)
        lp = low_pass_mask(H, W, w1, 0.02)
        ifilt = np.asarray(jnp.fft.irfft2(
            jnp.fft.rfft2(jnp.asarray(imgs)) * jnp.asarray(lp)[None],
            s=(H, W)))
        # closed-form LSQ for a*P + b ~ Ifiltered, then box clipping
        pmean = proj.mean(axis=(1, 2))
        imean = ifilt.mean(axis=(1, 2))
        pvar = np.maximum((proj ** 2).mean(axis=(1, 2)) - pmean ** 2, 1e-12)
        cov = (proj * ifilt).mean(axis=(1, 2)) - pmean * imean
        a = cov / pvar
        istd = np.maximum(imgs.std(axis=(1, 2)), 1e-12)
        a = np.clip(a, 1.0 - self.maxA, 1.0 + self.maxA)
        b = np.clip(imean - a * pmean, -self.maxB * istd,
                    self.maxB * istd)
        for i, r in enumerate(rows):
            r["continuousA"] = float(a[i])
            r["continuousB"] = float(b[i])
        return (imgs - b[:, None, None]) / a[:, None, None]


class ProgLocalVolumeAdjust(XmippProgram):
    """Full reference surface (local_volume_adjust.cpp:38-183): tile the
    volume into non-overlapping (neighborhood/sampling)^3 blocks; per
    block c = sum(V*Vref | mask==1) / sum(Vref^2 | mask==1); V /= c
    inside the mask; --save writes the per-voxel c occupancy volume;
    --sub outputs Vref*(1-M) + (Vref - min(V', Vref))*M.  TPU shape: the
    per-block sums are ONE reshape-reduce dispatch instead of the
    reference's serial block scan."""
    name = "xmipp_local_volume_adjust"

    def defineParams(self):
        self.addUsageLine("Locally adjust the grey levels of a volume to "
                          "match a reference (per-block scale).")
        self.addParamsLine("   --i1 <volume> : Reference volume")
        self.addParamsLine("   --i2 <volume> : Volume to adjust")
        self.addParamsLine("  [-o <out=output_volume.mrc>] : Output "
                           "(adjusted volume, or difference with --sub)")
        self.addParamsLine("  [--mask <mask=\"\">] : Mask for volume 1 "
                           "(adjustment happens where mask==1)")
        self.addParamsLine("  [--sampling <s=1>] : Sampling rate (A/px)")
        self.addParamsLine("  [--neighborhood <n=5>] : Side length (A) of "
                           "the cubic adjustment region")
        self.addParamsLine("  [--sub] : Output the subtraction "
                           "Vref - min(V', Vref) inside the mask")
        self.addParamsLine("  [--save <dir=\"\">] : Directory for the "
                           "Occupancy.mrc per-voxel scale volume")

    def run(self):
        import jax
        import jax.numpy as jnp
        v1 = np.squeeze(Image(self.getParam("--i1")).data).astype(np.float32)
        v2 = np.squeeze(Image(self.getParam("--i2")).data).astype(np.float32)
        if self.checkParam("--mask") and self.getParam("--mask"):
            mask = (np.squeeze(Image(self.getParam("--mask")).data)
                    > 0.5).astype(np.float32)
        else:
            mask = np.ones_like(v1)
        Ts = self.getDoubleParam("--sampling")
        npx = max(int(round(self.getDoubleParam("--neighborhood") / Ts)), 1)
        D, H, W = v2.shape
        pz, py, px = [(-s) % npx for s in (D, H, W)]
        pad = lambda x: np.pad(x, ((0, pz), (0, py), (0, px)))
        nz, ny, nx = (D + pz) // npx, (H + py) // npx, (W + px) // npx

        @jax.jit
        def adjust(v, vr, m):
            blk = lambda x: x.reshape(nz, npx, ny, npx, nx, npx)
            s_vvr = blk(v * vr * m).sum(axis=(1, 3, 5))
            s_vr2 = blk(vr * vr * m).sum(axis=(1, 3, 5))
            c = jnp.where(s_vr2 > 0, s_vvr / jnp.maximum(s_vr2, 1e-30), 0.0)
            c_full = jnp.repeat(jnp.repeat(jnp.repeat(
                c, npx, axis=0), npx, axis=1), npx, axis=2)
            v_adj = jnp.where((m == 1) & (c_full != 0), v / c_full, v)
            occup = jnp.where(m == 1, c_full, 0.0)
            return v_adj, occup

        v_adj, occup = adjust(jnp.asarray(pad(v2)), jnp.asarray(pad(v1)),
                              jnp.asarray(pad(mask)))
        v_adj = np.asarray(v_adj)[:D, :H, :W]
        occup = np.asarray(occup)[:D, :H, :W]
        if self.checkParam("--save") and self.getParam("--save"):
            save_image(os.path.join(self.getParam("--save"),
                                    "Occupancy.mrc"), occup)
        out = v_adj
        if self.checkParam("--sub"):
            out = (v1 * (1 - mask)
                   + (v1 - np.minimum(v_adj, v1)) * mask)
        fn_out = self.getParam("-o") or "output_volume.mrc"
        save_image(fn_out, out.astype(np.float32))


@partial(jax.jit, static_argnames=("shape",))
def _localdeblur_sweep(vol_j, resvol_j, res_list, wl_list, K, Ts, shape):
    """One LocalDeblur local-filtering sweep (volume_local_sharpening.cpp
    localfiltering:222-283): cosine bands centered at sampling/res with
    upper edge wL, per-voxel Gaussian weights exp(-K(res-res_map)^2) in
    resolution space (zero where res_map < 2*Ts), normalized by the
    accumulated weight."""
    D, H, W = shape
    F = jnp.fft.rfftn(vol_j)
    fz = jnp.fft.fftfreq(D).astype(jnp.float32)[:, None, None]
    fy = jnp.fft.fftfreq(H).astype(jnp.float32)[None, :, None]
    fx = jnp.fft.rfftfreq(W).astype(jnp.float32)[None, None, :]
    un = jnp.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
    inside = resvol_j >= 2.0 * Ts

    def body(carry, rw):
        acc, wsum = carry
        res, wL = rw
        w = Ts / res
        delta = jnp.maximum(wL - w, 1e-6)
        w_inf = w - delta
        h = jnp.where((un >= w_inf) & (un <= wL),
                      0.5 * (1 + jnp.cos((un - w) * jnp.pi / delta)), 0.0)
        band = jnp.fft.irfftn(F * h, s=(D, H, W))
        weight = jnp.where(inside,
                           jnp.exp(-K * (res - resvol_j) ** 2), 0.0)
        return (acc + band * weight, wsum + weight), None

    zero = jnp.zeros((D, H, W), jnp.float32)
    (acc, wsum), _ = jax.lax.scan(body, (zero, zero),
                                  (res_list, wl_list))
    return jnp.where(wsum > 0, acc / jnp.maximum(wsum, 1e-38), 0.0)


class ProgVolumeLocalSharpening(XmippProgram):
    """Full reference surface (volume_local_sharpening.cpp:46-55) and
    algorithm (run:286-407): LocalDeblur iterations — subtract the
    locally-filtered map, re-filter the residual, take a lambda step with
    a -4*sigma_outside floor, stop when the filtered-norm percentage
    stabilizes (<1% change after iteration 2); --md records the iteration
    count and the (possibly auto-set) lambda."""
    name = "xmipp_volume_local_sharpening"

    def defineParams(self):
        self.addUsageLine("Local sharpening driven by a local-resolution map "
                          "(LocalDeblur).")
        self.addParamsLine("   --vol <volume>  : Map to sharpen")
        self.addParamsLine("  [--resolution_map <res=\"\">] : Local "
                           "resolution map (Å)")
        self.addParamsLine("  [--resvol <res=\"\">] : Alias of "
                           "--resolution_map")
        self.addParamsLine("  [-o <out=sharpened.vol>] : Output")
        self.addParamsLine("  [--md <out=params.xmd>] : Sharpening params "
                           "metadata (iterations, lambda)")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")
        self.addParamsLine("  [-l <lambda=1>] : Regularization (1 = "
                           "auto-set from the first-iteration norm ratio)")
        self.addParamsLine("  [-k <K=0.025>]  : Resolution-weight width")
        self.addParamsLine("  [-i <Niter=50>] : Max iterations")
        self.addParamsLine("  [-n <threads=1>] : Host threads (device "
                           "batching replaces the thread pool)")

    def run(self):
        fn_res = self.getParam("--resolution_map") \
            if self.checkParam("--resolution_map") and \
            self.getParam("--resolution_map") else self.getParam("--resvol")
        vol = np.squeeze(Image(self.getParam("--vol")).data).astype(np.float32)
        res = np.squeeze(Image(fn_res).data).astype(np.float32)
        Ts = self.getDoubleParam("--sampling")
        lam = self.getDoubleParam("-l")
        K = self.getDoubleParam("-k") if self.checkParam("-k") else 0.025
        niter = self.getIntParam("-i") if self.checkParam("-i") else 50
        shape = vol.shape

        res = np.where((res > 0) & (res < 2 * Ts), 2 * Ts, res)
        max_res = float(res.max()) + 2.0
        min_res = 2.0 * Ts
        # dedup band list by Fourier index like the reference (idx skip)
        step = 0.2
        res_vals, wl_vals, lastidx = [], [], -1
        r = min_res
        while r < max_res:
            idx = int(round(Ts / r * shape[0]))
            if idx != lastidx:
                res_vals.append(r)
                wl_vals.append(Ts / max(r - step, 1e-3))
                lastidx = idx
            r += step
        res_list = jnp.asarray(res_vals, jnp.float32)
        wl_list = jnp.asarray(wl_vals, jnp.float32)
        resvol_j = jnp.asarray(res)

        outside = res < 2 * Ts
        desv_outside = float(vol[outside].std()) if outside.any() else 0.0

        v_orig = jnp.asarray(vol)
        filtered = v_orig
        sharpened = v_orig
        norm_orig = float(np.linalg.norm(vol))
        last_norm, last_porc = 0.0, 1.0
        converged = False
        iters_done = 0
        for i in range(1, niter + 1):
            operated = _localdeblur_sweep(filtered, resvol_j, res_list,
                                          wl_list, K, Ts, shape)
            residual = v_orig - operated
            norm = float(jnp.linalg.norm(operated))
            porc = last_norm * 100.0 / max(norm, 1e-38)
            if (porc - last_porc) < 1 and i > 2:
                converged = True
            last_norm, last_porc = norm, porc
            if i == 1 and lam == 1:
                lam = (norm_orig / max(norm, 1e-38)) / 12.0
                if self.verbose:
                    print(f"  lambda {lam}")
            filtered = _localdeblur_sweep(residual, resvol_j, res_list,
                                          wl_list, K, Ts, shape)
            vk = v_orig if i == 1 else sharpened
            sharpened = jnp.maximum(vk + lam * filtered,
                                    -4.0 * desv_outside)
            filtered = sharpened
            iters_done = i
            if converged:
                break

        save_image(self.getParam("-o"), np.asarray(sharpened, np.float32),
                   sampling=Ts)
        MetaData.fromRows([{"iterationNumber": iters_done,
                            "cost": float(lam)}]).write(
            self.getParam("--md"))


class ProgTransformMorphology(XmippMetadataProgram):
    name = "xmipp_transform_morphology"

    def defineProcessParams(self):
        self.addUsageLine("Morphological operations on binary or gray "
                          "images (transform_morphology.cpp:61-91).")
        self.addParamsLine("[--binaryOperation <op>] : Morphological operation on binary images")
        self.addParamsLine("    where <op>")
        self.addParamsLine("       dilation : Dilate white region")
        self.addParamsLine("       erosion  : Erode white region")
        self.addParamsLine("       closing  : Dilation+Erosion, removes black spots")
        self.addParamsLine("       opening  : Erosion+Dilation, removes white spots")
        self.addParamsLine("       keepBiggest : Keep the biggest connected component")
        self.addParamsLine("       removeSmall <size=10> : Remove components smaller than this size")
        self.addParamsLine("[--grayOperation <op>] : Morphological operation on gray images")
        self.addParamsLine("    where <op>")
        self.addParamsLine("       sharpening <w=1> <s=0.5> : Morphological toggle sharpening with width w and strength s")
        self.addParamsLine("[--neigh2D <n=Neigh8>] : 2D neighbourhood: Neigh4|Neigh8")
        self.addParamsLine("     requires --binaryOperation;")
        self.addParamsLine("[--neigh3D <n=Neigh18>] : 3D neighbourhood: Neigh6|Neigh18|Neigh26")
        self.addParamsLine("     requires --binaryOperation;")
        self.addParamsLine("[--size <s=1>] : Size of the structural element")
        self.addParamsLine("     requires --binaryOperation;")
        self.addParamsLine("[--count <c=0>] : Minimum required neighbors with distinct value")
        self.addParamsLine("     requires --binaryOperation;")

    def readProcessParams(self):
        self.op = None
        self.gray_op = None
        if self.checkParam("--binaryOperation"):
            toks = self.getListParam("--binaryOperation")
            self.op = toks[0]
            self.small_size = int(float(toks[1])) if len(toks) > 1 else 10
        elif self.checkParam("--grayOperation"):
            toks = self.getListParam("--grayOperation")
            self.gray_op = toks[0]
            self.gray_w = int(float(toks[1])) if len(toks) > 1 else 1
            self.gray_s = float(toks[2]) if len(toks) > 2 else 0.5
        else:
            from xmipp3_tpu.core.errors import ErrCode, XmippError
            raise XmippError(ErrCode.ARG_MISSING,
                             "--binaryOperation or --grayOperation required")
        self.size = (self.getIntParam("--size")
                     if self.checkParam("--size") else 1)
        self.count = (self.getIntParam("--count")
                      if self.checkParam("--count") else 0)
        self.neigh2d = (self.getParam("--neigh2D")
                        if self.checkParam("--neigh2D") else "Neigh8")
        self.neigh3d = (self.getParam("--neigh3D")
                        if self.checkParam("--neigh3D") else "Neigh18")

    def _structure(self, ndim):
        from scipy import ndimage
        if ndim == 2:
            conn = 1 if self.neigh2d == "Neigh4" else 2
        else:
            conn = {"Neigh6": 1, "Neigh18": 2, "Neigh26": 3}.get(
                self.neigh3d, 2)
        return ndimage.generate_binary_structure(ndim, conn)

    def _binary(self, b):
        from scipy import ndimage
        st = self._structure(b.ndim)
        it = self.size

        def dil(x):
            if self.count > 0:
                # reference dilate2D/3D count semantics: a black pixel turns
                # white only when >= count neighbors are white
                for _ in range(it):
                    xi = x.astype(np.int32)
                    nb = ndimage.convolve(xi, st.astype(np.int32),
                                          mode="constant") - xi
                    x = x | (nb >= self.count)
                return x
            return ndimage.binary_dilation(x, st, iterations=it)

        def ero(x):
            if self.count > 0:
                for _ in range(it):
                    inv = (~x).astype(np.int32)
                    nb = ndimage.convolve(inv, st.astype(np.int32),
                                          mode="constant") - inv
                    x = x & ~(nb >= self.count)
                return x
            return ndimage.binary_erosion(x, st, iterations=it)

        if self.op == "dilation":
            return dil(b)
        if self.op == "erosion":
            return ero(b)
        if self.op == "opening":
            return dil(ero(b))
        if self.op == "closing":
            return ero(dil(b))
        if self.op == "keepBiggest":
            lab, n = ndimage.label(b, structure=st)
            if n == 0:
                return b
            sizes = ndimage.sum_labels(np.ones_like(lab), lab,
                                       index=np.arange(1, n + 1))
            return lab == (1 + int(np.argmax(sizes)))
        if self.op == "removeSmall":
            lab, n = ndimage.label(b, structure=st)
            if n == 0:
                return b
            sizes = ndimage.sum_labels(np.ones_like(lab), lab,
                                       index=np.arange(1, n + 1))
            keep = np.concatenate([[False], sizes >= self.small_size])
            return keep[lab]
        raise ValueError(f"unknown binaryOperation {self.op}")

    def _sharpen(self, img):
        """Morphological toggle sharpening (Schavemaker et al. 2000):
        replace each voxel by its dilation or erosion, whichever is closer,
        blended by the strength."""
        from scipy import ndimage
        sz = 2 * self.gray_w + 1
        D = ndimage.grey_dilation(img, size=(sz,) * img.ndim)
        E = ndimage.grey_erosion(img, size=(sz,) * img.ndim)
        toggle = np.where(D - img < img - E, D, E)
        return (1.0 - self.gray_s) * img + self.gray_s * toggle

    def processBatch(self, imgs, rows):
        out = np.empty_like(imgs)
        for i in range(len(imgs)):
            if self.gray_op == "sharpening":
                out[i] = self._sharpen(imgs[i].astype(np.float64))
            else:
                out[i] = self._binary(imgs[i] > 0.5).astype(np.float32)
        return out


class ProgTransformCenterImage(XmippMetadataProgram):
    name = "xmipp_transform_center_image"

    def defineProcessParams(self):
        self.addUsageLine("Center images by the symmetry of their "
                          "autocorrelation (180° self-alignment).")
        self.addParamsLine("[--iter <n=10>] : Number of centering iterations")
        self.addParamsLine("[--limit <l=-1>] : Maximum shift allowed per iteration")
        self.addParamsLine("[--save_metadata_transform] : Save the applied shifts in the output metadata")

    def readProcessParams(self):
        self.n_iter = (self.getIntParam("--iter")
                       if self.checkParam("--iter") else 10)
        self.limit = (self.getDoubleParam("--limit")
                      if self.checkParam("--limit") else -1.0)
        self.save_transform = self.checkParam("--save_metadata_transform")

    def processBatch(self, imgs, rows):
        from xmipp3_tpu.ops.shift import best_shift
        from xmipp3_tpu.ops.fourier import fourier_shift_2d
        total_sx = np.zeros(len(imgs), np.float32)
        total_sy = np.zeros(len(imgs), np.float32)
        cur = imgs
        for _ in range(max(1, self.n_iter)):
            rot180 = cur[:, ::-1, ::-1]
            sx, sy, _ = (np.asarray(v) for v in best_shift(cur, rot180))
            dx, dy = -sx / 2, -sy / 2
            if self.limit > 0:
                dx = np.clip(dx, -self.limit, self.limit)
                dy = np.clip(dy, -self.limit, self.limit)
            if float(np.abs(dx).max()) < 0.05 and \
                    float(np.abs(dy).max()) < 0.05:
                break
            total_sx += dx.astype(np.float32)
            total_sy += dy.astype(np.float32)
            cur = np.asarray(fourier_shift_2d(imgs, total_sx, total_sy))
        if self.save_transform:
            for i, r in enumerate(rows):
                r["shiftX"] = float(total_sx[i])
                r["shiftY"] = float(total_sy[i])
        return cur


PROGRAM = None
