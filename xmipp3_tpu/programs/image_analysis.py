"""Image analysis/screening programs: vectorize, sort_by_statistics,
find_center, ssnr, eliminate_empty_particles, matrix_dimred,
image_rotational_pca.

Contracts: reference image_vectorize, image_sort_by_statistics (zscores),
image_find_center, image_ssnr, image_eliminate_empty_particles,
matrix_dimred, image_rotational_pca (SURVEY.md §2.3).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram


def _load(fn):
    from xmipp3_tpu.core.metadata_program import is_metadata_file
    if is_metadata_file(fn):
        md = MetaData(fn)
        md.removeDisabled()
        rows = list(md.iterRows())
        return load_image_rows(rows), rows
    imgs = Image.read_stack(fn)
    return imgs, [{"image": f"{i + 1:06d}@{fn}", "itemId": i + 1}
                  for i in range(len(imgs))]


class ProgImageVectorize(XmippProgram):
    name = "xmipp_image_vectorize"

    def defineParams(self):
        self.addUsageLine("Convert images <-> metadata vectors "
                          "(classificationData).")
        self.addParamsLine("   -i <input>  : Images (stack/md) or vector metadata")
        self.addParamsLine("   -o <output> : Vector metadata or image stack")
        self.addParamsLine("  [--mask <m=\"\">] : Only pixels inside this mask")

    def run(self):
        fn_in, fn_out = self.getParam("-i"), self.getParam("-o")
        if fn_out.endswith((".xmd", ".star")):
            imgs, rows = _load(fn_in)
            mask = None
            if self.checkParam("--mask") and self.getParam("--mask"):
                mask = np.squeeze(Image(self.getParam("--mask")).data) > 0.5
            out_rows = []
            for i, r in enumerate(rows):
                vec = imgs[i][mask] if mask is not None else imgs[i].ravel()
                d = dict(r)
                d["classificationData"] = vec.astype(np.float32)
                d["classificationDataSize"] = len(vec)
                out_rows.append(d)
            MetaData.fromRows(out_rows).write(fn_out)
        else:
            md = MetaData(fn_in)
            vecs = [np.asarray(v, np.float32)
                    for v in md.getColumnValues("classificationData")]
            n = int(np.sqrt(len(vecs[0])))
            save_image(fn_out, np.stack(vecs).reshape(len(vecs), n, n))


class ProgImageSortChain(XmippProgram):
    """Full reference surface (parallel/mpi_image_sort.cpp:85-260, the
    greedy similarity-chain sorter — only an MPI version exists in the
    reference): start from the first enabled image; repeatedly align every
    remaining image to the LAST sorted image (mirror-aware, circular
    mask) and append the best-correlated one, optionally centering as it
    goes.  Output: <oroot>.stk aligned chain + <oroot>.xmd with
    imageOriginal and the chain-predecessor maxCC.  TPU shape: each greedy
    step scores ALL remaining images in ONE batched aligner dispatch
    (the reference farms the per-image loop over MPI ranks)."""
    name = "xmipp_image_sort"

    def defineParams(self):
        self.addUsageLine("Sort a set of images by gradually increasing "
                          "dissimilarity to a growing aligned chain.")
        self.addParamsLine("   -i <selfile>       : Selfile of images")
        self.addParamsLine("   --oroot <rootname> : Output rootname "
                           "(.stk aligned chain + .xmd bookkeeping)")
        self.addParamsLine("  [--dont_center]     : Do not center images "
                           "as they are sorted")

    def run(self):
        from xmipp3_tpu.ops import features as _feat
        from xmipp3_tpu.ops.align import align_considering_mirrors
        from xmipp3_tpu.ops.mask import circular_mask
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        if rows and "classCount" in rows[0]:
            rows = [r for r in rows if int(r.get("classCount", 1)) > 0]
        imgs = load_image_rows(rows).astype(np.float32)
        N, H, W = imgs.shape
        center = not self.checkParam("--dont_center")
        mask = np.asarray(circular_mask((H, W), W / 2.0), np.float32)
        if center:
            imgs = np.asarray(_feat.center_translationally(imgs))
        last = imgs[0]
        order = [0]
        ccs = [1.0]
        chain = [last]
        remaining = list(range(1, N))
        while remaining:
            batch = imgs[remaining]
            psi, sx, sy, flip, corr, aligned = align_considering_mirrors(
                last * mask, batch, n_iters=3)
            corr = np.asarray(corr)
            k = int(corr.argmax())
            best = np.asarray(aligned[k])
            order.append(remaining[k])
            ccs.append(float(corr[k]))
            chain.append(best)
            last = best
            del remaining[k]
            if self.verbose:
                print(f"Images to go={len(remaining)} current "
                      f"correlation= {ccs[-1]:.4f}")
        root = self.getParam("--oroot")
        save_image(root + ".stk", np.stack(chain))
        out_rows = []
        for j, (idx, cc) in enumerate(zip(order, ccs)):
            d = dict(rows[idx])
            d["imageOriginal"] = str(d.get("image", ""))
            d["image"] = f"{j + 1:06d}@{root}.stk"
            d["maxCC"] = cc
            out_rows.append(d)
        MetaData.fromRows(out_rows).write(root + ".xmd")
        self.order = order
        self.ccs = ccs


class ProgImageSortByStatistics(XmippProgram):
    """Full reference surface (image_sort_by_statistics.cpp:55-82):
    multivariate outlier z-scores over morphology/SNR/histogram features,
    optional training set (-t) fixing the feature statistics, --percent /
    --zcut disabling, --dim pre-scaling, --addFeatures vectors
    (scoreByScreening) and --addToInput write-back."""
    name = "xmipp_image_sort_by_statistics"

    def defineParams(self):
        self.addUsageLine("Screen particles by statistical outlier scores "
                          "(zScore over intensity/shape features).")
        self.addParamsLine("   -i <md_or_stack> : Input particles")
        self.addParamsLine("  [-o <md=\"\">]      : Output sorted metadata")
        self.addParamsLine("  [-t <selfile=\"\">] : Train on this selfile "
                           "of good particles")
        self.addParamsLine("  [--zcut <z=-1>]   : Disable particles above "
                           "this zScore")
        self.addParamsLine("  [--percent <p=0>] : Disable this percentage "
                           "of largest z-scores")
        self.addParamsLine("  [--addFeatures]   : Add feature vectors to "
                           "the output metadata")
        self.addParamsLine("  [--addToInput]    : Also write the score "
                           "columns back into the input metadata")
        self.addParamsLine("  [--dim <d=50>]    : Scale images down to "
                           "this size first (-1 = no rescaling)")

    @staticmethod
    def _features(imgs):
        B = len(imgs)
        flat = imgs.reshape(B, -1)
        mu1 = flat.mean(axis=1, keepdims=True)
        sd1 = np.maximum(flat.std(axis=1), 1e-12)
        return np.stack([
            flat.mean(axis=1), flat.std(axis=1),
            np.abs(flat).max(axis=1),
            ((flat - mu1) ** 3).mean(axis=1) / sd1 ** 3,     # skewness
            ((flat - mu1) ** 4).mean(axis=1) / sd1 ** 4,     # kurtosis
        ], axis=1)

    def run(self):
        imgs, rows = _load(self.getParam("-i"))
        dim = self.getIntParam("--dim")
        if 0 < dim < imgs.shape[-1]:
            import jax.numpy as jnp
            from xmipp3_tpu.ops.resize import fourier_resize_2d
            imgs_s = np.asarray(fourier_resize_2d(jnp.asarray(imgs), dim, dim))
        else:
            imgs_s = imgs
        feats = self._features(imgs_s)
        if self.checkParam("-t") and self.getParam("-t"):
            t_imgs, _ = _load(self.getParam("-t"))
            if 0 < dim < t_imgs.shape[-1]:
                import jax.numpy as jnp
                from xmipp3_tpu.ops.resize import fourier_resize_2d
                t_imgs = np.asarray(fourier_resize_2d(jnp.asarray(t_imgs),
                                                      dim, dim))
            t_feats = self._features(t_imgs)
            mu = t_feats.mean(axis=0)
            sd = np.maximum(t_feats.std(axis=0), 1e-12)
        else:
            mu = feats.mean(axis=0)
            sd = np.maximum(feats.std(axis=0), 1e-12)
        z = np.abs((feats - mu) / sd)
        zscore = z.max(axis=1)
        order = np.argsort(zscore)
        zcut = self.getDoubleParam("--zcut")
        pct = self.getDoubleParam("--percent")
        pct_thr = (np.percentile(zscore, 100 - pct) if pct > 0
                   else np.inf)
        add_feats = self.checkParam("--addFeatures")

        def annotate(r, i):
            r["zScore"] = float(zscore[i])
            r["zScoreShape1"] = float(z[i, 3])
            r["zScoreSNR1"] = float(z[i, 1])
            if add_feats:
                r["scoreByScreening"] = feats[i].astype(np.float32)
            if zcut > 0 or pct > 0:
                bad = (zcut > 0 and zscore[i] > zcut) or zscore[i] > pct_thr
                r["enabled"] = -1 if bad else 1
            return r

        out_rows = [annotate(dict(rows[i]), i) for i in order]
        md = MetaData.fromRows(out_rows)
        fn_out = self.getParam("-o") if self.checkParam("-o") and \
            self.getParam("-o") else self.getParam("-i")
        md.write(fn_out)
        if self.checkParam("--addToInput"):
            from xmipp3_tpu.core.metadata_program import is_metadata_file
            fn_in = self.getParam("-i")
            if is_metadata_file(fn_in) and fn_in != fn_out:
                MetaData.fromRows(
                    [annotate(dict(rows[i]), i)
                     for i in range(len(rows))]).write(fn_in)
        self.zscores = zscore


class ProgImageFindCenter(XmippProgram):
    """Full reference surface (image_find_center.cpp:591-759 wrapper over
    the classic busca/ergrot code): optimize the center (x, y) of the
    --harm rotational harmonic of the average image's angular profile,
    integrated over rings --r1..--r2 (% of the radius) after --r3..--r4
    raised-cosine apodization, starting from (--x0, --y0), minimizing
    (--opt -1) or maximizing (+1).  The classic pattern search becomes a
    batched grid refinement: each shrink step evaluates all candidate
    centers in one vmapped ring-resampling dispatch."""
    name = "xmipp_image_find_center"

    def defineParams(self):
        self.addUsageLine("Find the best center of rotation of an image "
                          "or collection of images.")
        self.addParamsLine("   -i <file> : Image, stack or selfile")
        self.addParamsLine("  [--oroot <root=\"\">] : Output rootname "
                           "(<root>_center.xmd)")
        self.addParamsLine("  [--r1 <radius=15>] : Lowest integration "
                           "radius (% of image radius)")
        self.addParamsLine("  [--r2 <radius=80>] : Highest integration "
                           "radius (%)")
        self.addParamsLine("  [--r3 <radius=90>] : Lowest smoothing "
                           "radius (%)")
        self.addParamsLine("  [--r4 <radius=100>] : Highest smoothing "
                           "radius (%)")
        self.addParamsLine("  [--x0 <x=-1>] : Initial center x")
        self.addParamsLine("  [--y0 <y=-1>] : Initial center y")
        self.addParamsLine("  [--harm <n=1>] : Harmonic to optimize")
        self.addParamsLine("  [--opt <o=-1>] : -1 = minimize, +1 = "
                           "maximize the harmonic energy")

    @staticmethod
    def _harmonic_energy(img, centers, radii, ncic, n_theta=128):
        """E(c) = sum_r r*|sum_theta I(c + r e^{i theta}) e^{i n theta}|^2
        for a batch of candidate centers; one jitted dispatch."""
        import jax
        import jax.numpy as jnp
        img = jnp.asarray(img, jnp.float32)
        H, W = img.shape
        theta = jnp.arange(n_theta) * (2 * np.pi / n_theta)
        cosn = jnp.cos(ncic * theta)
        sinn = jnp.sin(ncic * theta)

        def bilinear(y, x):
            x0 = jnp.floor(x).astype(jnp.int32)
            y0 = jnp.floor(y).astype(jnp.int32)
            fx, fy = x - x0, y - y0
            v = 0.0
            for dy in (0, 1):
                for dx in (0, 1):
                    xi = jnp.clip(x0 + dx, 0, W - 1)
                    yi = jnp.clip(y0 + dy, 0, H - 1)
                    inside = ((x0 + dx >= 0) & (x0 + dx < W)
                              & (y0 + dy >= 0) & (y0 + dy < H))
                    w = (jnp.where(dx, fx, 1 - fx)
                         * jnp.where(dy, fy, 1 - fy))
                    v = v + jnp.where(inside, img[yi, xi], 0.0) * w
            return v

        def energy(c):
            xs = c[0] + radii[:, None] * jnp.cos(theta)[None, :]
            ys = c[1] + radii[:, None] * jnp.sin(theta)[None, :]
            vals = bilinear(ys, xs)                      # (R, T)
            re = vals @ cosn
            im = vals @ sinn
            return jnp.sum(radii * (re * re + im * im))

        return jax.jit(jax.vmap(energy))(jnp.asarray(centers, jnp.float32))

    def run(self):
        from xmipp3_tpu.ops.mask import circular_mask
        imgs, rows = _load(self.getParam("-i"))
        img = imgs.mean(axis=0)
        H, W = img.shape
        lo, hi = img.min(), img.max()
        img = (img - lo) * (255.0 / max(hi - lo, 1e-12))
        r1 = self.getDoubleParam("--r1") / 100.0 * W / 2.0
        r2 = self.getDoubleParam("--r2") / 100.0 * W / 2.0
        r3 = self.getDoubleParam("--r3") / 100.0 * W / 2.0
        r4 = self.getDoubleParam("--r4") / 100.0 * W / 2.0
        ncic = self.getIntParam("--harm")
        indmul = self.getIntParam("--opt")
        if np.pi / 2 * r2 / ncic < 3:
            from xmipp3_tpu.core.errors import ErrCode, XmippError
            raise XmippError(ErrCode.ARG_INCORRECT,
                             "A higher integration radius is needed "
                             "(r2>6*harm/pi)")
        # edge apodization between r3 and r4
        img = img * circular_mask((H, W), r4, inner=r3,
                                  mode="raised_cosine")
        x0 = self.getDoubleParam("--x0")
        y0 = self.getDoubleParam("--y0")
        xc = x0 if x0 >= 0 else W / 2.0
        yc = y0 if y0 >= 0 else H / 2.0
        radii = np.arange(max(r1, 1.0), max(r2, r1 + 1), 1.0
                          ).astype(np.float32)
        import jax.numpy as jnp
        radii = jnp.asarray(radii)
        delta = 2.0
        for _ in range(5):                     # DEF_IT refinement levels
            gx, gy = np.meshgrid(xc + delta * np.arange(-2, 3),
                                 yc + delta * np.arange(-2, 3))
            cand = np.stack([gx.ravel(), gy.ravel()], axis=1)
            e = np.asarray(self._harmonic_energy(img, cand, radii, ncic))
            k = int(np.argmax(e) if indmul > 0 else np.argmin(e))
            xc, yc = float(cand[k, 0]), float(cand[k, 1])
            delta *= 0.5
        self.center = (xc, yc)
        self.centers = np.asarray([[xc, yc]])
        if self.verbose:
            print(f"Optimal center coordinates: x= {xc} ,y= {yc}")
        root = self.getParam("--oroot")
        if root:
            MetaData.fromRows([{"X": xc, "Y": yc}]).write(
                root + "_center.xmd")


class ProgImageSSNR(XmippProgram):
    """Full reference surface (program_image_ssnr.cpp:31-173): signal =
    image inside a raised-cosine radius-R mask, noise = outside; SSNR =
    mean over the [fmin, fmax] band of 10*(log10 S(f) - log10 N(f)) dB,
    with --ssnrcut/--ssnrpercent disabling and --normalizessnr weights.
    One batched masked-FFT dispatch over the whole stack."""
    name = "xmipp_image_ssnr"

    def defineParams(self):
        self.addUsageLine("Analyze image SSNR (in-mask signal vs "
                          "out-of-mask noise spectra).")
        self.addParamsLine("   -i <md_or_stack> : Input particles")
        self.addParamsLine("  [-o <md=\"\">]      : Output metadata")
        self.addParamsLine("  [-R <r=-1>] : Particle radius (default "
                           "half image size)")
        self.addParamsLine("  [--Rwidth <r=3>] : Mask transition width")
        self.addParamsLine("  [--fmin <f=40>] : Minimum frequency (A)")
        self.addParamsLine("  [--fmax <f=3>]  : Maximum frequency (A)")
        self.addParamsLine("  [--sampling <Ts=1>] : Sampling (A/px)")
        self.addParamsLine("  [--ssnrcut <s=-1>] : Disable images with "
                           "SSNR below this value")
        self.addParamsLine("  [--ssnrpercent <p=-1>] : Disable images "
                           "with SSNR below this percentile")
        self.addParamsLine("  [--normalizessnr] : Write weightSSNR = "
                           "SSNR / max SSNR")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops.fourier import radial_average_half
        from xmipp3_tpu.ops.mask import circular_mask
        imgs, rows = _load(self.getParam("-i"))
        H = imgs.shape[-1]
        Rwidth = self.getDoubleParam("--Rwidth")
        R = self.getDoubleParam("-R")
        if R == -1:
            R = 0.5 * H - Rwidth
        Ts = self.getDoubleParam("--sampling")
        fmin = self.getDoubleParam("--fmin")
        fmax = self.getDoubleParam("--fmax")
        imin = int(max(3.0, 0.5 * H * (Ts / fmin)))
        imax = int(min(H - 3.0, 0.5 * H * (Ts / fmax)))
        maskS = circular_mask((H, H), R + Rwidth, inner=R - Rwidth,
                              mode="raised_cosine")
        maskN = 1.0 - maskS
        nbins = H // 2
        imax = min(imax, nbins - 1)
        sS = jnp.abs(jnp.fft.rfft2(jnp.asarray(imgs * maskS[None]))) ** 2
        sN = jnp.abs(jnp.fft.rfft2(jnp.asarray(imgs * maskN[None]))) ** 2
        profS = np.asarray(radial_average_half(sS, nbins))
        profN = np.asarray(radial_average_half(sN, nbins))
        band = slice(imin, imax + 1)
        valid = (profS[:, band] > 0) & (profN[:, band] > 0)
        terms = np.where(valid,
                         np.log10(np.maximum(profS[:, band], 1e-300))
                         - np.log10(np.maximum(profN[:, band], 1e-300)),
                         0.0)
        ssnr = terms.sum(axis=1) * 10.0 / max(imax - imin + 1, 1)
        enabled = np.asarray([int(r.get("enabled", 1)) for r in rows])
        cut = self.getDoubleParam("--ssnrcut")
        if cut > 0:
            enabled = np.where(ssnr < cut, -1, enabled)
        pct = self.getDoubleParam("--ssnrpercent")
        if pct > 0:
            srt = np.sort(ssnr)
            thr = srt[min(int(pct / 100.0 * len(srt)), len(srt) - 1)]
            enabled = np.where(ssnr < thr, -1, enabled)
        weights = None
        if self.checkParam("--normalizessnr") and ssnr.max() > 0:
            weights = ssnr / ssnr.max()
        out_rows = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["cumulativeSSNR"] = float(ssnr[i])
            d["enabled"] = int(enabled[i])
            if weights is not None:
                d["weightSSNR"] = float(weights[i])
            out_rows.append(d)
        md = MetaData.fromRows(out_rows)
        fn_out = self.getParam("-o") if self.checkParam("-o") and \
            self.getParam("-o") else self.getParam("-i")
        md.write(fn_out)
        self.ssnr = ssnr


class ProgEliminateEmptyParticles(XmippProgram):
    """Full reference surface (image_eliminate_empty_particles.cpp:33-135):
    emptiness score = inner/outer 4x4-block variance ratio (the variance
    extractor's last feature) of the centered, bandpassed (and optionally
    Gaussian-denoised) particle; kept rows go to -o, eliminated to -e."""
    name = "xmipp_image_eliminate_empty_particles"

    def defineParams(self):
        self.addUsageLine("Eliminate empty particles (no structural "
                          "content) from a particle set.")
        self.addParamsLine("   -i <md_or_stack> : Input particles")
        self.addParamsLine("  [-o <md=output.xmd>] : Output selfile "
                           "(kept particles)")
        self.addParamsLine("  [-e <md=eliminated.xmd>] : Eliminated "
                           "particles selfile")
        self.addParamsLine("  [-t <t=-1>] : Emptiness-score threshold "
                           "(-1 = no elimination)")
        self.addParamsLine("   alias --threshold;")
        self.addParamsLine("  [--addFeatures] : Add the variance feature "
                           "vector (scoreByVariance) to the rows")
        self.addParamsLine("  [--useDenoising] : Gaussian-denoise before "
                           "computing the emptiness feature")
        self.addParamsLine("  [-d <int=50>] : Denoising strength "
                           "(real-space Gaussian sigma)")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops import features as F
        from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                                   band_pass_mask)
        imgs, rows = _load(self.getParam("-i"))
        H, W = imgs.shape[-2:]
        proc = np.asarray(F.center_translationally(imgs))
        if self.checkParam("--useDenoising"):
            from scipy.ndimage import gaussian_filter
            d = self.getIntParam("-d")
            # reference realGaussianFilter(I, d): real-space sigma = d px
            proc = np.stack([gaussian_filter(p, d / 6.0) for p in proc])
        # reference quirk: the bandpass is OUTSIDE the if (missing braces,
        # image_eliminate_empty_particles.cpp:106-108) so it always runs
        proc = np.asarray(apply_fourier_mask_2d(
            jnp.asarray(proc), band_pass_mask(H, W, 0.0, 0.1, 0.02)))
        fv = np.asarray(F.extract_variance(proc))
        ratio = fv[:, -1]
        thr = self.getDoubleParam("-t")
        kept, elim = [], []
        for i, r in enumerate(rows):
            d = dict(r)
            d["scoreByEmptiness"] = float(ratio[i])
            if self.checkParam("--addFeatures"):
                d["scoreByVariance"] = fv[i].astype(np.float32)
            (kept if thr < 0 or ratio[i] > thr else elim).append(d)
        fn_out = self.getParam("-o")
        fn_el = self.getParam("-e")
        if kept:
            MetaData.fromRows(kept).write(fn_out)
        if elim:
            MetaData.fromRows(elim).write(fn_el)
        self.ratio = ratio
        self.n_kept = len(kept)
        self.n_eliminated = len(elim)


class ProgMatrixDimred(XmippProgram):
    """Full reference surface (dimred/matrix_dimred.cpp:175-252 +
    ProgDimRed grammar :63-118): text-matrix input with --din/--samples
    dimensions, -m method selector with per-method sub-args (k, sigma, t,
    iterations, global), --dout -1 intrinsic-dimension estimation
    (CorrDim/MLE, dimred_tools.cpp:341-448), --saveMapping for the linear
    methods (Y = Xc @ M).  Extension kept: metadata input with
    classificationData vectors."""
    name = "xmipp_matrix_dimred"

    def defineParams(self):
        self.addUsageLine("Project each observation (row) of the input "
                          "matrix onto a lower dimensional space.")
        self.addParamsLine("   -i <file>  : Input matrix (text, one "
                          "observation per row) or metadata with "
                          "classificationData vectors")
        self.addParamsLine("  [-o <file=\"\">] : Output matrix / metadata")
        self.addParamsLine("  [-m <dimRefMethod=PCA>] : Dimensionality "
                          "reduction method")
        self.addParamsLine("   alias --method;")
        self.addParamsLine("      where <dimRefMethod>")
        self.addParamsLine("             PCA            : Principal Component Analysis")
        self.addParamsLine("             LTSA <k=12>    : Local Tangent Space Alignment")
        self.addParamsLine("             DM <s=1> <t=1> : Diffusion map")
        self.addParamsLine("             LLTSA <k=12>   : Linear Local Tangent Space Alignment")
        self.addParamsLine("             LPP <k=12> <s=1> : Linearity Preserving Projection")
        self.addParamsLine("             kPCA <s=1>     : Kernel PCA")
        self.addParamsLine("             pPCA <n=200>   : Probabilistic PCA")
        self.addParamsLine("             LE <k=7> <s=1> : Laplacian Eigenmap")
        self.addParamsLine("             HLLE <k=12>    : Hessian Locally Linear Embedding")
        self.addParamsLine("             SPE <k=12> <global=1> : Stochastic Proximity Embedding")
        self.addParamsLine("             NPE <k=12>     : Neighborhood Preserving Embedding")
        self.addParamsLine("             LLE <k=12>     : Locally Linear Embedding")
        self.addParamsLine("             Sammon         : Sammon mapping")
        self.addParamsLine("             NCA            : Neighborhood Component Analysis")
        self.addParamsLine("             GPLVM          : Gaussian Process Latent Variable Model")
        self.addParamsLine("  [--din <d=-1>]     : Input dimension (text input; -1 = infer)")
        self.addParamsLine("  [--samples <N=-1>] : Number of observations (text input; -1 = infer)")
        self.addParamsLine("  [--dout <d=2> <estimator=CorrDim>] : Output dimension; -1 estimates it (CorrDim or MLE)")
        self.addParamsLine("  [--saveMapping <fn=\"\">] : Save the linear mapping M (Y = Xc*M) as a text matrix (PCA, LLTSA, LPP, pPCA, NPE)")

    def run(self):
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        from xmipp3_tpu.models.dimred import (intrinsic_dimensionality,
                                              reduce_dimensionality)
        fn_in = self.getParam("-i")
        md = None
        if is_metadata_file(fn_in):
            md = MetaData(fn_in)
            X = np.stack([np.asarray(v, np.float64)
                          for v in md.getColumnValues("classificationData")])
        else:
            X = np.loadtxt(fn_in, ndmin=2)
            din = self.getIntParam("--din")
            ns = self.getIntParam("--samples")
            if din > 0 and X.shape[1] != din:
                X = X.reshape(-1, din)
            if ns > 0:
                X = X[:ns]
        method = self.getParam("-m")
        d = self.getIntParam("--dout")
        if d < 0:
            est = self.getParam("--dout", 1)
            d = max(int(round(intrinsic_dimensionality(X.copy(), est))), 1)
            if self.verbose:
                print(f"Estimated intrinsic dimension ({est}): {d}")
        # per-method sub-arguments (ProgDimRed::readParams)
        kw = {}
        if method in ("LTSA", "LLTSA", "LPP", "LE", "HLLE", "NPE", "SPE"):
            try:
                kw["k"] = self.getIntParam("-m", 1)
            except Exception:
                pass
        if method in ("DM", "kPCA"):
            try:
                kw["sigma"] = self.getDoubleParam("-m", 1)
            except Exception:
                pass
        if method in ("LPP", "LE"):
            try:
                kw["sigma"] = self.getDoubleParam("-m", 2)
            except Exception:
                pass
        if method == "DM":
            try:
                kw["t"] = self.getDoubleParam("-m", 2)
            except Exception:
                pass
        if method == "pPCA":
            try:
                kw["n_iters"] = self.getIntParam("-m", 1)
            except Exception:
                pass
        kw = {k: v for k, v in kw.items() if v is not None}
        try:
            Y = reduce_dimensionality(X, method, d, **kw)
        except TypeError:
            Y = reduce_dimensionality(X, method, d)
        Y = np.asarray(Y)
        if self.checkParam("--saveMapping") and \
                self.getParam("--saveMapping"):
            if method not in ("PCA", "LLTSA", "LPP", "pPCA", "NPE"):
                print(f"WARNING: {method} has no linear mapping; "
                      "--saveMapping skipped")
            else:
                # linear methods satisfy Y = Xc @ M exactly; recover M by
                # least squares on the centered data
                Xc = X - X.mean(axis=0)
                M, *_ = np.linalg.lstsq(Xc, Y, rcond=None)
                np.savetxt(self.getParam("--saveMapping"), M)
        fn_out = self.getParam("-o")
        if md is not None:
            rows = []
            for k, i in enumerate(md):
                r = md.getRow(i)
                r.pop("classificationData", None)
                r["dimred"] = np.asarray(Y[k], np.float32)
                rows.append(r)
            if fn_out:
                MetaData.fromRows(rows).write(fn_out)
        elif fn_out:
            np.savetxt(fn_out, Y)
        self.Y = Y


class ProgImageRotationalPCA(XmippProgram):
    name = "xmipp_image_rotational_pca"

    def defineParams(self):
        self.addUsageLine("Rotation-invariant PCA basis of a particle set "
                          "(PCA over randomly rotated copies).")
        self.addParamsLine("   -i <md_or_stack> : Input particles")
        self.addParamsLine("   --oroot <root>   : Output rootname (basis stack)")
        self.addParamsLine("  [--eigenvectors <n=8>] : Number of eigenimages")
        self.addParamsLine("  [--shuffles <n=0>] : Random in-plane rotations "
                           "per image (0 = use the --psi_step grid)")
        self.addParamsLine("  [--iterations <n=2>] : Power-iteration "
                           "refinements of the eigenbasis")
        self.addParamsLine("  [--psi_step <a=15>] : Psi expansion step (deg)")
        self.addParamsLine("  [--max_shift_change <r=0>] : Maximum shift "
                           "perturbation (px)")
        self.addParamsLine("  [--shift_step <s=1>] : Shift expansion step")
        self.addParamsLine("  [--maxImages <n=-1>] : Use at most this many "
                           "input images")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def run(self):
        from xmipp3_tpu.ops.geo import rotate_2d, shift_2d_real
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             read_mesh_params, resolve_mesh)
        read_mesh_params(self)
        maybe_init_distributed(self)
        mesh, _ = resolve_mesh(self.mesh_mode)
        imgs, rows = _load(self.getParam("-i"))
        max_imgs = self.getIntParam("--maxImages")
        if 0 < max_imgs < len(imgs):
            imgs = imgs[:max_imgs]
        n_eig = self.getIntParam("--eigenvectors")
        n_shuf = self.getIntParam("--shuffles")
        rng = np.random.default_rng(0)
        expanded = [imgs]
        if n_shuf > 1:
            for _ in range(n_shuf - 1):
                angles = rng.uniform(0, 360, len(imgs)).astype(np.float32)
                expanded.append(np.asarray(rotate_2d(imgs, angles)))
        else:
            # deterministic rotational expansion over the psi grid +
            # shift perturbations (image_rotational_pca.cpp:96-101)
            psi_step = self.getDoubleParam("--psi_step")
            for a in np.arange(psi_step, 360.0, psi_step):
                expanded.append(np.asarray(rotate_2d(
                    imgs, np.full(len(imgs), a, np.float32))))
            msc = self.getDoubleParam("--max_shift_change")
            sst = max(self.getDoubleParam("--shift_step"), 0.5)
            if msc > 0:
                for sx in np.arange(-msc, msc + 1e-6, sst):
                    for sy in np.arange(-msc, msc + 1e-6, sst):
                        if sx == 0 and sy == 0:
                            continue
                        expanded.append(np.asarray(shift_2d_real(
                            imgs, np.full(len(imgs), sx, np.float32),
                            np.full(len(imgs), sy, np.float32))))
        X = np.concatenate(expanded).reshape(-1, imgs.shape[-2]
                                             * imgs.shape[-1])
        H = imgs.shape[-1]
        n_its = max(self.getIntParam("--iterations"), 1)
        if mesh is not None:
            # the mpi_image_rotational_pca analog
            # (image_rotational_pca.h:41): sample axis sharded over the
            # mesh, covariance accumulated with one psum, host eigh
            from xmipp3_tpu.parallel.engines import parallel_pca_components
            comps = parallel_pca_components(mesh, X, n_eig)
        else:
            # randomized SVD with --iterations power refinements (the
            # TPU-native analog of the reference's iterative H-matrix
            # scheme, image_rotational_pca.cpp --iterations)
            Xc = X - X.mean(axis=0)
            if Xc.size <= 4e7:                  # exact SVD when it fits
                _, _, vt = np.linalg.svd(Xc, full_matrices=False)
                comps = vt[:n_eig]
            else:
                G = rng.standard_normal((X.shape[1],
                                         min(n_eig + 8, min(X.shape))))
                Q = np.linalg.qr(Xc @ G)[0]
                for _ in range(n_its):
                    Q = np.linalg.qr(Xc.T @ Q)[0]
                    Q = np.linalg.qr(Xc @ Q)[0]
                _, _, vt = np.linalg.svd(Q.T @ Xc, full_matrices=False)
                comps = vt[:n_eig]
        # deterministic sign: largest-|entry| coefficient positive (the
        # serial SVD and the mesh eigh agree only up to sign)
        for k in range(len(comps)):
            j = int(np.argmax(np.abs(comps[k])))
            if comps[k][j] < 0:
                comps[k] = -comps[k]
        basis = np.asarray(comps).reshape(n_eig, H, H).astype(np.float32)
        save_image(self.getParam("--oroot") + ".stk", basis)
        self.basis = basis


class ProgEliminateByEnergy(XmippProgram):
    """Eliminate images whose variance is extreme (reference
    image_eliminate_byEnergy.cpp: z-test of sigma^2/sigma2_0 against a
    confidence bound + minimum-variance and mean-offset gates — a distinct
    criterion from image_eliminate_empty_particles)."""
    name = "xmipp_image_eliminate_byEnergy"

    def defineParams(self):
        self.addUsageLine("Eliminate images whose variance is extremely "
                          "large or small.")
        self.addParamsLine("   -i <md_file>  : Input particles")
        self.addParamsLine("   -o <md_file>  : Output metadata (disabled rows removed)")
        self.addParamsLine("  [--confidence <conf=0.99>] : Remove an image if its variance is outside this confidence beyond sigma^2_0")
        self.addParamsLine("  [--sigma2 <sigma20=1>]     : Reference variance")
        self.addParamsLine("  [--minSigma2 <sigma2=0.01>] : Minimum variance")

    def run(self):
        import scipy.stats
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        conf = self.getDoubleParam("--confidence")
        sigma20 = self.getDoubleParam("--sigma2")
        min_s2 = self.getDoubleParam("--minSigma2")
        zalpha = abs(scipy.stats.norm.ppf(conf))
        avg = imgs.mean(axis=(1, 2))
        s2 = imgs.var(axis=(1, 2))
        z = s2 / sigma20 - 1.0
        bad = ((z > zalpha) | (s2 < min_s2) | ~np.isfinite(s2)
               | (np.abs(avg) > sigma20 / 9.0))
        out = []
        for i, r in enumerate(rows):
            if not bad[i]:
                d = dict(r)
                d["enabled"] = 1
                out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o"))
        if self.verbose:
            print(f"kept {len(out)}/{len(rows)} images "
                  f"(removed {int(bad.sum())})")


PROGRAM = None
