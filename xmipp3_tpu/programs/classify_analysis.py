"""Class analysis programs: evaluate_classes, analyze_cluster,
extract_features, compare_classes, classify_first_split; volume_halves
restoration; volume_find_symmetry; xmipp_mpi_run; denoising.

Contracts: reference classify_* post-analysis set, volume_halves_restoration
(volume_halves_restoration.h:39), volume_find_symmetry, mpi_run
(parallel/mpi_run.cpp:80-160), denoising_tv script.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import (XmippMetadataProgram,
                                              load_image_rows)
from xmipp3_tpu.core.program import XmippProgram


class ProgClassifyEvaluateClasses(XmippProgram):
    name = "xmipp_classify_evaluate_classes"

    def defineParams(self):
        self.addUsageLine("Evaluate class quality: FRC-based resolution and "
                          "homogeneity of each 2D class.")
        self.addParamsLine("   -i <classes_md> : _images.xmd from a classification")
        self.addParamsLine("  [-o <md=\"\">]     : Output per-class metrics")

    def run(self):
        from xmipp3_tpu.ops.fsc import frc_2d, fsc_resolution
        from xmipp3_tpu.ops.geo import apply_md_geometry
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        registered = np.asarray(apply_md_geometry(
            imgs, get("anglePsi"), get("shiftX"), get("shiftY"),
            np.array([bool(r.get("flip", 0)) for r in rows])))
        refs = np.array([int(r.get("ref", 1)) for r in rows])
        out = []
        for k in sorted(set(refs)):
            members = registered[refs == k]
            if len(members) < 2:
                continue
            h1 = members[0::2].mean(axis=0)
            h2 = members[1::2].mean(axis=0)
            freqs, frc = frc_2d(h1, h2)
            res = fsc_resolution(np.asarray(freqs), np.asarray(frc), 0.5)
            out.append({"ref": int(k), "classCount": int(len(members)),
                        "resolutionFreqReal": float(res),
                        "weight": float(len(members) / len(rows))})
        result = MetaData.fromRows(out)
        if self.checkParam("-o") and self.getParam("-o"):
            result.write(self.getParam("-o"))
        self.metrics = out
        if self.verbose:
            for m in out:
                print(f"class {m['ref']}: n={m['classCount']} "
                      f"res={m['resolutionFreqReal']:.2f}")


class ProgClassifyAnalyzeCluster(XmippProgram):
    name = "xmipp_classify_analyze_cluster"

    def defineParams(self):
        self.addUsageLine("Score the images in a cluster according to their "
                          "PCA projection (reference ProgAnalyzeCluster, "
                          "classification/analyze_cluster.cpp:30-45).")
        self.addParamsLine("   -i <md_file>  : Class members metadata")
        self.addParamsLine("  [--ref <img=\"\">] : if given, differences are "
                           "computed with respect to this representative")
        self.addParamsLine("  [-o <md=\"\">]   : Output with zScores")
        self.addParamsLine("  [--basis <stackName=\"\">] : write the average "
                           "(image 1), standard deviation (image 2) and the "
                           "PCA basis in a stack")
        self.addParamsLine("  [--NPCA <dim=2>] : PCA dimension")
        self.addParamsLine("  [--iter <N=10>] : Number of iterations")
        self.addParamsLine("  [--maxDist <d=3>] : Mahalanobis outlier "
                           "distance; -1 = keep all")
        self.addParamsLine("  [--dontMask]  : Don't use a circular mask")

    def run(self):
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows).astype(np.float64)
        n = imgs.shape[-1]
        if self.checkParam("--ref") and self.getParam("--ref"):
            ref = np.squeeze(Image(self.getParam("--ref")).data) \
                .astype(np.float64)
            imgs = imgs - ref[None]
        mask = None
        if not self.checkParam("--dontMask"):
            yy, xx = np.mgrid[0:n, 0:n].astype(np.float64) - n // 2
            mask = (yy * yy + xx * xx) <= (n / 2) ** 2
            X = imgs[:, mask]
        else:
            X = imgs.reshape(len(imgs), -1)
        npca = max(min(self.getIntParam("--NPCA"), len(imgs) - 1), 1)
        # EM-PCA with --iter refinement steps (reference
        # PCAMahalanobisAnalyzer::learnPCABasis Niter)
        from xmipp3_tpu.models.dimred import empca
        Y, basis, _mu = empca(X, d=npca,
                              n_iters=self.getIntParam("--iter"),
                              return_basis=True)
        model = {"components": basis}
        # mahalanobis distance in PCA space
        std = Y.std(axis=0) + 1e-12
        dist = np.sqrt(((Y / std) ** 2).mean(axis=1))
        thr = self.getDoubleParam("--maxDist")
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["zScore"] = float(dist[i])
            d["enabled"] = 1 if (thr < 0 or dist[i] <= thr) else -1
            out.append(d)
        result = MetaData.fromRows(out)
        if self.checkParam("-o") and self.getParam("-o"):
            result.write(self.getParam("-o"))
        if self.checkParam("--basis") and self.getParam("--basis"):
            # avg (1), std (2), then the NPCA basis images (reference
            # --basis stack contract)
            comps = np.asarray(model["components"])[:npca]
            stack = np.zeros((2 + npca, n, n), np.float32)
            full_avg = imgs.mean(axis=0)
            full_std = imgs.std(axis=0)
            stack[0] = full_avg
            stack[1] = full_std
            for k in range(npca):
                if mask is not None:
                    img = np.zeros((n, n))
                    img[mask] = comps[k]
                else:
                    img = comps[k].reshape(n, n)
                stack[2 + k] = img
            save_image(self.getParam("--basis"), stack)
        self.distances = dist


class ProgClassifyExtractFeatures(XmippProgram):
    """Full reference surface (classify_extract_features.{h,cpp}): 7
    selectable extractor families over translationally-centered (and
    optionally TV-denoised) images, each writing its own scoreBy* vector
    label.  With no extractor flags, falls back to this framework's
    rotation-invariant ring statistics under classificationData."""
    name = "xmipp_classify_extract_features"

    def defineParams(self):
        self.addUsageLine("Extract feature vectors from images for "
                          "clustering/screening.")
        self.addParamsLine("   -i <md_or_stack> : Input images")
        self.addParamsLine("  [-o <md_file=\"\">] : Output metadata "
                           "(default: input)")
        self.addParamsLine("  [--applyDenoising] : TV-denoise before "
                           "extraction")
        self.addParamsLine("  [--entropy]        : Extract entropy features")
        self.addParamsLine("  [--granulo]        : Extract granulometry "
                           "features")
        self.addParamsLine("  [--histdist]       : Extract histogram "
                           "distances")
        self.addParamsLine("  [--lbp]            : Extract LBP features")
        self.addParamsLine("  [--ramp]           : Extract ramp coefficients")
        self.addParamsLine("  [--variance]       : Extract variance features")
        self.addParamsLine("  [--zernike]        : Extract Zernike moments")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        from xmipp3_tpu.ops import features as F
        fn = self.getParam("-i")
        if is_metadata_file(fn):
            md = MetaData(fn)
            rows = list(md.iterRows())
            imgs = load_image_rows(rows)
        else:
            imgs = Image.read_stack(fn)
            rows = [{"image": f"{i + 1:06d}@{fn}", "itemId": i + 1}
                    for i in range(len(imgs))]
        fn_out = (self.getParam("-o")
                  if self.checkParam("-o") and self.getParam("-o") else fn)
        extractors = {
            "--entropy": ("scoreByEntropy", F.extract_entropy),
            "--granulo": ("scoreByGranulo", F.extract_granulo),
            "--histdist": ("scoreByHistDist", F.extract_histdist),
            "--lbp": ("scoreByLBP", F.extract_lbp),
            "--ramp": ("scoreByRamp", F.extract_ramp),
            "--variance": ("scoreByVariance", F.extract_variance),
            "--zernike": ("scoreByZernike", F.extract_zernike),
        }
        chosen = [(lab, f) for flag, (lab, f) in extractors.items()
                  if self.checkParam(flag)]
        if not chosen:
            # framework default: rotation-invariant ring statistics
            from xmipp3_tpu.ops.polar import cartesian_to_polar
            H = imgs.shape[-1]
            pol = np.asarray(cartesian_to_polar(jnp.asarray(imgs), 2,
                                                H // 2 - 2))
            feats = np.concatenate([pol.mean(axis=2), pol.std(axis=2)],
                                   axis=1)
            out = []
            for i, r in enumerate(rows):
                d = dict(r)
                d["classificationData"] = feats[i].astype(np.float32)
                out.append(d)
            MetaData.fromRows(out).write(fn_out)
            return
        proc = np.asarray(F.center_translationally(imgs))
        if self.checkParam("--applyDenoising"):
            proc = np.asarray(F.tv_denoise_spg(proc))
        cols = {lab: np.asarray(f(proc)) for lab, f in chosen}
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            for lab, vals in cols.items():
                d[lab] = vals[i].astype(np.float32)
            out.append(d)
        MetaData.fromRows(out).write(fn_out)


class ProgClassifyCompareClasses(XmippProgram):
    """Compare two CLASSIFICATIONS (reference classify_compare_classes.cpp
    :31-137): both inputs are multi-block class metadata files
    ('classes@f' with a ref column, one 'class%06d_images@f' block per
    class); the comparison matrix counts shared image names between every
    class pair, and the text report gives the percentage flow of each
    class of one classification into the classes of the other. --append
    appends the report to the output file."""
    name = "xmipp_classify_compare_classes"

    def defineParams(self):
        self.addUsageLine("Compare two classifications: which class of "
                          "classification 1 corresponds to which of 2.")
        self.addParamsLine("   --i1 <infile1> : Classification-1 metadata")
        self.addParamsLine("   --i2 <infile2> : Classification-2 metadata")
        self.addParamsLine("   -o <outfile>  : Output text file")
        self.addParamsLine("  [--append]     : Append text to output")

    @staticmethod
    def _read_classification(fn):
        md = MetaData(fn, block="classes")
        refs = [int(v) for v in md.getColumnValues("ref")]
        members = []
        for ref in refs:
            cls = MetaData(fn, block=f"class{ref:06d}_images")
            members.append(set(str(v) for v in cls.getColumnValues("image")))
        return refs, members

    def run(self):
        fn1, fn2 = self.getParam("--i1"), self.getParam("--i2")
        ref1, mem1 = self._read_classification(fn1)
        ref2, mem2 = self._read_classification(fn2)
        cmat = np.array([[len(m1 & m2) for m2 in mem2] for m1 in mem1],
                        np.int64)
        fn_out = self.getParam("-o")
        mode = "a" if self.checkParam("--append") else "w"
        with open(fn_out, mode) as fh:
            if mode == "a":
                fh.write("\n\n" + "-" * 72 + "\n")
            fh.write(f"Comparison of {fn1} and {fn2}\n")
            fh.write(f"Analysis of {fn1} =======================\n")
            for i, ref in enumerate(ref1):
                n1 = max(len(mem1[i]), 1)
                fh.write(f"Class class{ref:06d}_images@{fn1}: "
                         f"{len(mem1[i])} images\n")
                for j in range(len(ref2)):
                    if cmat[i, j] > 0:
                        fh.write(f"   {100.0 * cmat[i, j] / n1}% are in "
                                 f"class class{j + 1:06d}_images@{fn2}\n")
            fh.write(f"\n\nAnalysis of {fn2} =======================\n")
            for j, ref in enumerate(ref2):
                n2 = max(len(mem2[j]), 1)
                fh.write(f"Class class{ref:06d}_images@{fn2}: "
                         f"{len(mem2[j])} images\n")
                for i in range(len(ref1)):
                    if cmat[i, j] > 0:
                        fh.write(f"   {100.0 * cmat[i, j] / n2}% are in "
                                 f"class class{i + 1:06d}_images@{fn1}\n")
        self.comparison_matrix = cmat


class ProgClassifyFirstSplit(XmippProgram):
    """Random-subset-reconstruction PCA split (reference
    classify_first_split.cpp:61-199): reconstruct the average volume from
    the directional classes, then --Nrec reconstructions from random
    --Nsamples-image subsets with symmetry-randomized angles (--sym);
    PCA of the (V - Vavg) difference volumes (inside an optional --mask)
    gives the heterogeneity axis; the --alpha/2 and 1-alpha/2 quantiles
    of the projections give the two split volumes v1/v2, with an x-mirror
    disambiguation via FRM volume alignment. TPU shape: each subset
    reconstruction is the batched Fourier-gridding engine; the PCA is one
    (Nrec x Nmask) gram-matrix eigendecomposition instead of the
    reference's online PCA stream."""
    name = "xmipp_classify_first_split"

    def defineParams(self):
        self.addUsageLine("Split a directional-class set into 2 volumes "
                          "along the first heterogeneity axis.")
        self.addParamsLine("   -i <metadata> : Directional classes with "
                           "angles")
        self.addParamsLine("  [--oroot <root=split>] : Output rootname")
        self.addParamsLine("  [--Nrec <n=100>]  : Number of reconstructions")
        self.addParamsLine("  [--Nsamples <n=8>] : Images per reconstruction")
        self.addParamsLine("  [--sym <sym=c1>]  : Symmetry")
        self.addParamsLine("  [--alpha <a=0.05>] : Quantile for the two "
                           "separated volumes")
        self.addParamsLine("  [--mask <type=binary_file> <file=\"\">] : "
                           "Restrict the PCA to this binary mask")

    def run(self):
        from xmipp3_tpu.core.geometry import euler_matrix, matrix_to_euler
        from xmipp3_tpu.core.sym import SymList
        from xmipp3_tpu.ops.frm import frm_align_volumes
        from xmipp3_tpu.ops.reconstruct import reconstruct_fourier
        from xmipp3_tpu.ops.geo import apply_affine_3d

        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        root = self.getParam("--oroot")
        n_rec = self.getIntParam("--Nrec")
        n_samp = min(self.getIntParam("--Nsamples"), len(rows))
        sym = self.getParam("--sym")
        alpha = self.getDoubleParam("--alpha")

        def col(k):
            return np.array([float(r.get(k, 0.0)) for r in rows], np.float32)
        rot, tilt, psi = col("angleRot"), col("angleTilt"), col("anglePsi")
        sx, sy = col("shiftX"), col("shiftY")
        flip = np.array([bool(r.get("flip", 0)) for r in rows])

        v_avg = np.asarray(reconstruct_fourier(
            imgs, rot, tilt, psi, sx, sy, flip=flip, sym=sym,
            max_freq=0.25), np.float32)
        save_image(root + "_avg.vol", v_avg)

        sl = SymList(sym)
        sym_mats = np.asarray(sl.sym_matrices())     # (Nsym, 3, 3) incl. id
        n_sym = len(sym_mats)
        mask = None
        if self.checkParam("--mask") and self.getParam("--mask", 1):
            mask = np.squeeze(Image(self.getParam("--mask", 1)).data) > 0.5
        else:
            mask = np.ones(v_avg.shape, bool)

        rng = np.random.default_rng(0)
        diffs = np.empty((n_rec, int(mask.sum())), np.float32)
        for n in range(n_rec):
            idx = rng.choice(len(rows), n_samp, replace=False)
            r_n, t_n, p_n = rot[idx].copy(), tilt[idx].copy(), psi[idx].copy()
            if n_sym > 1:
                # symmetry-randomize the subset angles
                # (classify_first_split.cpp:106-127 Euler_apply_transf)
                pick = rng.integers(0, n_sym, len(idx))
                for j, s in enumerate(pick):
                    if s > 0:
                        E = euler_matrix(r_n[j], t_n[j], p_n[j])
                        r_n[j], t_n[j], p_n[j] = matrix_to_euler(
                            E @ sym_mats[s])
            v = np.asarray(reconstruct_fourier(
                imgs[idx], r_n, t_n, p_n, sx[idx], sy[idx], flip=flip[idx],
                max_freq=0.25), np.float32)
            diffs[n] = (v - v_avg)[mask]
            if self.verbose and (n + 1) % 20 == 0:
                print(f"  reconstruction {n + 1}/{n_rec}")

        mu = diffs.mean(axis=0)
        Xc = diffs - mu
        # first principal axis via the (Nrec x Nrec) gram matrix
        G = Xc @ Xc.T
        w, U = np.linalg.eigh(G)
        c1 = Xc.T @ U[:, -1]
        c1 /= max(np.linalg.norm(c1), 1e-12)
        zn = Xc @ c1
        zs = np.sort(zn)
        z1 = float(zs[int(alpha / 2 * n_rec)])
        z2 = float(zs[min(int((1 - alpha / 2) * n_rec), n_rec - 1)])
        if self.verbose:
            print(f"z1={z1:.4f} z2={z2:.4f}")

        base = v_avg.copy()
        base[mask] += mu
        c1_vol = np.zeros_like(v_avg)
        c1_vol[mask] = c1
        v1 = base + z1 * c1_vol
        v2 = base + z2 * c1_vol
        save_image(root + "_v1.vol", v1)
        # mirror disambiguation (classify_first_split.cpp:176-194): if the
        # x-mirrored v2 aligns better to v1, keep the aligned mirror
        corr0 = float(np.corrcoef(v1.ravel(), v2.ravel())[0, 1])
        v2m = v2[:, :, ::-1].copy()
        try:
            M = frm_align_volumes(v1, v2m)
            v2m_al = np.asarray(apply_affine_3d(v2m, M[None]),
                                np.float32)[0]
        except Exception:
            v2m_al = v2m
        corr_m = float(np.corrcoef(v1.ravel(), v2m_al.ravel())[0, 1])
        if self.verbose:
            print(f"Correlation unmirrored: {corr0:.4f}\n"
                  f"Correlation   mirrored: {corr_m:.4f}")
        if corr_m > corr0:
            v2 = v2m_al
        save_image(root + "_v2.vol", v2)
        save_image(root + "_pc1.vol", (v1 - v2).astype(np.float32))
        self.v1, self.v2, self.zn = v1, v2, zn


class ProgVolumeHalvesRestoration(XmippProgram):
    """Full reference surface (volume_halves_restoration.cpp:73-86):
    real-space significance denoising (--denoising), Fourier Gaussian
    deconvolution with per-half sigma Powell fits (--deconvolution),
    a probability-weighted frequency filter bank (--filterBank) and
    difference shrinkage (--difference), under an optional mask.
    Engine: ops/halves_restoration.py (jitted device iterations)."""
    name = "xmipp_volume_halves_restoration"

    def defineParams(self):
        self.addUsageLine("Given two half maps (and an optional mask), "
                          "produce a better estimate of the volume.")
        self.addParamsLine("   --i1 <half1>  : Half map 1")
        self.addParamsLine("   --i2 <half2>  : Half map 2")
        self.addParamsLine("  [--oroot <root=volumeRestored>] : Output "
                           "rootname")
        self.addParamsLine("  [--denoising <N=0>] : Iterations of real-"
                           "space significance denoising")
        self.addParamsLine("  [--deconvolution <N=0> <sigma0=0.2> "
                           "<lambda=0.001>] : Iterations of Fourier "
                           "deconvolution, initial sigma and lambda")
        self.addParamsLine("  [--filterBank <step=0> <overlap=0.5> "
                           "<weightFun=1> <weightPower=3>] : Filter-bank "
                           "step (0,0.5), overlap (0,1), weight function "
                           "(0=mean, 1=min, 2=mean*diff) and weight power")
        self.addParamsLine("  [--difference <N=0> <K=1.5>] : Iterations "
                           "of real-space difference shrinkage and Kdiff")
        self.addParamsLine("  [--mask <type=binary_file> <file=\"\">] : "
                           "Restrict the estimate to a binary mask")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops import halves_restoration as hr

        v1 = np.squeeze(Image(self.getParam("--i1")).data).astype(np.float32)
        v2 = np.squeeze(Image(self.getParam("--i2")).data).astype(np.float32)
        shape = v1.shape
        root = self.getParam("--oroot")
        n_real = self.getIntParam("--denoising") \
            if self.checkParam("--denoising") else 0
        if self.checkParam("--deconvolution"):
            n_four = self.getIntParam("--deconvolution", 0)
            sigma0 = self.getDoubleParam("--deconvolution", 1)
            lam = self.getDoubleParam("--deconvolution", 2)
        else:
            n_four, sigma0, lam = 0, 0.2, 0.001
        if self.checkParam("--filterBank"):
            bank_step = self.getDoubleParam("--filterBank", 0)
            bank_overlap = self.getDoubleParam("--filterBank", 1)
            weight_fun = self.getIntParam("--filterBank", 2)
            weight_power = self.getDoubleParam("--filterBank", 3)
        else:
            bank_step, bank_overlap = 0.0, 0.5
            weight_fun, weight_power = 1, 3.0
        if self.checkParam("--difference"):
            n_diff = self.getIntParam("--difference", 0)
            kdiff = self.getDoubleParam("--difference", 1)
        else:
            n_diff, kdiff = 0, 1.5

        mask = np.ones(shape, np.float32)
        if self.checkParam("--mask") and self.getParam("--mask", 1):
            mask = (np.squeeze(Image(self.getParam("--mask", 1)).data)
                    > 0).astype(np.float32)

        r2 = jnp.asarray(hr.make_r2(shape))
        mask_j = jnp.asarray(mask)
        v1r = jnp.asarray(v1)
        v2r = jnp.asarray(v2)

        for it in range(n_real):
            if self.verbose:
                print(f"Denoising iteration {it}")
            s, cdf_s, n_valid = hr.estimate_s(v1r, v2r, mask_j, r2, shape)
            v1r = hr.significance_real_space(v1r, s, cdf_s, n_valid)
            v2r = hr.significance_real_space(v2r, s, cdf_s, n_valid)

        if n_four > 0:
            sig1 = sig2 = sigma0
            s = f_vol = None
            for it in range(n_four):
                if self.verbose:
                    print(f"Deconvolution iteration {it}")
                s, cdf_s, n_valid = hr.estimate_s(v1r, v2r, mask_j, r2,
                                                  shape)
                f_s, f_v1, f_v2 = hr.forward_ffts(s, v1r, v2r, shape)
                sig1, sig2 = hr.optimize_sigma(f_s, f_v1, f_v2, r2,
                                               sig1, sig2)
                if self.verbose:
                    print(f"   Deconvolving with sigma={sig1} {sig2}")
                f_vol, v1r, v2r = hr.deconvolve_s(
                    f_s, f_v1, f_v2, r2, lam, sig1, sig2, shape)
            save_image(root + "_deconvolved.vol",
                       np.asarray(s, np.float32))
            conv = hr.convolve_s(f_vol, r2, 0.5 * (sig1 + sig2), shape)
            save_image(root + "_convolved.vol",
                       np.asarray(conv, np.float32))

        if bank_step > 0:
            from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                                 resolve_mesh)
            maybe_init_distributed(self)
            mesh, mesh_mode = resolve_mesh(
                self.getParam("--mesh") if self.checkParam("--mesh")
                else "auto")
            if mesh is not None:
                if self.verbose:
                    print(f"mesh: {mesh_mode} filter bank over "
                          f"{len(mesh.devices.ravel())} devices")
                from xmipp3_tpu.parallel.engines import parallel_filter_bank
                v1r, v2r, s_bank = parallel_filter_bank(
                    mesh, v1r, v2r, r2, shape, float(bank_step),
                    float(bank_overlap), int(weight_fun),
                    float(weight_power))
            else:
                v1r, v2r, s_bank = hr.filter_bank(
                    v1r, v2r, r2, shape, float(bank_step),
                    float(bank_overlap), int(weight_fun),
                    float(weight_power))
            save_image(root + "_filterBank.vol",
                       np.asarray(s_bank, np.float32))

        for it in range(n_diff):
            if self.verbose:
                print(f"Difference iteration {it}")
            v1r, v2r = hr.evaluate_difference(v1r, v2r, mask_j, kdiff)
        if n_diff > 0:
            save_image(root + "_avgDiff.vol",
                       np.asarray(0.5 * (v1r + v2r), np.float32))

        v1r = np.asarray(v1r, np.float32)
        v2r = np.asarray(v2r, np.float32)
        save_image(root + "_restored1.vol", v1r)
        save_image(root + "_restored2.vol", v2r)
        self.restored = 0.5 * (v1r + v2r)


class ProgVolumeFindSymmetry(XmippProgram):
    """Full reference surface (volume_find_symmetry.cpp:30-429): grid or
    local Powell search for a rotational symmetry axis (--sym rot n over
    --rot/--tilt or --localRot), or for helical parameters (--sym
    helical|helicalDihedral over --rotHelical x -z, with --sym2 Cn,
    --heightFraction, --sampling, --localHelical), writing the (rot x z)
    correlation map to <o>.xmp.  The candidate evaluations are batched
    jitted resample+correlate dispatches (ops/helical.py)."""
    name = "xmipp_volume_find_symmetry"

    def defineParams(self):
        self.addUsageLine("Find a symmetry rotational axis or helical "
                          "parameters.")
        self.addParamsLine("   -i <volume>  : Input volume")
        self.addParamsLine("  [-o <md=\"\">]  : Output metadata")
        self.addParamsLine("   --sym <mode> <n=2> : rot <n> | helical | "
                           "helicalDihedral")
        self.addParamsLine("  [--sym2 <Cn=C1>] : Additional Cn symmetry "
                           "(helical modes)")
        self.addParamsLine("  [--rot <rot0=0> <rotF=355> <step=5>] : "
                           "Rotational-angle search range")
        self.addParamsLine("  [--tilt <tilt0=0> <tiltF=90> <step=5>] : "
                           "Tilt-angle search range")
        self.addParamsLine("  [--localRot <rot0> <tilt0>] : Local search "
                           "around this axis")
        self.addParamsLine("  [--useSplines] : Cubic B-spline interpolation")
        self.addParamsLine("  [-z <z0=1> <zF=10> <zstep=0.5>] : Helical "
                           "z-shift search range (Angstroms)")
        self.addParamsLine("  [--sampling <T=1>] : Sampling rate (A/pix)")
        self.addParamsLine("  [--rotHelical <rot0=-357> <rotF=357> "
                           "<step=3>] : Helical rotation search range")
        self.addParamsLine("  [--localHelical <z> <rot>] : Local search "
                           "around this helical parameter pair")
        self.addParamsLine("  [--heightFraction <f=1>] : Use this fraction "
                           "of the volume height")
        self.addParamsLine("  [--mask <type=circular> <R=-1>] : Restrict "
                           "the comparison to a mask area")
        self.addParamsLine("  [--thr <N=1>] : Host threads (device batching "
                           "replaces the thread pool)")

    def _mask(self, vol):
        from xmipp3_tpu.ops.mask import circular_mask
        if self.checkParam("--mask"):
            r = self.getDoubleParam("--mask", 1)
            return circular_mask(vol.shape, None if r == -1 else abs(r))
        return np.ones(vol.shape, np.float32)

    def _axis_corr(self, vol, mask, rot, tilt, order_n, use_splines):
        """Correlation of the volume with its n-fold symmetrized copy
        about the (rot, tilt) axis."""
        from xmipp3_tpu.core.geometry import euler_matrix
        axis = np.asarray(euler_matrix(rot, tilt, 0.0))[2]

        def rodrigues(angle_deg):
            a = np.deg2rad(angle_deg)
            kx, ky, kz = axis / max(np.linalg.norm(axis), 1e-12)
            K = np.array([[0, -kz, ky], [kz, 0, -kx], [-ky, kx, 0]])
            return np.eye(3) + np.sin(a) * K + (1 - np.cos(a)) * (K @ K)

        vsym = vol.copy()
        if use_splines:
            from scipy.ndimage import affine_transform
            c = np.asarray(vol.shape) // 2
            for n in range(1, order_n):
                R = rodrigues(360.0 / order_n * n)
                Rz = R[::-1, ::-1]          # (x,y,z) matrix in (z,y,x) index
                vsym = vsym + affine_transform(
                    vol, np.linalg.inv(Rz), offset=c - np.linalg.inv(Rz) @ c,
                    order=3, mode="constant")
        else:
            from xmipp3_tpu.ops.geo import apply_affine_3d
            mats = np.stack([rodrigues(360.0 / order_n * n)
                             for n in range(1, order_n)])
            vsym = vsym + np.asarray(apply_affine_3d(vol, mats)).sum(axis=0)
        m = mask > 0
        a = vol[m] - vol[m].mean()
        b = vsym[m] - vsym[m].mean()
        return float((a * b).sum()
                     / max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))

    def run(self):
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        mask = self._mask(vol)
        mode = self.getParam("--sym")
        fn_out = self.getParam("-o") if self.checkParam("-o") else ""
        if mode in ("helical", "helicalDihedral"):
            self._run_helical(vol, mask, mode == "helicalDihedral", fn_out)
            return
        order_n = self.getIntParam("--sym", 1)
        use_splines = self.checkParam("--useSplines")
        if self.checkParam("--localRot"):
            from scipy.optimize import minimize
            p0 = [self.getDoubleParam("--localRot", 0),
                  self.getDoubleParam("--localRot", 1)]
            res = minimize(lambda p: -self._axis_corr(
                vol, mask, p[0], p[1], order_n, use_splines), p0,
                method="Powell", options={"xtol": 0.01})
            best_rot, best_tilt = float(res.x[0]), float(res.x[1])
            best_corr = -float(res.fun)
        else:
            rots = np.arange(self.getDoubleParam("--rot", 0),
                             self.getDoubleParam("--rot", 1) + 1e-6,
                             self.getDoubleParam("--rot", 2))
            tilts = np.arange(self.getDoubleParam("--tilt", 0),
                              self.getDoubleParam("--tilt", 1) + 1e-6,
                              self.getDoubleParam("--tilt", 2))
            best_corr, best_rot, best_tilt = -1e38, 0.0, 0.0
            for r in rots:
                for t in tilts:
                    c = self._axis_corr(vol, mask, r, t, order_n,
                                        use_splines)
                    if c > best_corr:
                        best_corr, best_rot, best_tilt = c, float(r), \
                            float(t)
        from xmipp3_tpu.core.geometry import euler_matrix
        axis = np.asarray(euler_matrix(best_rot, best_tilt, 0.0))[2]
        self.best_rot, self.best_tilt = best_rot, best_tilt
        self.best_corr = best_corr
        if self.verbose:
            print(f"Symmetry axis (rot,tilt)= {best_rot} {best_tilt} --> "
                  f"{axis}")
        if fn_out:
            MetaData.fromRows([{"angleRot": best_rot,
                                "angleTilt": best_tilt,
                                "direction": np.asarray(axis, float)}]
                              ).write(fn_out)

    def _run_helical(self, vol, mask, dihedral, fn_out):
        import os
        from xmipp3_tpu.ops.helical import (helical_correlation,
                                            helical_correlation_grid)
        Ts = self.getDoubleParam("--sampling")
        hf = self.getDoubleParam("--heightFraction")
        cn = int(self.getParam("--sym2").lstrip("Cc") or 1)
        if self.checkParam("--localHelical"):
            from scipy.optimize import minimize
            z_loc = self.getDoubleParam("--localHelical", 0) / Ts
            rot_loc = self.getDoubleParam("--localHelical", 1)
            res = minimize(lambda p: -float(helical_correlation(
                vol, max(p[0], 0.1), p[1], cn=cn, dihedral=dihedral,
                height_fraction=hf, mask=mask,
                l_max=int(np.ceil(vol.shape[0] / max(z_loc * 0.5, 0.5))))),
                [z_loc, rot_loc], method="Powell",
                options={"xtol": 0.01})
            best_z, best_rot = float(res.x[0]), float(res.x[1])
            best_corr = -float(res.fun)
            cmap = None
        else:
            zs = np.arange(self.getDoubleParam("-z", 0),
                           self.getDoubleParam("-z", 1) + 1e-6,
                           self.getDoubleParam("-z", 2)) / Ts
            zs = zs[zs > 0]
            rots = np.arange(self.getDoubleParam("--rotHelical", 0),
                             self.getDoubleParam("--rotHelical", 1) + 1e-6,
                             self.getDoubleParam("--rotHelical", 2))
            cmap = helical_correlation_grid(vol, zs, rots, cn=cn,
                                            dihedral=dihedral,
                                            height_fraction=hf, mask=mask)
            ri, zi = np.unravel_index(np.argmax(cmap), cmap.shape)
            best_rot, best_z = float(rots[ri]), float(zs[zi])
            best_corr = float(cmap[ri, zi])
        self.best_z, self.best_rot = best_z * Ts, best_rot
        self.best_corr = best_corr
        if self.verbose:
            print(f"Symmetry parameters (z,rot)= {best_z * Ts} {best_rot} "
                  f"correlation={best_corr}")
        if fn_out:
            MetaData.fromRows([{"angleRot": best_rot,
                                "shiftZ": best_z * Ts}]).write(fn_out)
            if cmap is not None:
                save_image(os.path.splitext(fn_out)[0] + ".xmp",
                           cmap.astype(np.float32))


class ProgMpiRun(XmippProgram):
    name = "xmipp_mpi_run"

    def defineParams(self):
        self.addUsageLine("Execute a file of shell command lines, "
                          "distributing them over host workers (the job-farm "
                          "role of the reference's mpi_run).")
        self.addParamsLine("   -i <commands_file> : One shell command per line")
        self.addParamsLine("  [-j <threads=4>]    : Concurrent workers")

    def run(self):
        import concurrent.futures
        import subprocess
        with open(self.getParam("-i")) as f:
            cmds = [l.strip() for l in f
                    if l.strip() and not l.strip().startswith("#")]
        failures = []

        def exec_one(cmd):
            r = subprocess.run(cmd, shell=True, capture_output=True,
                               text=True)
            return cmd, r.returncode, r.stderr[-500:]

        with concurrent.futures.ThreadPoolExecutor(
                max_workers=self.getIntParam("-j")) as pool:
            for cmd, rc, err in pool.map(exec_one, cmds):
                if rc != 0:
                    failures.append((cmd, rc, err))
                if self.verbose:
                    print(f"[{'ok' if rc == 0 else 'FAIL'}] {cmd}")
        self.n_failed = len(failures)
        if failures:
            from xmipp3_tpu.core.errors import ErrCode, XmippError
            raise XmippError(ErrCode.UNCLASSIFIED,
                             f"{len(failures)}/{len(cmds)} commands failed")


class ProgDenoisingTV(XmippMetadataProgram):
    name = "xmipp_denoising_tv"

    def defineProcessParams(self):
        self.addUsageLine("Total-variation denoising of images "
                          "(Chambolle dual projection).")
        self.addParamsLine(" [--weight <w=0.1>] : Regularization strength")
        self.addParamsLine(" [--iter <n=50>]    : Iterations")

    def readProcessParams(self):
        self.weight = self.getDoubleParam("--weight")
        self.iters = self.getIntParam("--iter")

    def processBatch(self, imgs, rows):
        from xmipp3_tpu.ops.denoise import tv_denoise_2d
        return np.asarray(tv_denoise_2d(imgs, self.weight, self.iters))


class ProgClassifyFirstSplit3(XmippProgram):
    """First volume split of directional classes by stochastic 2-volume
    K-means (reference classify_first_split3.cpp: random initial split,
    reconstruct both halves, swap members whose projections correlate
    better with the other volume, with a decaying random-swap rate).

    TPU redesign: instead of one random pair + full re-reconstruction per
    iteration (reference Niter=5000 serial loop), every sweep scores ALL
    members against BOTH volumes in one batched projection pass, swaps a
    balanced set of the strongest misfits (plus a small random fraction),
    and re-reconstructs once — the same stochastic k=2 volume K-means with
    batched updates."""
    name = "xmipp_classify_first_split3"

    def defineParams(self):
        self.addUsageLine("Produce a first volume split from a set of "
                          "directional classes using K-means.")
        self.addParamsLine("   -i <metadata>  : Directional classes with angles")
        self.addParamsLine("  [--oroot <fnroot=split>] : Output rootname")
        self.addParamsLine("  [--Niter <n=5000>] : Reference-equivalent iteration count (mapped to batched sweeps)")
        self.addParamsLine("  [--sym <sym=c1>]   : Symmetry")
        self.addParamsLine("  [--mask <m=\"\">]   : (accepted; mask applied upstream)")

    def _reconstruct(self, imgs, rows, sel):
        from xmipp3_tpu.ops.reconstruct import reconstruct_fourier
        g = lambda k: np.array([float(rows[i].get(k, 0.0))
                                for i in np.flatnonzero(sel)], np.float32)
        return np.asarray(reconstruct_fourier(
            imgs[sel], g("angleRot"), g("angleTilt"), g("anglePsi"),
            g("shiftX"), g("shiftY"), sym=self.getParam("--sym"),
            max_freq=0.25, interp="tri",
            flip=g("flip").astype(bool)))

    def _correlations(self, vol, imgs, rows):
        import jax.numpy as jnp
        from xmipp3_tpu.ops.geo import apply_md_geometry
        from xmipp3_tpu.ops.project import FourierProjector
        g = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                               np.float32)
        proj = FourierProjector(vol)
        P = proj.project_euler(g("angleRot"), g("angleTilt"), g("anglePsi"))
        reg = apply_md_geometry(jnp.asarray(imgs), jnp.zeros(len(imgs)),
                                g("shiftX"), g("shiftY"),
                                flip=g("flip").astype(bool))
        a = P - P.mean(axis=(1, 2), keepdims=True)
        b = reg - reg.mean(axis=(1, 2), keepdims=True)
        num = (a * b).sum(axis=(1, 2))
        den = jnp.sqrt((a ** 2).sum(axis=(1, 2)) * (b ** 2).sum(axis=(1, 2)))
        return np.asarray(num / jnp.maximum(den, 1e-12))

    def run(self):
        rng = np.random.default_rng(0)
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        B = len(rows)
        sel1 = rng.random(B) < 0.5
        if sel1.all() or not sel1.any():
            sel1[: B // 2] = True
            sel1[B // 2:] = False
        sweeps = max(3, min(12, self.getIntParam("--Niter") // 500))
        th = 0.05
        swapped_total = 0
        for it in range(sweeps):
            v1 = self._reconstruct(imgs, rows, sel1)
            v2 = self._reconstruct(imgs, rows, ~sel1)
            c1 = self._correlations(v1, imgs, rows)
            c2 = self._correlations(v2, imgs, rows)
            want2 = sel1 & (c2 > c1)      # in set1, prefers v2
            want1 = (~sel1) & (c1 > c2)
            k = min(int(want2.sum()), int(want1.sum()))
            moved = 0
            if k > 0:
                gain2 = np.where(want2, c2 - c1, -np.inf)
                gain1 = np.where(want1, c1 - c2, -np.inf)
                idx2 = np.argsort(-gain2)[:k]
                idx1 = np.argsort(-gain1)[:k]
                sel1[idx2] = False
                sel1[idx1] = True
                moved = 2 * k
            # decaying random swap (reference th=0.05 exploratory swaps)
            nrand = max(int(th * B * (1 - it / sweeps)), 0)
            if nrand:
                i1 = np.flatnonzero(sel1)
                i2 = np.flatnonzero(~sel1)
                if len(i1) > nrand and len(i2) > nrand:
                    sw1 = rng.choice(i1, nrand, replace=False)
                    sw2 = rng.choice(i2, nrand, replace=False)
                    sel1[sw1] = False
                    sel1[sw2] = True
                    moved += 2 * nrand
            swapped_total += moved
            if self.verbose:
                print(f"  sweep {it + 1}/{sweeps}: set1={int(sel1.sum())} "
                      f"set2={int((~sel1).sum())} moved={moved}")
            if moved == 0:
                break
        root = self.getParam("--oroot")
        v1 = self._reconstruct(imgs, rows, sel1)
        v2 = self._reconstruct(imgs, rows, ~sel1)
        save_image(root + "_avg1.vol", v1)
        save_image(root + "_avg2.vol", v2)
        MetaData.fromRows([rows[i] for i in np.flatnonzero(sel1)]).write(
            root + "_avg1.xmd")
        MetaData.fromRows([rows[i] for i in np.flatnonzero(~sel1)]).write(
            root + "_avg2.xmd")
        if self.verbose:
            print(f"split: {int(sel1.sum())} / {int((~sel1).sum())} "
                  f"(total moves {swapped_total})")


PROGRAM = None
