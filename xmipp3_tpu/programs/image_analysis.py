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


class ProgImageSortByStatistics(XmippProgram):
    name = "xmipp_image_sort_by_statistics"

    def defineParams(self):
        self.addUsageLine("Screen particles by statistical outlier scores "
                          "(zScore over intensity/shape features).")
        self.addParamsLine("   -i <md_or_stack> : Input particles")
        self.addParamsLine("  [-o <md=\"\">]      : Output sorted metadata")
        self.addParamsLine("  [--zcut <z=-1>]   : Disable particles above this zScore")

    def run(self):
        imgs, rows = _load(self.getParam("-i"))
        B = len(imgs)
        flat = imgs.reshape(B, -1)
        feats = np.stack([
            flat.mean(axis=1), flat.std(axis=1),
            np.abs(flat).max(axis=1),
            ((flat - flat.mean(axis=1, keepdims=True)) ** 3).mean(axis=1) /
            np.maximum(flat.std(axis=1) ** 3, 1e-12),          # skewness
            ((flat - flat.mean(axis=1, keepdims=True)) ** 4).mean(axis=1) /
            np.maximum(flat.std(axis=1) ** 4, 1e-12),          # kurtosis
        ], axis=1)
        mu = feats.mean(axis=0)
        sd = np.maximum(feats.std(axis=0), 1e-12)
        z = np.abs((feats - mu) / sd)
        zscore = z.max(axis=1)
        order = np.argsort(zscore)
        zcut = self.getDoubleParam("--zcut")
        out_rows = []
        for rank, i in enumerate(order):
            r = dict(rows[i])
            r["zScore"] = float(zscore[i])
            r["zScoreShape1"] = float(z[i, 3])
            r["zScoreSNR1"] = float(z[i, 1])
            if zcut > 0:
                r["enabled"] = 1 if zscore[i] <= zcut else -1
            out_rows.append(r)
        md = MetaData.fromRows(out_rows)
        fn_out = self.getParam("-o") if self.checkParam("-o") and \
            self.getParam("-o") else self.getParam("-i")
        md.write(fn_out)
        self.zscores = zscore


class ProgImageFindCenter(XmippProgram):
    name = "xmipp_image_find_center"

    def defineParams(self):
        self.addUsageLine("Find the rotational-symmetry center of an image "
                          "(autocorrelation centroid).")
        self.addParamsLine("   -i <image> : Input image/stack")
        self.addParamsLine("  [--oroot <root=\"\">] : Output metadata rootname")

    def run(self):
        from xmipp3_tpu.ops.shift import best_shift
        imgs, rows = _load(self.getParam("-i"))
        # center = half the shift between the image and its 180° rotation
        rot180 = imgs[:, ::-1, ::-1]
        sx, sy, _ = (np.asarray(v) for v in best_shift(imgs, rot180))
        cx = -sx / 2
        cy = -sy / 2
        self.centers = np.stack([cx, cy], axis=1)
        if self.verbose:
            for i in range(len(imgs)):
                print(f"image {i + 1}: center offset ({cx[i]:.2f}, {cy[i]:.2f})")
        root = self.getParam("--oroot")
        if root:
            MetaData.fromRows([
                {**rows[i], "shiftX": float(cx[i]), "shiftY": float(cy[i])}
                for i in range(len(imgs))]).write(root + ".xmd")


class ProgImageSSNR(XmippProgram):
    name = "xmipp_image_ssnr"

    def defineParams(self):
        self.addUsageLine("Spectral SNR per image (signal vs noise band "
                          "energy ratio).")
        self.addParamsLine("   -i <md_or_stack> : Input particles")
        self.addParamsLine("  [-o <md=\"\">]      : Output metadata")
        self.addParamsLine("  [--signal_band <f1=0.02> <f2=0.25>] : Signal band")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops.fourier import radial_average_half
        imgs, rows = _load(self.getParam("-i"))
        f1 = self.getDoubleParam("--signal_band", 0)
        f2 = self.getDoubleParam("--signal_band", 1)
        spec = np.asarray(jnp.abs(jnp.fft.rfft2(jnp.asarray(imgs))) ** 2)
        nbins = imgs.shape[-1] // 2
        prof = np.asarray(radial_average_half(jnp.asarray(spec), nbins))
        freqs = (np.arange(nbins) + 0.5) * (0.5 / nbins)
        sig = prof[:, (freqs >= f1) & (freqs <= f2)].mean(axis=1)
        noise = prof[:, freqs > 0.4].mean(axis=1)
        ssnr = sig / np.maximum(noise, 1e-12)
        out_rows = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["cumulativeSSNR"] = float(ssnr[i])
            out_rows.append(d)
        md = MetaData.fromRows(out_rows)
        fn_out = self.getParam("-o") if self.checkParam("-o") and \
            self.getParam("-o") else self.getParam("-i")
        md.write(fn_out)
        self.ssnr = ssnr


class ProgEliminateEmptyParticles(XmippProgram):
    name = "xmipp_image_eliminate_empty_particles"

    def defineParams(self):
        self.addUsageLine("Flag particles with no structural content "
                          "(variance-based screening).")
        self.addParamsLine("   -i <md_or_stack> : Input particles")
        self.addParamsLine("   -o <md>          : Output metadata")
        self.addParamsLine("  [--threshold <t=1.1>] : Min center/border variance ratio")

    def run(self):
        from xmipp3_tpu.ops.mask import circular_mask
        imgs, rows = _load(self.getParam("-i"))
        H = imgs.shape[-1]
        inner = circular_mask((H, H), H // 4) > 0.5
        outer = circular_mask((H, H), H // 2 - 1) <= 0.5
        var_in = imgs[:, inner].var(axis=1)
        var_out = np.maximum(imgs[:, outer].var(axis=1), 1e-12)
        ratio = var_in / var_out
        thr = self.getDoubleParam("--threshold")
        out_rows = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["enabled"] = 1 if ratio[i] >= thr else -1
            d["zScoreSNR1"] = float(ratio[i])
            out_rows.append(d)
        MetaData.fromRows(out_rows).write(self.getParam("-o"))
        self.ratio = ratio


class ProgMatrixDimred(XmippProgram):
    name = "xmipp_matrix_dimred"

    def defineParams(self):
        self.addUsageLine("Dimensionality reduction of vector metadata.")
        self.addParamsLine("   -i <md_file>  : Metadata with classificationData vectors")
        self.addParamsLine("   -o <md_file>  : Output metadata with reduced coords")
        self.addParamsLine("  [--method <m=PCA>] : PCA|pPCA|kPCA|LE|LPP|LLE|NPE|LTSA|LLTSA|HLLE|DM|Sammon|SPE|NCA|GPLVM")
        self.addParamsLine("  [--dout <d=2>]   : Output dimension")

    def run(self):
        from xmipp3_tpu.models.dimred import reduce_dimensionality
        md = MetaData(self.getParam("-i"))
        X = np.stack([np.asarray(v, np.float64)
                      for v in md.getColumnValues("classificationData")])
        Y = reduce_dimensionality(X, self.getParam("--method"),
                                  self.getIntParam("--dout"))
        rows = []
        for k, i in enumerate(md):
            r = md.getRow(i)
            r.pop("classificationData", None)
            r["dimred"] = np.asarray(Y[k], np.float32)
            rows.append(r)
        MetaData.fromRows(rows).write(self.getParam("-o"))


class ProgImageRotationalPCA(XmippProgram):
    name = "xmipp_image_rotational_pca"

    def defineParams(self):
        self.addUsageLine("Rotation-invariant PCA basis of a particle set "
                          "(PCA over randomly rotated copies).")
        self.addParamsLine("   -i <md_or_stack> : Input particles")
        self.addParamsLine("   --oroot <root>   : Output rootname (basis stack)")
        self.addParamsLine("  [--eigenvectors <n=8>] : Number of eigenimages")
        self.addParamsLine("  [--shuffles <n=4>] : Random in-plane rotations per image")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def run(self):
        from xmipp3_tpu.ops.geo import rotate_2d
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             read_mesh_params, resolve_mesh)
        read_mesh_params(self)
        maybe_init_distributed(self)
        mesh, _ = resolve_mesh(self.mesh_mode)
        imgs, rows = _load(self.getParam("-i"))
        n_eig = self.getIntParam("--eigenvectors")
        n_shuf = self.getIntParam("--shuffles")
        rng = np.random.default_rng(0)
        expanded = [imgs]
        for _ in range(n_shuf - 1):
            angles = rng.uniform(0, 360, len(imgs)).astype(np.float32)
            expanded.append(np.asarray(rotate_2d(imgs, angles)))
        X = np.concatenate(expanded).reshape(len(imgs) * n_shuf, -1)
        H = imgs.shape[-1]
        if mesh is not None:
            # the mpi_image_rotational_pca analog
            # (image_rotational_pca.h:41): sample axis sharded over the
            # mesh, covariance accumulated with one psum, host eigh
            from xmipp3_tpu.parallel.engines import parallel_pca_components
            comps = parallel_pca_components(mesh, X, n_eig)
        else:
            from xmipp3_tpu.models.dimred import pca
            Y, model = pca(X, d=n_eig, return_model=True)
            comps = model["components"]
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
