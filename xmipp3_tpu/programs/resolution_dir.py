"""MonoDir (resolution_directional), ARMA PSD, CL2D core analysis,
angular_accuracy_pca.

Contracts: reference resolution_directional (MonoDir), ctf_estimate_psd_with_arma
(2-D ARMA spectral model), classify_CL2D_core_analysis, angular_accuracy_pca.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram


class ProgResolutionDirectional(XmippProgram):
    name = "xmipp_resolution_directional"

    def defineParams(self):
        self.addUsageLine("Directional local resolution (MonoDir): monogenic "
                          "local resolution per cone direction; outputs "
                          "radial/azimuthal anisotropy maps.")
        self.addParamsLine("   --vol <volume> : Input map")
        self.addParamsLine("  [--mask <m=\"\">] : Binary mask")
        self.addParamsLine("  [--oroot <root=monodir>] : Output rootname")
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size")
        self.addParamsLine("  [--ndirections <n=8>] : Cone directions (azimuthal)")
        self.addParamsLine("  [--cone <a=30>] : Cone half angle (deg)")
        self.addParamsLine("  [--steps <n=12>] : Frequency bands")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops.fourier import freq_grid_3d
        from xmipp3_tpu.ops.mask import circular_mask
        from xmipp3_tpu.ops.monogenic import monogenic_amplitude_3d
        vol = np.squeeze(Image(self.getParam("--vol")).data).astype(np.float32)
        Ts = self.getDoubleParam("--sampling_rate")
        D = vol.shape[0]
        if self.checkParam("--mask") and self.getParam("--mask"):
            mask = np.squeeze(Image(self.getParam("--mask")).data) > 0.5
        else:
            mask = circular_mask(vol.shape, D // 2 - 4) > 0.5
        n_dirs = self.getIntParam("--ndirections")
        cone = np.deg2rad(self.getDoubleParam("--cone"))
        n_freqs = self.getIntParam("--steps")
        fz, fy, fx = freq_grid_3d(*vol.shape)
        r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
        rr = np.where(r == 0, 1.0, r)
        freqs = np.linspace(0.05, 0.45, n_freqs)
        F = np.fft.rfftn(vol)
        res_dir = np.zeros((n_dirs,) + vol.shape, np.float32)
        # azimuthal cone directions in the xy plane
        for d in range(n_dirs):
            a = 2 * np.pi * d / n_dirs
            ux, uy, uz = np.cos(a), np.sin(a), 0.0
            cosang = np.abs((fx * ux + fy * uy + fz * uz) / rr)
            conemask = (cosang >= np.cos(cone)).astype(np.float32)
            res_map = np.full(vol.shape, Ts / freqs[0], np.float32)
            prev = mask.copy()
            for f in freqs:
                band = ((r >= f - 0.03) & (r <= f + 0.03)).astype(np.float32)
                sub = np.fft.irfftn(F * band * conemask, s=vol.shape,
                                    axes=(0, 1, 2)
                                    ).astype(np.float32)
                amp = np.asarray(monogenic_amplitude_3d(jnp.asarray(sub)))
                thr = np.percentile(amp[~mask], 95)
                resolved = mask & (amp > thr) & prev
                res_map[resolved] = Ts / f
                prev = resolved
                if not resolved.any():
                    break
            res_dir[d] = np.where(mask, res_map, 0.0)
        root = self.getParam("--oroot")
        # radial average (mean over directions) + anisotropy (spread)
        mean_res = res_dir.mean(axis=0)
        aniso = res_dir.max(axis=0) - res_dir.min(axis=0)
        save_image(root + "_radial.vol", mean_res, sampling=Ts)
        save_image(root + "_azimuthal.vol", aniso, sampling=Ts)
        self.mean_resolution = float(mean_res[mask].mean())
        self.mean_anisotropy = float(aniso[mask].mean())
        if self.verbose:
            print(f"mean directional resolution {self.mean_resolution:.2f} A"
                  f"  anisotropy {self.mean_anisotropy:.2f} A")


class ProgCTFEstimatePSDWithARMA(XmippProgram):
    name = "xmipp_ctf_estimate_psd_with_arma"

    def defineParams(self):
        self.addUsageLine("PSD estimation with a 2-D causal ARMA spectral "
                          "model (reference CausalARMA, "
                          "ctf_estimate_psd_with_arma.cpp:92: AR part by "
                          "Yule-Walker normal equations, MA part from the "
                          "AR-whitened autocovariance).")
        self.addParamsLine("   -i <micrograph> : Input micrograph")
        self.addParamsLine("   -o <psd>        : Output PSD (centered)")
        self.addParamsLine("  [--N_horizontal <n=12>] : AR order (x)")
        self.addParamsLine("  [--N_vertical <n=12>]   : AR order (y)")
        self.addParamsLine("  [--N_MA <n=6>]  : MA order (y; 0 = pure AR)")
        self.addParamsLine("  [--M_MA <n=6>]  : MA order (x; 0 = pure AR)")
        self.addParamsLine("  [--pieceDim <d=256>] : Analysis piece size")

    def run(self):
        from xmipp3_tpu.ops.arma import causal_arma_psd
        from xmipp3_tpu.ops.psd import extract_tiles
        mic = np.squeeze(Image(self.getParam("-i")).data).astype(np.float64)
        p = self.getIntParam("--pieceDim")
        tiles = extract_tiles(mic.astype(np.float32), p, 0.5)
        psd, sigma2 = causal_arma_psd(
            tiles, p, Nh=self.getIntParam("--N_horizontal"),
            Nv=self.getIntParam("--N_vertical"),
            N_MA=self.getIntParam("--N_MA"),
            M_MA=self.getIntParam("--M_MA"))
        save_image(self.getParam("-o"),
                   np.fft.fftshift(psd).astype(np.float32))
        self.sigma2 = sigma2


class ProgClassifyCL2DCoreAnalysis(XmippProgram):
    name = "xmipp_classify_CL2D_core_analysis"

    def defineParams(self):
        self.addUsageLine("Identify the stable 'core' of each CL2D class "
                          "(members consistently closest to their average).")
        self.addParamsLine("   -i <images_md> : CL2D _images.xmd")
        self.addParamsLine("   --oroot <root> : Output rootname")
        self.addParamsLine("  [--thr <t=1.5>] : Distance z-score threshold")

    def run(self):
        from xmipp3_tpu.ops.geo import apply_md_geometry
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        reg = np.asarray(apply_md_geometry(
            imgs, get("anglePsi"), get("shiftX"), get("shiftY"),
            np.array([bool(r.get("flip", 0)) for r in rows])))
        refs = np.array([int(r.get("ref", 1)) for r in rows])
        thr = self.getDoubleParam("--thr")
        out = []
        for k in sorted(set(refs)):
            sel = np.where(refs == k)[0]
            avg = reg[sel].mean(axis=0)
            d = np.linalg.norm(reg[sel].reshape(len(sel), -1) -
                               avg.ravel(), axis=1)
            z = (d - d.mean()) / max(d.std(), 1e-12)
            for i, zz in zip(sel, z):
                r = dict(rows[i])
                r["enabled"] = 1 if zz <= thr else -1
                r["zScore"] = float(zz)
                out.append(r)
        MetaData.fromRows(out).write(self.getParam("--oroot") + "_core.xmd")
        self.n_core = sum(1 for r in out if r["enabled"] == 1)


class ProgAngularAccuracyPCA(XmippProgram):
    name = "xmipp_angular_accuracy_pca"

    def defineParams(self):
        self.addUsageLine("Per-particle angular assignment accuracy via PCA "
                          "of the projection neighborhood residuals.")
        self.addParamsLine("   -i <md_file>  : Particles with poses")
        self.addParamsLine("   --ref <volume> : Reference volume")
        self.addParamsLine("  [-o <md=\"\">]   : Output with accuracy scores")
        self.addParamsLine("  [--i2 <md_file=\"\">] : Metadata with "
                           "neighbour projections to use as references "
                           "instead of reprojecting --ref")
        self.addParamsLine("  [--dim <d=-1>] : Rescale images to this size "
                           "if larger (-1 = no rescaling)")

    def run(self):
        from xmipp3_tpu.models.dimred import pca
        from xmipp3_tpu.ops.geo import apply_md_geometry
        from xmipp3_tpu.ops.project import FourierProjector
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        vol = np.squeeze(Image(self.getParam("--ref")).data).astype(np.float32)
        dim = self.getIntParam("--dim")
        if dim > 0 and imgs.shape[-1] > dim:
            import jax.numpy as jnp
            from xmipp3_tpu.ops.resize import (fourier_resize_2d,
                                               fourier_resize_3d)
            imgs = np.asarray(fourier_resize_2d(jnp.asarray(imgs), dim,
                                                dim))
            vol = np.asarray(fourier_resize_3d(jnp.asarray(vol), dim, dim,
                                               dim))
        proj = FourierProjector(vol)
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        reg = np.asarray(apply_md_geometry(
            imgs, get("anglePsi"), get("shiftX"), get("shiftY"),
            np.array([bool(r.get("flip", 0)) for r in rows])))
        if self.checkParam("--i2") and self.getParam("--i2"):
            nb = MetaData(self.getParam("--i2"))
            refs = load_image_rows(list(nb.iterRows()))[:len(rows)]
            if refs.shape[-1] != imgs.shape[-1]:
                import jax.numpy as jnp
                from xmipp3_tpu.ops.resize import fourier_resize_2d
                refs = np.asarray(fourier_resize_2d(
                    jnp.asarray(refs), imgs.shape[-1], imgs.shape[-1]))
            if len(refs) < len(rows):
                refs = np.concatenate(
                    [refs, np.repeat(refs[-1:], len(rows) - len(refs), 0)])
        else:
            refs = np.asarray(proj.project_euler(
                get("angleRot"), get("angleTilt"),
                np.zeros(len(rows), np.float32)))
        resid = (reg - refs).reshape(len(rows), -1)
        Y, model = pca(resid.astype(np.float64),
                       d=min(5, len(rows) - 1), return_model=True)
        # accuracy score: residual energy NOT explained by the common modes
        recon = Y @ model["components"]
        unexplained = np.linalg.norm(resid - model["mean"] - recon, axis=1)
        score = 1.0 / (1.0 + unexplained / max(np.median(unexplained), 1e-9))
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["scoreByPcaResidual"] = float(score[i])
            out.append(d)
        result = MetaData.fromRows(out)
        if self.checkParam("-o") and self.getParam("-o"):
            result.write(self.getParam("-o"))
        self.scores = score


PROGRAM = None


class ProgPSDEstimate(XmippProgram):
    """Periodogram PSD of a micrograph (the reference psd_estimate program,
    applications/programs/psd_estimate/psd_estimate_main.cpp over
    PSDEstimator::estimatePSD, psd_estimator.cpp:74) — DISTINCT from the
    ARMA-model program ctf_estimate_psd_with_arma."""
    name = "xmipp_psd_estimate"

    def defineParams(self):
        self.addUsageLine("Estimate the PSD of a micrograph by averaged "
                          "overlapping periodograms.")
        self.addParamsLine("   -i <input_file> : Micrograph to be analyzed")
        self.addParamsLine("   -o <output_file> : PSD to be stored")
        self.addParamsLine("  [--overlap <o=0.4>] : overlap of the patches")
        self.addParamsLine("  [--patches <x=384> <y=384>] : size of the patches")
        self.addParamsLine("  [--threads <t=4>] : for FFT (accepted for CLI parity; the FFT is batched on device)")
        self.addParamsLine("  [--skipNormalization] : if not present, FFT will be centered, and log_10 applied")

    def run(self):
        from xmipp3_tpu.core.image import Image
        from xmipp3_tpu.ops.psd import estimate_psd_reference
        mic = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        toks = self.getListParam("--patches")
        px, py = int(float(toks[0])), int(float(toks[1]))
        psd = estimate_psd_reference(
            mic, overlap=float(self.getDoubleParam("--overlap")),
            patch=(px, py),
            normalize=not self.checkParam("--skipNormalization"))
        Image(np.fft.fftshift(psd) if not self.checkParam(
            "--skipNormalization") else psd).write(self.getParam("-o"))
