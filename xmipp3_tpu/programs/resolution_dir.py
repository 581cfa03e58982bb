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


def _hemisphere_directions(n: int) -> np.ndarray:
    """n roughly-uniform unit directions on the upper hemisphere
    (Fibonacci spiral — our design for the reference's hand-tabulated
    81/47-direction set, resolution_directional.cpp:207,292)."""
    k = np.arange(n) + 0.5
    z = k / n                       # cos(tilt) in (0, 1] — upper hemisphere
    phi = np.pi * (1 + 5 ** 0.5) * k
    s = np.sqrt(np.clip(1 - z * z, 0, None))
    return np.stack([s * np.cos(phi), s * np.sin(phi), z], axis=1)


class ProgResolutionDirectional(XmippProgram):
    name = "xmipp_resolution_directional"

    def defineParams(self):
        self.addUsageLine("Directional local resolution (MonoDir): monogenic "
                          "local resolution per cone direction; outputs "
                          "radial/azimuthal/anisotropy maps (full reference "
                          "surface, resolution_directional.cpp:64-83).")
        self.addParamsLine("   --vol <volume> : Input map")
        self.addParamsLine("  [--mask <m=\"\">] : Binary mask")
        self.addParamsLine("  [--oroot <root=monodir>] : Output rootname "
                           "(default names for any map not given explicitly)")
        self.addParamsLine("  [-o <out=\"\">] : Local (mean-over-directions) "
                           "resolution volume")
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size")
        self.addParamsLine("  [--resStep <s=0.5>] : Resolution step (A)")
        self.addParamsLine("  [--volumeRadius <r=100>] : Particle radius "
                           "(px); noise is estimated outside it")
        self.addParamsLine("  [--significance <s=0.95>] : Confidence level "
                           "of the amplitude hypothesis test")
        self.addParamsLine("  [--ndirections <n=-1>] : Cone directions "
                           "(-1 = reference defaults: 81, 47 with --fast)")
        self.addParamsLine("  [--cone <a=45>] : Cone half angle (deg)")
        self.addParamsLine("  [--steps <n=12>] : Max frequency bands (cap)")
        self.addParamsLine("  [--fast] : Fast computation (fewer directions)")
        self.addParamsLine("  [--radialRes <f=\"\">] : Output radial "
                           "resolution map (directions within 45 deg of the "
                           "voxel radius vector)")
        self.addParamsLine("  [--azimuthalRes <f=\"\">] : Output azimuthal "
                           "resolution map (directions beyond 70 deg)")
        self.addParamsLine("  [--highestResolutionVol <f=\"\">] : Output "
                           "highest-resolution (5th percentile) map")
        self.addParamsLine("  [--lowestResolutionVol <f=\"\">] : Output "
                           "lowest-resolution (95th percentile) map")
        self.addParamsLine("  [--doa1 <f=\"\">] : Output anisotropy map "
                           "0.5*(p83-p17) over directions")
        self.addParamsLine("  [--doa2 <f=\"\">] : Output mean-extremes map "
                           "0.5*(p95+p05)")
        self.addParamsLine("  [--radialAzimuthalThresholds <f=\"\">] : "
                           "Metadata with the 90th-percentile radial and "
                           "azimuthal resolutions")
        self.addParamsLine("  [--radialAvG <f=\"\">] : Metadata with radial "
                           "averages of the five resolution maps")
        self.addParamsLine("  [--monores <f=\"\">] : Local resolution map "
                           "(MonoRes output) used for the radial average "
                           "and z-score (default: mean over directions)")
        self.addParamsLine("  [--prefMin <f=\"\">] : Metadata histogram of "
                           "the preferred (highest-resolution) direction")
        self.addParamsLine("  [--zScoremap <f=\"\">] : Local resolution "
                           "z-score map (|z|>3 = suspicious voxels)")
        self.addParamsLine("  [--threads <n=4>] : Accepted (XLA-managed)")

    def _out(self, flag, default):
        v = self.getParam(flag) if self.checkParam(flag) else ""
        return v or default

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
        if n_dirs <= 0:
            n_dirs = 47 if self.checkParam("--fast") else 81
        cone = np.deg2rad(self.getDoubleParam("--cone"))
        significance = self.getDoubleParam("--significance")
        r_part = min(self.getDoubleParam("--volumeRadius"), D / 2 - 1)
        # resolution sweep: maxRes = box size (A) down to 2*Ts in resStep
        # steps (reference resolution_directional.cpp:105-106), capped at
        # --steps bands
        res_step = max(self.getDoubleParam("--resStep"), 1e-3)
        res_vals = np.arange(2 * Ts, D * Ts, res_step)[::-1]
        n_cap = self.getIntParam("--steps")
        if len(res_vals) > n_cap:
            res_vals = res_vals[np.linspace(0, len(res_vals) - 1, n_cap
                                            ).astype(int)]
        freqs = Ts / res_vals                    # ascending digital freq
        fz, fy, fx = freq_grid_3d(*vol.shape)
        r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2)
        rr = np.where(r == 0, 1.0, r)
        F = np.fft.rfftn(vol)
        dirs = _hemisphere_directions(n_dirs)
        # noise region: outside the mask and beyond the particle radius
        zz, yy, xx = np.mgrid[:vol.shape[0], :vol.shape[1], :vol.shape[2]]
        rad = np.sqrt((zz - vol.shape[0] / 2) ** 2
                      + (yy - vol.shape[1] / 2) ** 2
                      + (xx - vol.shape[2] / 2) ** 2)
        pos = np.stack([xx - vol.shape[2] / 2, yy - vol.shape[1] / 2,
                        zz - vol.shape[0] / 2], axis=-1).astype(np.float32)
        pos_n = pos / np.maximum(rad, 1.0)[..., None]
        noise_reg = (~mask) & (rad > r_part)
        if not noise_reg.any():
            noise_reg = ~mask
        res_dir = np.zeros((n_dirs,) + vol.shape, np.float32)
        hw = max(0.5 * (freqs[1:] - freqs[:-1]).mean()
                 if len(freqs) > 1 else 0.03, 0.015)
        for d in range(n_dirs):
            ux, uy, uz = dirs[d]
            cosang = np.abs((fx * ux + fy * uy + fz * uz) / rr)
            conemask = (cosang >= np.cos(cone)).astype(np.float32)
            res_map = np.full(vol.shape, res_vals[0], np.float32)
            prev = mask.copy()
            for f, rv in zip(freqs, res_vals):
                band = ((r >= f - hw) & (r <= f + hw)).astype(np.float32)
                sub = np.fft.irfftn(F * band * conemask, s=vol.shape,
                                    axes=(0, 1, 2)).astype(np.float32)
                amp = np.asarray(monogenic_amplitude_3d(jnp.asarray(sub)))
                # significance-percentile of cone noise (hypothesis test)
                thr = np.percentile(amp[noise_reg], 100 * significance)
                resolved = mask & (amp > thr) & prev
                res_map[resolved] = rv
                prev = resolved
                if not resolved.any():
                    break
            res_dir[d] = np.where(mask, res_map, 0.0)
        root = self.getParam("--oroot")
        # per-voxel direction statistics (radialAzimuthalResolution,
        # resolution_directional.cpp:1078-1251)
        p05, p17, p83, p95 = np.percentile(res_dir, [5, 17, 83, 95], axis=0)
        highest = np.where(mask, p05, 0).astype(np.float32)
        lowest = np.where(mask, p95, 0).astype(np.float32)
        doa1 = np.where(mask, 0.5 * (p83 - p17), 0).astype(np.float32)
        doa2 = np.where(mask, 0.5 * (p95 + p05), 0).astype(np.float32)
        # radial/azimuthal split by angle between direction and the voxel
        # position vector (45/70 deg)
        cosvd = np.abs(np.einsum("di,zyxi->dzyx",
                                 dirs[:, [0, 1, 2]].astype(np.float32),
                                 pos_n))
        wrad = (cosvd >= np.cos(np.deg2rad(45))).astype(np.float32)
        wazi = (cosvd <= np.cos(np.deg2rad(70))).astype(np.float32)
        nrad = wrad.sum(axis=0)
        nazi = wazi.sum(axis=0)
        radial = np.where(nrad > 0, (res_dir * wrad).sum(axis=0)
                          / np.maximum(nrad, 1), doa2)
        azimuthal = np.where(nazi > 0, (res_dir * wazi).sum(axis=0)
                             / np.maximum(nazi, 1), doa2)
        radial = np.where(mask, radial, 0).astype(np.float32)
        azimuthal = np.where(mask, azimuthal, 0).astype(np.float32)
        mean_res = np.where(mask, res_dir.mean(axis=0), 0).astype(np.float32)
        if self.checkParam("--monores") and self.getParam("--monores"):
            monores = np.squeeze(Image(self.getParam("--monores")).data
                                 ).astype(np.float32)
        else:
            monores = mean_res
        # z-score of the local resolution against its radial-shell stats
        shell = np.clip(rad.astype(int), 0, D // 2)
        zmap = np.zeros_like(mean_res)
        for s in range(D // 2 + 1):
            sel = mask & (shell == s)
            if sel.sum() > 1:
                m, sd = monores[sel].mean(), monores[sel].std()
                zmap[sel] = (monores[sel] - m) / max(sd, 1e-6)
        save_image(self._out("--radialRes", root + "_radial.vol"),
                   radial, sampling=Ts)
        save_image(self._out("--azimuthalRes", root + "_azimuthal.vol"),
                   azimuthal, sampling=Ts)
        save_image(self._out("--highestResolutionVol", root + "_highest.vol"),
                   highest, sampling=Ts)
        save_image(self._out("--lowestResolutionVol", root + "_lowest.vol"),
                   lowest, sampling=Ts)
        save_image(self._out("--doa1", root + "_doa1.vol"), doa1, sampling=Ts)
        save_image(self._out("--doa2", root + "_doa2.vol"), doa2, sampling=Ts)
        save_image(self._out("-o", root + "_monores.vol"), mean_res,
                   sampling=Ts)
        if self.checkParam("--zScoremap") and self.getParam("--zScoremap"):
            save_image(self.getParam("--zScoremap"), zmap.astype(np.float32),
                       sampling=Ts)
        # 90th-percentile display thresholds
        if self.checkParam("--radialAzimuthalThresholds") and \
                self.getParam("--radialAzimuthalThresholds"):
            MetaData.fromRows([{
                "resolutionFreq": float(np.percentile(radial[mask], 90)),
                "resolutionFreq2": float(np.percentile(azimuthal[mask], 90)),
            }]).write(self.getParam("--radialAzimuthalThresholds"))
        # preferred-direction histogram: which direction attains the
        # per-voxel best (minimum) resolution, within 0.1 A
        if self.checkParam("--prefMin") and self.getParam("--prefMin"):
            best = res_dir[:, mask]                     # (ndirs, nvox)
            is_best = np.abs(best - highest[mask]) < 0.1
            counts = is_best.sum(axis=1)
            mean_per_dir = np.where(
                counts > 0, (best * is_best).sum(axis=1)
                / np.maximum(counts, 1), 0.0)
            tilt = np.degrees(np.arccos(np.clip(dirs[:, 2], -1, 1)))
            rot = np.degrees(np.arctan2(dirs[:, 1], dirs[:, 0]))
            MetaData.fromRows([
                {"angleRot": float(rot[i]), "angleTilt": float(tilt[i]),
                 "weight": float(counts[i]),
                 "resolutionFreq": float(mean_per_dir[i]),
                 "x": float(i), "count": int(counts[i])}
                for i in range(n_dirs)]).write(self.getParam("--prefMin"))
        # radial averages of the five maps
        if self.checkParam("--radialAvG") and self.getParam("--radialAvG"):
            rows = []
            for s in range(1, D // 2):
                sel = mask & (np.abs(rad - s) <= 1)
                if not sel.any():
                    continue
                rows.append({"resolutionFreq": float(s),
                             "resolutionFreqReal": float(radial[sel].mean()),
                             "resolutionFreq2": float(azimuthal[sel].mean()),
                             "resolutionFreqMin": float(highest[sel].mean()),
                             "resolutionFreqMax": float(lowest[sel].mean()),
                             "resolutionLocal": float(monores[sel].mean())})
            MetaData.fromRows(rows).write(self.getParam("--radialAvG"))
        self.mean_resolution = float(mean_res[mask].mean())
        self.mean_anisotropy = float(doa1[mask].mean())
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
    """Full reference surface (mpi_classify_CL2D_core_analysis.cpp:54-94):
    walks the CL2D hierarchy <dir>/level_%02d/<root>_classes.xmd and
    either (--computeCore <thPCAZscore> <NPCA>) removes PCA-Mahalanobis
    outliers from every class block, writing <root>_classes_core.xmd per
    level, or (--computeStableCore <tolerance>) keeps only images whose
    pairwise coocurrence across all lower levels is maximal
    (level - tolerance), writing <root>_classes_stable_core.xmd.
    The MPI task distributor becomes a flat loop: each class's PCA is one
    batched device computation."""
    name = "xmipp_classify_CL2D_core_analysis"

    def defineParams(self):
        self.addUsageLine("Compute the class cores (PCA-outlier removal) "
                          "or stable cores (coocurrence across levels) of "
                          "a CL2D hierarchy.")
        self.addParamsLine("   --root <rootname> : Rootname of the CL2D")
        self.addParamsLine("   --dir <dir>       : Output directory of the "
                           "CL2D")
        self.addParamsLine("  [--computeCore <thPCAZscore=3> <NPCA=2>] : "
                           "Threshold the Zscore of the class images' "
                           "projections onto an NPCA-dim PCA space")
        self.addParamsLine("  [--computeStableCore <tolerance=1>] : Keep "
                           "images that stayed together in the whole "
                           "hierarchy (up to <tolerance> levels)")

    @staticmethod
    def _levels(odir, root, suffix=""):
        import os
        levels = []
        lev = 0
        while True:
            fn = os.path.join(odir, f"level_{lev:02d}",
                              root + "_classes" + suffix + ".xmd")
            if not os.path.exists(fn):
                break
            levels.append(fn)
            lev += 1
        return levels

    @staticmethod
    def _class_blocks(fn):
        return [b for b in MetaData.blocksInFile(fn)
                if b.startswith("class") and b.endswith("_images")]

    def _compute_cores(self, odir, root, th_z, npca):
        import os
        from xmipp3_tpu.models.dimred import empca
        level_files = self._levels(odir, root)
        if not level_files:
            from xmipp3_tpu.core.errors import ErrCode, XmippError
            raise XmippError(ErrCode.ARG_MISSING,
                             "Cannot find any CL2D analysis in " + odir)
        n_kept = 0
        for fn in level_files:
            fn_core = fn.replace("_classes.xmd", "_classes_core.xmd")
            cls_rows = []
            blocks = self._class_blocks(fn)
            first = True
            for blk in blocks:
                md = MetaData(fn, block=blk)
                rows = list(md.iterRows())
                keep = rows
                if len(rows) > 2:
                    imgs = load_image_rows(rows).astype(np.float64)
                    n = imgs.shape[-1]
                    yy, xx = np.mgrid[0:n, 0:n].astype(np.float64) - n // 2
                    mask = (yy * yy + xx * xx) <= (n / 2) ** 2
                    X = imgs[:, mask]
                    d = max(min(npca, len(rows) - 1), 1)
                    Y = empca(X, d=d, n_iters=10)
                    std = Y.std(axis=0) + 1e-12
                    dist = np.sqrt(((Y / std) ** 2).mean(axis=1))
                    keep = [r for r, dd in zip(rows, dist) if dd <= th_z]
                n_kept += len(keep)
                ref = int(blk[5:11])
                cls_rows.append({"ref": ref, "classCount": len(keep)})
                MetaData.fromRows(keep).write(fn_core, block=blk,
                                              append=not first)
                first = False
            MetaData.fromRows(cls_rows).write(fn_core, block="classes",
                                              append=True)
        self.n_core = n_kept

    def _compute_stable_cores(self, odir, root, tolerance):
        level_files = self._levels(odir, root, suffix="_core")
        if not level_files:            # fall back to the raw hierarchy
            level_files = self._levels(odir, root)
        memberships = []               # per level: {image -> class index}
        for fn in level_files:
            m = {}
            for blk in self._class_blocks(fn):
                for r in MetaData(fn, block=blk).iterRows():
                    m[str(r["image"])] = blk
            memberships.append(m)
        n_kept = 0
        for lev, fn in enumerate(level_files):
            if lev <= tolerance:
                continue
            fn_out = fn.replace("_classes", "_classes_stable_core") \
                if "_classes_core" not in fn else \
                fn.replace("_classes_core", "_classes_stable_core")
            cls_rows = []
            first = True
            for blk in self._class_blocks(fn):
                rows = list(MetaData(fn, block=blk).iterRows())
                names = [str(r["image"]) for r in rows]
                N = len(names)
                aimed = lev - tolerance
                keep_mask = np.zeros(N, bool)
                if N > 1:
                    # coocurrence over all LOWER levels
                    # (mpi_classify_CL2D_core_analysis.cpp:196-271)
                    cooc = np.zeros((N, N), np.int32)
                    for lower in range(lev):
                        m = memberships[lower]
                        labels = [m.get(nm) for nm in names]
                        for i in range(N):
                            if labels[i] is None:
                                continue
                            for j in range(i + 1, N):
                                if labels[i] == labels[j]:
                                    cooc[i, j] += 1
                    ii, jj = np.nonzero(cooc == aimed)
                    keep_mask[ii] = True
                    keep_mask[jj] = True
                keep = [r for r, k in zip(rows, keep_mask) if k]
                n_kept += len(keep)
                ref = int(blk[5:11])
                cls_rows.append({"ref": ref, "classCount": len(keep)})
                MetaData.fromRows(keep).write(fn_out, block=blk,
                                              append=not first)
                first = False
            MetaData.fromRows(cls_rows).write(fn_out, block="classes",
                                              append=True)
        self.n_core = n_kept

    def run(self):
        odir = self.getParam("--dir")
        root = self.getParam("--root")
        if self.checkParam("--computeCore"):
            self._compute_cores(odir, root,
                                self.getDoubleParam("--computeCore", 0),
                                self.getIntParam("--computeCore", 1))
        elif self.checkParam("--computeStableCore"):
            self._compute_stable_cores(
                odir, root, self.getIntParam("--computeStableCore", 0))
        else:
            from xmipp3_tpu.core.errors import ErrCode, XmippError
            raise XmippError(ErrCode.ARG_MISSING,
                             "give either --computeCore or "
                             "--computeStableCore")


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
