"""CTF estimation programs.

xmipp_ctf_estimate_from_micrograph — tile micrograph, periodogram PSD(s),
  fit the full CTF model; --mode micrograph|regions|particles with local
  defocus plane fitting and PSD-PCA quality criteria (reference
  ctf_estimate_from_micrograph.cpp:289-670).
xmipp_ctf_estimate_from_psd — full-model fit on a precomputed PSD
  (reference ctf_estimate_from_psd.cpp).
xmipp_ctf_estimate_from_psd_fast — 1-D radial-average variant (reference
  ctf_estimate_from_psd_fast.cpp — a distinct, isotropic algorithm).
"""
from __future__ import annotations

import os

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.models.ctf_estimation import (CTFEstimator, STAGE_SETS,
                                              estimate_ctf_1d,
                                              fit_defocus_plane)
from xmipp3_tpu.ops.psd import (estimate_psd, extract_tiles,
                                psd_half_to_full_centered)


def _runs_test_z(signs: np.ndarray) -> float:
    """Wald-Wolfowitz runs test z-score of a +/- sequence (reference
    checkRandomness on the PCA projection signs)."""
    n = len(signs)
    if n < 2:
        return 0.0
    n1 = int((signs > 0).sum())
    n2 = n - n1
    if n1 == 0 or n2 == 0:
        return 0.0
    runs = 1 + int((signs[1:] * signs[:-1] < 0).sum())
    mu = 2.0 * n1 * n2 / n + 1
    var = 2.0 * n1 * n2 * (2.0 * n1 * n2 - n) / (n * n * (n - 1.0))
    return float((runs - mu) / max(np.sqrt(var), 1e-8)) if var > 0 else 0.0


def _piece_psds(pieces: np.ndarray) -> np.ndarray:
    """Per-piece windowed periodogram |F|^2/N (half rfft layout)."""
    import jax.numpy as jnp
    from xmipp3_tpu.ops.mask import raised_cosine_window_1d
    n = pieces.shape[-1]
    w1 = np.asarray(raised_cosine_window_1d(n), np.float32)
    w2 = w1[:, None] * w1[None, :]
    spec = jnp.fft.rfft2(jnp.asarray(pieces) * jnp.asarray(w2))
    return np.asarray(jnp.abs(spec) ** 2 / (n * n))


class _CTFFitMixin:
    def _define_fit_params(self):
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size (Å)")
        self.addParamsLine("     alias -s;")
        self.addParamsLine("  [--kV <v=300>]       : Acceleration voltage")
        self.addParamsLine("  [--Cs <cs=2.7>]      : Spherical aberration (mm)")
        self.addParamsLine("  [--Ca <ca=2>]        : Chromatic aberration (mm)")
        self.addParamsLine("  [--Q0 <q=0.07>]      : Amplitude contrast")
        self.addParamsLine("  [--min_freq <f=0.03>] : Minimum digital freq for fit")
        self.addParamsLine("  [--max_freq <f=0.35>] : Maximum digital freq for fit")
        self.addParamsLine("  [--defocus_range <min=2000> <max=40000>] : Search range (Å)")
        self.addParamsLine("  [--VPP_radius <r=0>]  : Phase-plate radius (0 = no VPP)")

    def _read_fit_params(self):
        self.Ts = self.getDoubleParam("--sampling_rate")
        self.kV = self.getDoubleParam("--kV")
        self.Cs = self.getDoubleParam("--Cs")
        self.Ca = self.getDoubleParam("--Ca")
        self.Q0 = self.getDoubleParam("--Q0")
        self.min_freq = self.getDoubleParam("--min_freq")
        self.max_freq = self.getDoubleParam("--max_freq")
        self.def_range = (self.getDoubleParam("--defocus_range", 0),
                          self.getDoubleParam("--defocus_range", 1))
        self.vpp_radius = self.getDoubleParam("--VPP_radius")

    def _estimator(self, psd_half, fast=False):
        return CTFEstimator(psd_half, self.Ts, self.kV, self.Cs, self.Q0,
                            Ca=self.Ca, min_freq=self.min_freq,
                            max_freq=self.max_freq,
                            defocus_range=self.def_range,
                            vpp_radius=self.vpp_radius, fast=fast)

    def _fit(self, psd_half):
        est = self._estimator(psd_half)
        ctf = est.estimate()
        self.fitness = est.final_fitness
        return ctf


class ProgCTFEstimateFromMicrograph(XmippProgram, _CTFFitMixin):
    name = "xmipp_ctf_estimate_from_micrograph"

    def defineParams(self):
        self.addUsageLine("Estimate the CTF from a micrograph: periodogram "
                          "PSD(s) + full model fit; single, per-region "
                          "(local defocus plane) or per-particle modes.")
        self.addParamsLine("   --micrograph <file> : Input micrograph")
        self.addParamsLine("     alias -i;")
        self.addParamsLine("  [--oroot <root=\"\">]  : Output rootname (default: micrograph name)")
        self.addParamsLine("  [--pieceDim <d=512>] : Tile size for periodogram")
        self.addParamsLine("  [--overlap <o=0.5>]  : Tile overlap fraction")
        self.addParamsLine("  [--skipBorders <s=2>] : Border pieces to skip (regions mode)")
        self.addParamsLine("  [--mode <mode=micrograph>] : How many PSDs/CTFs to estimate")
        self.addParamsLine("         where <mode>")
        self.addParamsLine("                  micrograph : single PSD for the whole micrograph")
        self.addParamsLine("                  regions <file=\"\"> : PSD+CTF per grid region, local defocus plane fit")
        self.addParamsLine("                  particles <file> : PSD+CTF per particle position (metadata with X/Y)")
        self.addParamsLine("  [--dont_estimate_ctf] : Only compute the PSD")
        self.addParamsLine("  [--acceleration1D]   : Use the fast 1-D radial fit")
        self._define_fit_params()
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def readParams(self):
        self.fn_mic = self.getParam("--micrograph")
        self.oroot = self.getParam("--oroot") if self.checkParam("--oroot") \
            else os.path.splitext(self.fn_mic)[0]
        self.piece = self.getIntParam("--pieceDim")
        self.overlap = self.getDoubleParam("--overlap")
        self.skip_borders = self.getIntParam("--skipBorders")
        self.psd_mode = self.getParam("--mode")
        try:
            self.fn_pos = self.getParam("--mode", 1) \
                if self.psd_mode in ("regions", "particles") else ""
        except Exception:
            self.fn_pos = ""

        self.only_psd = self.checkParam("--dont_estimate_ctf")
        self.accel_1d = self.checkParam("--acceleration1D")
        self._read_fit_params()
        from xmipp3_tpu.parallel.cli import read_mesh_params
        read_mesh_params(self)

    # -- helpers -----------------------------------------------------------
    def _fit_one(self, psd_half, seed_params=None):
        """Full fit, or a short seeded refine for local pieces."""
        if self.accel_1d:
            ctf = estimate_ctf_1d(psd_half, self.Ts, self.kV, self.Cs,
                                  self.Q0, Ca=self.Ca,
                                  min_freq=self.min_freq,
                                  max_freq=self.max_freq,
                                  defocus_range=self.def_range)
            return ctf, 0.0
        est = self._estimator(psd_half, fast=seed_params is not None)
        if seed_params is None:
            ctf = est.estimate()
        else:
            # local refinement around the micrograph-level solution
            # (reference per-piece ROUT_Adjust_CTF seeded by the global fit)
            est.params = seed_params.copy()
            est._powell(STAGE_SETS["defocus"], maxiter=3)
            ctf = est.to_ctf()
        return ctf, est.final_fitness

    def _pca_criteria(self, psds: np.ndarray):
        """PSD-PCA quality criteria (reference :600-667): stdQ, first-PC
        projection variance, runs-test z of projection signs."""
        K, n = psds.shape[0], psds.shape[1]
        fy = np.fft.fftfreq(n)[:, None]
        fx = np.fft.rfftfreq(n)[None, :]
        w = np.sqrt(fy * fy + fx * fx)
        mask = (w > 0.05) & (w < 0.4)
        X = psds[:, mask].astype(np.float64)
        std = X.std(axis=0)
        avg = X.mean(axis=0)
        stdQ = float(np.median(std / np.maximum(avg, 1e-12)))
        Xs = (X - avg) / np.maximum(std, 1e-12)
        # first principal component by power iteration-free SVD
        try:
            _, s, Vt = np.linalg.svd(Xs, full_matrices=False)
            p = Xs @ Vt[0]
        except np.linalg.LinAlgError:
            return stdQ, 0.0, 0.0
        pstd = float(p.std())
        return stdQ, pstd, _runs_test_z(np.sign(p))

    # -- modes ---------------------------------------------------------------
    def run(self):
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             resolve_mesh)
        maybe_init_distributed(self)
        self._mesh, _ = resolve_mesh(getattr(self, "mesh_mode", "auto"))
        mic = np.squeeze(Image(self.fn_mic).data).astype(np.float32)
        if self.psd_mode == "micrograph":
            self._run_micrograph(mic)
        elif self.psd_mode == "regions":
            self._run_regions(mic)
        else:
            self._run_particles(mic)

    def _run_micrograph(self, mic):
        pieces = extract_tiles(mic, min(self.piece, min(mic.shape)),
                               self.overlap)
        psds = _piece_psds(pieces)
        psd = psds.mean(axis=0)
        n = psd.shape[0]
        save_image(self.oroot + ".psd", psd_half_to_full_centered(psd, n))
        if self.only_psd:
            return
        stdQ, pca1, zruns = self._pca_criteria(psds) if len(psds) > 2 \
            else (0.0, 0.0, 0.0)
        ctf, fitness = self._fit_one(psd)
        md = ctf.to_metadata()
        oid = md.firstObject()
        md.setValue("ctfCritPsdStdQ", stdQ, oid)
        md.setValue("ctfCritPsdPCA1", pca1, oid)
        md.setValue("ctfCritPsdPCARuns", zruns, oid)
        md.row_format = True
        md.write(self.oroot + ".ctfparam", block="fullMicrograph")
        if self.verbose:
            print(f"DefocusU={ctf.defocusU:.1f} A  DefocusV="
                  f"{ctf.defocusV:.1f} A  angle={ctf.azimuthal_angle:.1f} "
                  f"deg  stdQ={stdQ:.3f} pcaRuns={zruns:.2f}")

    def _region_grid(self, mic):
        H, W = mic.shape
        piece = min(self.piece, min(H, W))
        nY = max(H // piece, 1)
        nX = max(W // piece, 1)
        s = self.skip_borders
        regions = []
        for i in range(nY):
            for j in range(nX):
                if nY > 2 * s and nX > 2 * s:
                    if i < s or i >= nY - s or j < s or j >= nX - s:
                        continue
                y0 = min(i * piece, H - piece)
                x0 = min(j * piece, W - piece)
                regions.append((y0, x0))
        return piece, regions

    def _run_regions(self, mic):
        piece, regions = self._region_grid(mic)
        pieces = np.stack([mic[y0:y0 + piece, x0:x0 + piece]
                           for y0, x0 in regions])
        psds = _piece_psds(pieces)
        psd_avg = psds.mean(axis=0)
        save_image(self.oroot + ".psd",
                   psd_half_to_full_centered(psd_avg, piece))
        save_image(self.oroot + ".psdstk",
                   np.stack([psd_half_to_full_centered(p, piece)
                             for p in psds]))
        if self.only_psd:
            return
        # global fit seeds the per-region local refinements
        est = self._estimator(psd_avg)
        ctf_global = est.estimate()
        seed = est.params
        rows = []
        defU, defV, xs, ys = [], [], [], []
        if self.accel_1d:
            region_params = None
        else:
            # ALL per-region seeded defocus refinements in one vmapped
            # device dispatch (models/ctf_estimation.refine_defocus_batch);
            # with --mesh, the region axis shards over the device mesh
            # (regions are embarrassingly parallel — the reference farms
            # them to MPI workers)
            fit_kw = dict(voltage=self.kV, Cs=self.Cs, Q0=self.Q0,
                          Ca=self.Ca, min_freq=self.min_freq,
                          max_freq=self.max_freq,
                          vpp_radius=self.vpp_radius)
            if getattr(self, "_mesh", None) is not None:
                from xmipp3_tpu.parallel.engines import \
                    parallel_refine_defocus
                region_params = parallel_refine_defocus(
                    self._mesh, psds, seed, self.Ts, **fit_kw)
            else:
                from xmipp3_tpu.models.ctf_estimation import \
                    refine_defocus_batch
                region_params = refine_defocus_batch(psds, seed, self.Ts,
                                                     **fit_kw)
        for k, ((y0, x0), psd_i) in enumerate(zip(regions, psds)):
            if region_params is None:
                ctf_i, _ = self._fit_one(psd_i, seed_params=seed)
            else:
                est.params = region_params[k]
                ctf_i = est.to_ctf()
            xc = (x0 + piece / 2) * self.Ts
            yc = (y0 + piece / 2) * self.Ts
            rows.append({"xcoor": x0 + piece // 2, "ycoor": y0 + piece // 2,
                         "ctfDefocusU": ctf_i.defocusU,
                         "ctfDefocusV": ctf_i.defocusV,
                         "ctfDefocusAngle": ctf_i.azimuthal_angle})
            defU.append(ctf_i.defocusU)
            defV.append(ctf_i.defocusV)
            xs.append(xc)
            ys.append(yc)
        MetaData.fromRows(rows).write(self.oroot + "_regions.xmd")
        # local defocus plane fit (reference :470-560)
        xs, ys = np.asarray(xs), np.asarray(ys)
        coefU = fit_defocus_plane(xs, ys, np.asarray(defU))
        coefV = fit_defocus_plane(xs, ys, np.asarray(defV))
        H, W = mic.shape
        xc, yc = W / 2 * self.Ts, H / 2 * self.Ts
        ctf_global.defocusU = float(coefU[0] + coefU[1] * xc + coefU[2] * yc)
        ctf_global.defocusV = float(coefV[0] + coefV[1] * xc + coefV[2] * yc)
        md = ctf_global.to_metadata()
        oid = md.firstObject()
        for lbl, v in (("ctfDefocusPlaneUA", coefU[0]),
                       ("ctfDefocusPlaneUB", coefU[1]),
                       ("ctfDefocusPlaneUC", coefU[2]),
                       ("ctfDefocusPlaneVA", coefV[0]),
                       ("ctfDefocusPlaneVB", coefV[1]),
                       ("ctfDefocusPlaneVC", coefV[2])):
            md.setValue(lbl, float(v), oid)
        md.row_format = True
        md.write(self.oroot + ".ctfparam", block="fullMicrograph")
        if self.verbose:
            print(f"regions={len(regions)}  plane defU(x,y) = "
                  f"{coefU[0]:.1f} + {coefU[1]:.3g} x + {coefU[2]:.3g} y")

    def _run_particles(self, mic):
        md = MetaData(self.fn_pos)
        piece = min(self.piece, min(mic.shape))
        H, W = mic.shape
        pieces, ids = [], []
        for oid in md:
            row = md.getRow(oid)
            x = int(float(row.get("xcoor", row.get("X", 0))))
            y = int(float(row.get("ycoor", row.get("Y", 0))))
            y0 = int(np.clip(y - piece // 2, 0, H - piece))
            x0 = int(np.clip(x - piece // 2, 0, W - piece))
            pieces.append(mic[y0:y0 + piece, x0:x0 + piece])
            ids.append(oid)
        psds = _piece_psds(np.stack(pieces))
        save_image(self.oroot + ".psdstk",
                   np.stack([psd_half_to_full_centered(p, piece)
                             for p in psds]))
        if self.only_psd:
            return
        est = self._estimator(psds.mean(axis=0))
        est.estimate()
        seed = est.params
        if self.accel_1d:
            particle_params = None
        else:
            from xmipp3_tpu.models.ctf_estimation import refine_defocus_batch
            particle_params = refine_defocus_batch(
                psds, seed, self.Ts, self.kV, self.Cs, self.Q0,
                Ca=self.Ca, min_freq=self.min_freq,
                max_freq=self.max_freq, vpp_radius=self.vpp_radius)
        for k, oid in enumerate(ids):
            if particle_params is None:
                ctf_i, _ = self._fit_one(psds[k], seed_params=seed)
            else:
                est.params = particle_params[k]
                ctf_i = est.to_ctf()
            fn_i = f"{self.oroot}_particle{k + 1:04d}.ctfparam"
            ctf_i.write(fn_i)
            md.setValue("ctfModel", fn_i, oid)
            md.setValue("psd", f"{k + 1:06d}@{self.oroot}.psdstk", oid)
        md.write(self.oroot + "_particles.xmd")
        if self.verbose:
            print(f"fitted {len(ids)} particle CTFs")


class ProgCTFEstimateFromPSD(XmippProgram, _CTFFitMixin):
    name = "xmipp_ctf_estimate_from_psd"

    def defineParams(self):
        self.addUsageLine("Adjust a parametric CTF model to a PSD.")
        self.addParamsLine("   --psd <file>  : PSD image (centered full plane)")
        self.addParamsLine("     alias -i;")
        self.addParamsLine("  [-o <ctfparam=\"\">] : Output .ctfparam")
        self._define_fit_params()

    def readParams(self):
        self.fn_psd = self.getParam("--psd")
        self.fn_out = self.getParam("-o") if self.checkParam("-o") else \
            os.path.splitext(self.fn_psd)[0] + ".ctfparam"
        self._read_fit_params()

    def _load_half(self):
        full = np.squeeze(Image(self.fn_psd).data).astype(np.float32)
        n = full.shape[0]
        unshift = np.fft.ifftshift(full)
        return np.ascontiguousarray(unshift[:, : n // 2 + 1])

    def run(self):
        ctf = self._fit(self._load_half())
        ctf.write(self.fn_out)
        if self.verbose:
            print(f"DefocusU={ctf.defocusU:.1f} A  DefocusV="
                  f"{ctf.defocusV:.1f} A  angle={ctf.azimuthal_angle:.1f} deg")


class ProgCTFEstimateFromPSDFast(ProgCTFEstimateFromPSD):
    """1-D radial-average CTF fit (reference ctf_estimate_from_psd_fast —
    a distinct isotropic algorithm, NOT an alias of the 2-D fit)."""
    name = "xmipp_ctf_estimate_from_psd_fast"

    def run(self):
        psd_half = self._load_half()
        ctf = estimate_ctf_1d(psd_half, self.Ts, self.kV, self.Cs, self.Q0,
                              Ca=self.Ca, min_freq=self.min_freq,
                              max_freq=self.max_freq,
                              defocus_range=self.def_range)
        ctf.write(self.fn_out)
        if self.verbose:
            print(f"Defocus={ctf.defocusU:.1f} A (1-D radial fit)")


PROGRAM = None  # registered individually
