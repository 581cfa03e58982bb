"""Spectral SNR estimation and continuous-assignment residual creation.

Contracts: reference resolution_ssnr.{h,cpp} (legacy/libraries/reconstruction;
SSNR 1D table, VSSNR volume, radial average of a VSSNR) and
continuous_create_residuals.{h,cpp} (projection-minus-image residual stacks
with per-image gray optimization, "shifting projection not image").

TPU-native shape: all projections of the signal/noise volumes are produced by
one FourierProjector (single padded 3D FFT + batched slice gathers); the four
power spectra are accumulated as batched rfft2 reductions on device; only the
tiny ring-accumulation runs on host.
"""
from __future__ import annotations

import os

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.programs.angular_programs import \
    ProgAngularContinuousAssign2 as _Assign2Base


def _ring_accumulate(power, ring_width, n_bins):
    """Reference ring accumulation (resolution_ssnr.cpp estimateSSNR ring
    loop): each full-FFT pixel with fx >= 0 adds into bins
    ceil(widx - ring_width) .. floor(widx). power: (H, W) full-FFT power.
    Returns (sums (n_bins,), counts (n_bins,))."""
    H, W = power.shape
    fy = np.fft.fftfreq(H)[:, None]
    fx = np.fft.fftfreq(W)[None, :]
    keep = fx >= 0
    widx = np.sqrt(fx ** 2 + fy ** 2) * W
    sums = np.zeros(n_bins)
    counts = np.zeros(n_bins)
    l0 = np.maximum(np.ceil(widx - ring_width), 0).astype(int)
    lF = np.floor(widx).astype(int)
    p = np.where(keep, power, 0.0)
    k = np.where(keep, 1.0, 0.0)
    for d in range(int(ring_width) + 1):
        l = l0 + d
        valid = (l <= lF) & (l < n_bins) & keep
        lv = np.where(valid, l, 0)
        sums += np.bincount(lv.ravel(), weights=np.where(valid, p, 0.0).ravel(),
                            minlength=n_bins)
        counts += np.bincount(lv.ravel(),
                              weights=np.where(valid, k, 0.0).ravel(),
                              minlength=n_bins)
    return sums, counts


class ProgResolutionSSNR(XmippProgram):
    name = "xmipp_resolution_ssnr"

    def defineParams(self):
        self.addUsageLine("Evaluate reconstruction quality by the Spectral "
                          "Signal-to-Noise Ratio (SSNR) or its volumetric "
                          "distribution (VSSNR).")
        self.addParamsLine("  [--signal <signal_file>] : Signal volume")
        self.addParamsLine("     alias -S;")
        self.addParamsLine("  [--noise <noise_file>]   : Noise volume")
        self.addParamsLine("     alias -N;")
        self.addParamsLine("  [--sel_signal <md>]  : Images of the signal reconstruction")
        self.addParamsLine("     alias -selS;")
        self.addParamsLine("  [--sel_noise <md>]   : Images of the noise reconstruction")
        self.addParamsLine("     alias -selN;")
        self.addParamsLine("  [-o <file=\"\">]       : Output SSNR table")
        self.addParamsLine("  [--ring <w=4>]       : Ring width (Fourier px)")
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size (A)")
        self.addParamsLine("     alias -s;")
        self.addParamsLine("  [--min_power <th=1e-10>] : Minimum power before SSNR is zeroed")
        self.addParamsLine("  [--gen_VSSNR]        : Generate the volumetric SSNR")
        self.addParamsLine("  [--VSSNR <fn_vol=VSSNR.vol>] : VSSNR volume file (output of --gen_VSSNR, input of --radial_avg)")
        self.addParamsLine("  [--radial_avg]       : Radial average of an existing VSSNR volume")
        self.addParamsLine("  [--sym <s=c1>]       : Symmetry for the VSSNR reconstruction")

    def run(self):
        import jax.numpy as jnp
        self.ring = self.getDoubleParam("--ring")
        self.Ts = self.getDoubleParam("--sampling_rate")
        self.min_power = self.getDoubleParam("--min_power")

        if self.checkParam("--radial_avg"):
            self._radial_avg()
            return

        from xmipp3_tpu.ops.project import FourierProjector
        S = np.squeeze(Image(self.getParam("--signal")).data).astype(np.float32)
        N = np.squeeze(Image(self.getParam("--noise")).data).astype(np.float32)
        mdS = MetaData(self.getParam("--sel_signal"))
        mdN = MetaData(self.getParam("--sel_noise"))
        rowsS, rowsN = list(mdS.iterRows()), list(mdN.iterRows())
        imgsS = load_image_rows(rowsS)
        imgsN = load_image_rows(rowsN)
        get = lambda rows, k: np.array([float(r.get(k, 0.0)) for r in rows],
                                       np.float32)
        rot, tilt, psi = (get(rowsS, k) for k in
                          ("angleRot", "angleTilt", "anglePsi"))
        projS = FourierProjector(S)
        projN = FourierProjector(N)
        # Iths/Ithn: reprojections at the metadata angles (reference
        # projectVolume semantics); residuals Is-Iths / In-Ithn
        Pths = np.asarray(projS.project_euler(rot, tilt, psi))
        Pthn = np.asarray(projN.project_euler(rot, tilt, psi))
        Rs = imgsS - Pths
        Rn = imgsN - Pthn

        fft2 = lambda x: np.asarray(jnp.abs(jnp.fft.fft2(jnp.asarray(x))) ** 2)
        S2s, N2s = fft2(Pths), fft2(Rs)    # signal recon: theo power, residual
        S2n, N2n = fft2(Pthn), fft2(Rn)    # noise recon: theo power, residual

        n = imgsS.shape[-1]
        n_bins = int(n / 2 - self.ring)
        acc = {}
        for key, P in (("S_S2", S2s), ("S_N2", N2s), ("N_S2", S2n),
                       ("N_N2", N2n)):
            s = np.zeros(n_bins)
            c = np.zeros(n_bins)
            for im in P:
                si, ci = _ring_accumulate(im, self.ring, n_bins)
                s += si
                c += ci
            acc[key] = s
        # per the reference: SSNR ratios use raw ring sums; the dB power
        # columns are count-normalized
        eps = 1e-30
        S_SSNR = acc["S_S2"] / np.maximum(acc["S_N2"], eps)
        N_SSNR = acc["N_S2"] / np.maximum(acc["N_N2"], eps)
        nimg = len(S2s)
        counts = np.maximum(c, 1e-12)
        rows = []
        for i in range(n_bins):
            w = i / float(n)
            if w > 0.5:
                break
            ssnr = S_SSNR[i] / max(N_SSNR[i], eps)
            rows.append([i, w / self.Ts,
                         10 * np.log10(ssnr - 1) if ssnr > 1 else -1000.0,
                         S_SSNR[i],
                         10 * np.log10(acc["S_S2"][i] / counts[i] / nimg + eps),
                         10 * np.log10(acc["S_N2"][i] / counts[i] / nimg + eps),
                         N_SSNR[i],
                         10 * np.log10(acc["N_S2"][i] / counts[i] / nimg + eps),
                         10 * np.log10(acc["N_N2"][i] / counts[i] / nimg + eps)])
        fn_out = self.getParam("-o") if self.checkParam("-o") else ""
        if not fn_out:
            root, ext = os.path.splitext(self.getParam("--signal"))
            fn_out = root + "_SSNR.txt"
        self._write_table(fn_out, rows,
                          "index freq(1/A) SSNR(dB) S_SSNR S_S2(dB) S_N2(dB) "
                          "N_SSNR N_S2(dB) N_N2(dB)")
        self.ssnr_table = np.array(rows)

        if self.checkParam("--gen_VSSNR"):
            # per-image 2D SSNR maps live on central Fourier planes of the
            # volume; the VSSNR is their trilinear interpolation onto the 3D
            # Fourier grid (the reference approximates this with ART at
            # --ray_length 1 over the CenterFFT'd maps; here the slices are
            # scattered directly, which is the exact operation)
            issnr = np.where(N2s > self.min_power, S2s / N2s, 0.0)
            alpha = np.where(N2n > self.min_power, S2n / N2n, 0.0)
            ssnr2d = np.where(alpha > self.min_power,
                              np.maximum(issnr / np.maximum(alpha, eps) - 1.0,
                                         0.0), 0.0)
            maps = 10.0 * np.log10(ssnr2d + 1.0)       # (B, n, n) dB, fft idx
            vol = self._scatter_slices(maps, rot, tilt, psi)
            save_image(self.getParam("--VSSNR"), vol.astype(np.float32))
            if self.verbose:
                print(f"VSSNR -> {self.getParam('--VSSNR')}")

    @staticmethod
    def _scatter_slices(maps, rot, tilt, psi):
        """Trilinear scatter of per-projection Fourier-plane maps into a
        centered 3D grid; averaged by accumulated weight."""
        from xmipp3_tpu.core.geometry import euler_matrix
        B, n, _ = maps.shape
        mats = np.asarray(euler_matrix(rot, tilt, psi), np.float64)
        f = np.fft.fftfreq(n) * n                      # centered freq indices
        fy, fx = np.meshgrid(f, f, indexing="ij")
        sums = np.zeros((n, n, n))
        wsum = np.zeros((n, n, n))
        half = n // 2
        for b in range(B):
            p = (fx.ravel()[:, None] * mats[b, 0][None, :]
                 + fy.ravel()[:, None] * mats[b, 1][None, :]) + half
            v = maps[b].ravel()
            p0 = np.floor(p).astype(int)
            fr = p - p0
            for dz in (0, 1):
                for dyy in (0, 1):
                    for dxx in (0, 1):
                        q = p0 + np.array([dxx, dyy, dz])
                        w = (np.abs(1 - dxx - fr[:, 0])
                             * np.abs(1 - dyy - fr[:, 1])
                             * np.abs(1 - dz - fr[:, 2]))
                        ok = ((q >= 0) & (q < n)).all(axis=1)
                        np.add.at(sums, (q[ok, 2], q[ok, 1], q[ok, 0]),
                                  w[ok] * v[ok])
                        np.add.at(wsum, (q[ok, 2], q[ok, 1], q[ok, 0]),
                                  w[ok])
        return sums / np.maximum(wsum, 1e-12)

    def _radial_avg(self):
        """Radial average of 10*log10(VSSNR+1) (reference radialAverage)."""
        V = np.squeeze(Image(self.getParam("--VSSNR")).data).astype(np.float64)
        n = V.shape[-1]
        n_bins = int(n / 2 - self.ring)
        lin = np.power(10.0, np.fft.ifftshift(V) / 10.0) - 1.0
        f = [np.fft.fftfreq(s) for s in V.shape]
        w = np.sqrt(sum(np.meshgrid(*f, indexing="ij")[i] ** 2
                        for i in range(V.ndim)))
        keep = np.meshgrid(*f, indexing="ij")[-1] >= 0
        widx = w * n
        sums = np.zeros(n_bins)
        counts = np.zeros(n_bins)
        l0 = np.maximum(np.ceil(widx - self.ring), 0).astype(int)
        lF = np.floor(widx).astype(int)
        for d in range(int(self.ring) + 1):
            l = l0 + d
            valid = (l <= lF) & (l < n_bins) & keep
            lv = np.where(valid, l, 0)
            sums += np.bincount(lv.ravel(), minlength=n_bins,
                                weights=np.where(valid, lin, 0.0).ravel())
            counts += np.bincount(lv.ravel(), minlength=n_bins,
                                  weights=valid.ravel().astype(float))
        avg = sums / np.maximum(counts, 1e-12)
        rows = [[i, i / float(n) / self.Ts,
                 10 * np.log10(avg[i] - 1) if avg[i] > 1 else -1000.0]
                for i in range(n_bins)]
        fn_out = self.getParam("-o") if self.checkParam("-o") else \
            os.path.splitext(self.getParam("--VSSNR"))[0] + "_radial.txt"
        self._write_table(fn_out, rows, "index freq(1/A) SSNR(dB)")
        self.ssnr_table = np.array(rows)

    def _write_table(self, fn, rows, header):
        with open(fn, "w") as f:
            f.write(f"; {header}\n")
            for r in rows:
                f.write(" ".join(f"{v:12.6g}" for v in r) + "\n")
        if self.verbose:
            print(f"SSNR table -> {fn}")


class ProgContinuousCreateResiduals(_Assign2Base):
    """Create residual images (experimental minus continuously-refined
    reference projection). The reference grammar
    (continuous_create_residuals.cpp defineParams) is a strict subset of
    angular_continuous_assign2's — the engine and every optimize*/max_*
    flag are shared; this endpoint additionally tags each row with its
    MDL_IMAGE_RESIDUAL entry."""
    name = "xmipp_continuous_create_residuals"

    def run(self):
        super().run()
        fn_res = self.getParam("--oresiduals")
        if fn_res:
            md = MetaData(self.getParam("-o"))
            rows = list(md.iterRows())
            for i, r in enumerate(rows):
                r["imageResidual"] = f"{i + 1:06d}@{fn_res}"
            MetaData.fromRows(rows).write(self.getParam("-o"))
