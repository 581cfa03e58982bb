"""More tomography programs: tomogram_reconstruction (WBP of a tilt series),
tomo_detect_landmarks, tomo_filter_coordinates, tomo_map_back,
tomo_ctf_wiener2d_correction, subtomo_subtraction.

Contracts: reference tomo_* set (SURVEY.md §2.3 Tomography) and the
tomogram_reconstruction script.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import is_metadata_file, load_image_rows
from xmipp3_tpu.core.program import XmippProgram


def _load_ts(fn):
    if is_metadata_file(fn):
        md = MetaData(fn)
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        tilts = np.array([float(r.get("tiltAngle", r.get("angleTilt", 0.0)))
                          for r in rows], np.float32)
        return imgs, tilts
    imgs = Image.read_stack(fn)
    return imgs, None


class ProgTomogramReconstruction(XmippProgram):
    name = "xmipp_tomogram_reconstruction"

    def defineParams(self):
        self.addUsageLine("Reconstruct a tomogram from a single-axis tilt "
                          "series (Fourier inversion / WBP).")
        self.addParamsLine("   -i <ts>      : Tilt series (stack or metadata with tiltAngle)")
        self.addParamsLine("  [-o <tomogram=tomogram.mrc>] : Output")
        self.addParamsLine("  [--tiltRange <t0=-60> <tF=60> <step=3>] : Tilts if stack input")
        self.addParamsLine("  [--thickness <z=-1>] : Output thickness (crop; -1 = full)")

    def run(self):
        from xmipp3_tpu.ops.reconstruct import reconstruct_fourier
        imgs, tilts = _load_ts(self.getParam("-i"))
        F = len(imgs)
        if tilts is None:
            t0 = self.getDoubleParam("--tiltRange", 0)
            tF = self.getDoubleParam("--tiltRange", 1)
            step = self.getDoubleParam("--tiltRange", 2)
            tilts = np.arange(t0, tF + 1e-6, step).astype(np.float32)[:F]
        rot = np.full(F, 90.0, np.float32)
        psi = np.full(F, -90.0, np.float32)
        vol = np.asarray(reconstruct_fourier(imgs, rot, tilts, psi,
                                             batch=F))
        z = self.getIntParam("--thickness")
        if z > 0:
            D = vol.shape[0]
            vol = vol[D // 2 - z // 2: D // 2 - z // 2 + z]
        save_image(self.getParam("-o"), vol)


class ProgTomoDetectLandmarks(XmippProgram):
    name = "xmipp_tomo_detect_landmarks"

    def defineParams(self):
        self.addUsageLine("Detect high-contrast fiducial landmarks in a tilt "
                          "series (per-image peak detection).")
        self.addParamsLine("   -i <ts>      : Tilt series")
        self.addParamsLine("   -o <md_file> : Landmark coordinates")
        self.addParamsLine("  [--fiducialSize <f=10>] : Fiducial diameter (px)")
        self.addParamsLine("  [--thr <t=4>] : Peak threshold (sigmas)")

    def run(self):
        from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                                   band_pass_mask)
        imgs, tilts = _load_ts(self.getParam("-i"))
        size = self.getIntParam("--fiducialSize")
        thr = self.getDoubleParam("--thr")
        rows = []
        H, W = imgs.shape[-2:]
        mask = band_pass_mask(H, W, 1.0 / (2.0 * size),
                              min(1.0 / (0.5 * size), 0.45))
        for f in range(len(imgs)):
            filt = -np.asarray(apply_fourier_mask_2d(
                imgs[f] - imgs[f].mean(), mask))   # fiducials are dark
            mu, sd = filt.mean(), filt.std()
            s = filt.copy()
            half = size
            for _ in range(50):
                idx = np.argmax(s)
                y, x = divmod(int(idx), W)
                if s[y, x] < mu + thr * sd:
                    break
                rows.append({"xcoor": x, "ycoor": y, "frameId": f + 1,
                             "cost": float(s[y, x])})
                y0, y1 = max(y - half, 0), min(y + half, H)
                x0, x1 = max(x - half, 0), min(x + half, W)
                s[y0:y1, x0:x1] = -np.inf
        MetaData.fromRows(rows).write(self.getParam("-o"))
        self.n_landmarks = len(rows)
        if self.verbose:
            print(f"Detected {len(rows)} landmarks")


class ProgTomoFilterCoordinates(XmippProgram):
    name = "xmipp_tomo_filter_coordinates"

    def defineParams(self):
        self.addUsageLine("Filter subtomogram coordinates by a mask volume "
                          "or score threshold.")
        self.addParamsLine("   --coordinates <md> : Input coordinates")
        self.addParamsLine("   -o <md>            : Filtered coordinates")
        self.addParamsLine("  [--mask <vol=\"\">]   : Keep coords inside this mask")
        self.addParamsLine("  [--minScore <s=-1e30>] : Keep cost >= this")

    def run(self):
        md = MetaData(self.getParam("--coordinates"))
        mask = None
        if self.checkParam("--mask") and self.getParam("--mask"):
            mask = np.squeeze(Image(self.getParam("--mask")).data) > 0.5
        min_score = self.getDoubleParam("--minScore")
        rows = []
        for i in md:
            r = md.getRow(i)
            if float(r.get("cost", 0.0)) < min_score:
                continue
            if mask is not None:
                x, y = int(r["xcoor"]), int(r["ycoor"])
                z = int(r.get("zcoor", mask.shape[0] // 2))
                if not (0 <= z < mask.shape[0] and 0 <= y < mask.shape[1]
                        and 0 <= x < mask.shape[2] and mask[z, y, x]):
                    continue
            rows.append(r)
        MetaData.fromRows(rows).write(self.getParam("-o"))
        self.n_kept = len(rows)


class ProgTomoMapBack(XmippProgram):
    name = "xmipp_tomo_map_back"

    def defineParams(self):
        self.addUsageLine("Paint an averaged particle back into a tomogram "
                          "at every coordinate (visual validation).")
        self.addParamsLine("   --tomogram <vol> : Base tomogram (defines size)")
        self.addParamsLine("   --coordinates <md> : Particle coordinates")
        self.addParamsLine("   --ref <vol>      : Particle average to paint")
        self.addParamsLine("  [-o <out=mapback.mrc>] : Output")
        self.addParamsLine("  [--paint_mode <m=copy>] : copy | add")

    def run(self):
        tomo = np.squeeze(Image(self.getParam("--tomogram")).data
                          ).astype(np.float32)
        ref = np.squeeze(Image(self.getParam("--ref")).data).astype(np.float32)
        md = MetaData(self.getParam("--coordinates"))
        out = (tomo.copy() if self.getParam("--paint_mode") == "add"
               else np.zeros_like(tomo))
        pz, py, px = ref.shape
        Z, Y, X = tomo.shape
        for i in md:
            r = md.getRow(i)
            x0 = int(r["xcoor"]) - px // 2
            y0 = int(r["ycoor"]) - py // 2
            z0 = int(r.get("zcoor", Z // 2)) - pz // 2
            if (0 <= x0 and x0 + px <= X and 0 <= y0 and y0 + py <= Y
                    and 0 <= z0 and z0 + pz <= Z):
                out[z0:z0 + pz, y0:y0 + py, x0:x0 + px] += ref
        save_image(self.getParam("-o"), out)


class ProgTomoCtfWiener2DCorrection(XmippProgram):
    name = "xmipp_tomo_ctf_wiener2d_correction"

    def defineParams(self):
        self.addUsageLine("Wiener CTF correction of tilt-series images "
                          "(defocus varies with tilt).")
        self.addParamsLine("   -i <md>  : Tilt series metadata (ctf columns per image)")
        self.addParamsLine("   -o <stack> : Corrected series")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")
        self.addParamsLine("  [--wc <w=0.1>] : Wiener constant")

    def run(self):
        from xmipp3_tpu.ops.ctf import wiener_filter_2d
        from xmipp3_tpu.programs.ctf_correct import _row_ctf
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        out = np.empty_like(imgs)
        for i, r in enumerate(rows):
            ctf = _row_ctf(r, self.getDoubleParam("--sampling"))
            out[i] = np.asarray(wiener_filter_2d(
                imgs[i][None], ctf, self.getDoubleParam("--wc")))[0]
        save_image(self.getParam("-o"), out)


class ProgSubtomoSubtraction(XmippProgram):
    name = "xmipp_subtomo_subtraction"

    def defineParams(self):
        self.addUsageLine("Subtract a reference from subtomograms "
                          "(amplitude-adjusted).")
        self.addParamsLine("   -i <md>    : Metadata with subtomoName")
        self.addParamsLine("   --ref <vol> : Reference average")
        self.addParamsLine("   --oroot <root> : Output rootname")

    def run(self):
        ref = np.squeeze(Image(self.getParam("--ref")).data).astype(np.float32)
        md = MetaData(self.getParam("-i"))
        root = self.getParam("--oroot")
        rows = []
        k = 0
        rm = ref - ref.mean()
        for i in md:
            r = md.getRow(i)
            v = np.squeeze(Image(str(r["subtomoName"])).data
                           ).astype(np.float32)
            a = ((rm * (v - v.mean())).sum() /
                 max((rm ** 2).sum(), 1e-12))
            out = v - a * rm - v.mean()
            k += 1
            fn = f"{root}_{k:06d}.mrc"
            save_image(fn, out)
            d = dict(r)
            d["subtomoName"] = fn
            rows.append(d)
        MetaData.fromRows(rows).write(root + ".xmd")


PROGRAM = None
