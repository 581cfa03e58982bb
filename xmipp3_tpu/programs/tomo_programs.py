"""Tomography programs: project (tilt series), simulate_tilt_series,
extract_subtomograms, average_subtomos, tiltseries_dose_filter,
detect_missing_wedge.

Contracts: reference libraries/tomo/ set (SURVEY.md §2.3 Tomography):
tomo_project, tomo_simulate_tilt_series, tomo_extract_subtomograms
(tomo_extract_subtomograms), tomo_average_subtomos,
tomo_tiltseries_dose_filter, tomo_detect_missing_wedge.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram


class ProgTomoProject(XmippProgram):
    name = "xmipp_tomo_project"

    def defineParams(self):
        self.addUsageLine("Generate a tilt series from a volume "
                          "(single-axis tilt about Y).")
        self.addParamsLine("   -i <volume>  : Input volume")
        self.addParamsLine("   -o <root>    : Output rootname (.mrcs + .xmd)")
        self.addParamsLine("  [--tiltRange <t0=-60> <tF=60> <step=3>] : Tilt scheme")

    def run(self):
        from xmipp3_tpu.ops.project import FourierProjector
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        t0 = self.getDoubleParam("--tiltRange", 0)
        tF = self.getDoubleParam("--tiltRange", 1)
        step = self.getDoubleParam("--tiltRange", 2)
        tilts = np.arange(t0, tF + 1e-6, step).astype(np.float32)
        proj = FourierProjector(vol)
        # single-axis tilt about Y: rot=90, tilt=theta, psi=-90 gives y-axis
        # tilting in the xmipp convention; use rot=0,tilt=theta for x-axis
        imgs = np.asarray(proj.project_euler(
            np.full(len(tilts), 90.0, np.float32), tilts,
            np.full(len(tilts), -90.0, np.float32)))
        root = self.getParam("-o")
        save_image(root + ".mrcs", imgs)
        MetaData.fromRows([
            {"image": f"{i + 1:06d}@{root}.mrcs", "angleRot": 90.0,
             "angleTilt": float(tilts[i]), "anglePsi": -90.0,
             "tiltAngle": float(tilts[i]), "itemId": i + 1}
            for i in range(len(tilts))]).write(root + ".xmd")


class ProgTomoSimulateTiltSeries(XmippProgram):
    name = "xmipp_tomo_simulate_tilt_series"

    def defineParams(self):
        self.addUsageLine("Simulate a tilt series from coordinates + a "
                          "reference particle volume.")
        self.addParamsLine("   --coordinates <md> : xcoor/ycoor/zcoor of particles")
        self.addParamsLine("   --vol <particle>   : Particle volume to plant")
        self.addParamsLine("   -o <root>          : Output rootname")
        self.addParamsLine("  [--xdim <x=256>]    : Tomogram X size")
        self.addParamsLine("  [--ydim <y=256>]    : Tomogram Y size")
        self.addParamsLine("  [--zdim <z=64>]     : Tomogram thickness")
        self.addParamsLine("  [--tiltRange <t0=-60> <tF=60> <step=3>] : Tilt scheme")
        self.addParamsLine("  [--noise <sigma=0>] : Additive gaussian noise")

    def run(self):
        md = MetaData(self.getParam("--coordinates"))
        part = np.squeeze(Image(self.getParam("--vol")).data).astype(np.float32)
        X = self.getIntParam("--xdim")
        Y = self.getIntParam("--ydim")
        Z = self.getIntParam("--zdim")
        tomo = np.zeros((Z, Y, X), np.float32)
        pz, py, px = part.shape
        for i in md:
            r = md.getRow(i)
            x0 = int(r["xcoor"]) - px // 2
            y0 = int(r["ycoor"]) - py // 2
            z0 = int(r.get("zcoor", Z // 2)) - pz // 2
            if (0 <= x0 and x0 + px <= X and 0 <= y0 and y0 + py <= Y and
                    0 <= z0 and z0 + pz <= Z):
                tomo[z0:z0 + pz, y0:y0 + py, x0:x0 + px] += part
        # project the (non-cubic) tomogram: pad z to cube via real-space
        from xmipp3_tpu.ops.project import project_real_space
        t0 = self.getDoubleParam("--tiltRange", 0)
        tF = self.getDoubleParam("--tiltRange", 1)
        step = self.getDoubleParam("--tiltRange", 2)
        tilts = np.arange(t0, tF + 1e-6, step).astype(np.float32)
        n = max(X, Y, Z)
        cube = np.zeros((n, n, n), np.float32)
        cube[(n - Z) // 2:(n - Z) // 2 + Z, (n - Y) // 2:(n - Y) // 2 + Y,
             (n - X) // 2:(n - X) // 2 + X] = tomo
        imgs = np.asarray(project_real_space(
            cube, np.full(len(tilts), 90.0, np.float32), tilts,
            np.full(len(tilts), -90.0, np.float32)))
        rng = np.random.default_rng(0)
        sigma = self.getDoubleParam("--noise")
        if sigma > 0:
            imgs = imgs + rng.normal(0, sigma, imgs.shape).astype(np.float32)
        root = self.getParam("-o")
        save_image(root + ".mrcs", imgs)
        save_image(root + "_tomogram.mrc", tomo)
        MetaData.fromRows([
            {"image": f"{i + 1:06d}@{root}.mrcs",
             "tiltAngle": float(tilts[i]), "itemId": i + 1}
            for i in range(len(tilts))]).write(root + ".xmd")


class ProgTomoExtractSubtomograms(XmippProgram):
    name = "xmipp_tomo_extract_subtomograms"

    def defineParams(self):
        self.addUsageLine("Extract cubic subtomograms at coordinates.")
        self.addParamsLine("   --tomogram <vol> : Input tomogram")
        self.addParamsLine("   --coordinates <md> : xcoor/ycoor/zcoor metadata")
        self.addParamsLine("   --boxsize <b>    : Subtomogram box size")
        self.addParamsLine("   -o <root>        : Output rootname")
        self.addParamsLine("  [--invert]        : Invert contrast")

    def run(self):
        tomo = np.squeeze(Image(self.getParam("--tomogram")).data
                          ).astype(np.float32)
        md = MetaData(self.getParam("--coordinates"))
        b = self.getIntParam("--boxsize")
        half = b // 2
        Z, Y, X = tomo.shape
        subs = []
        rows = []
        k = 0
        root = self.getParam("-o")
        for i in md:
            r = md.getRow(i)
            x, y, z = int(r["xcoor"]), int(r["ycoor"]), int(r.get("zcoor", Z // 2))
            if (half <= x < X - half and half <= y < Y - half and
                    half <= z < Z - half):
                s = tomo[z - half:z - half + b, y - half:y - half + b,
                         x - half:x - half + b].copy()
                if self.checkParam("--invert"):
                    s = -s
                subs.append(s)
                k += 1
                rows.append({"subtomoName": f"{root}_{k:06d}.mrc",
                             "xcoor": x, "ycoor": y, "zcoor": z, "itemId": k})
                save_image(f"{root}_{k:06d}.mrc", s)
        MetaData.fromRows(rows).write(root + ".xmd")
        if self.verbose:
            print(f"Extracted {k} subtomograms of {b}^3")
        self.n_extracted = k


class ProgTomoAverageSubtomos(XmippProgram):
    name = "xmipp_tomo_average_subtomos"

    def defineParams(self):
        self.addUsageLine("Average a set of (aligned) subtomograms.")
        self.addParamsLine("   -i <md>  : Metadata with subtomoName column")
        self.addParamsLine("   -o <vol> : Output average")

    def run(self):
        md = MetaData(self.getParam("-i"))
        acc = None
        n = 0
        for i in md:
            r = md.getRow(i)
            v = np.squeeze(Image(str(r["subtomoName"])).data).astype(np.float32)
            acc = v if acc is None else acc + v
            n += 1
        save_image(self.getParam("-o"), acc / max(n, 1))


class ProgTomoTiltseriesDoseFilter(XmippProgram):
    name = "xmipp_tomo_tiltseries_dose_filter"

    def defineParams(self):
        self.addUsageLine("Dose-weight a tilt series (Grant & Grigorieff, "
                          "accumulated dose per tilt image).")
        self.addParamsLine("   -i <md_or_stack> : Tilt series (ordered by acquisition)")
        self.addParamsLine("   -o <stack>       : Output filtered series")
        self.addParamsLine("   --dosePerImage <d> : e/A^2 per tilt image")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")
        self.addParamsLine("  [--voltage <kV=300>] : Voltage")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        from xmipp3_tpu.core.metadata_program import load_image_rows
        from xmipp3_tpu.ops.movie import dose_filter
        fn = self.getParam("-i")
        if is_metadata_file(fn):
            md = MetaData(fn)
            imgs = load_image_rows(list(md.iterRows()))
        else:
            imgs = Image.read_stack(fn)
        F, H, W = imgs.shape
        q = dose_filter(H, F, self.getDoubleParam("--dosePerImage"),
                        self.getDoubleParam("--sampling"),
                        voltage=self.getDoubleParam("--voltage"))
        out = np.asarray(jnp.fft.irfft2(jnp.fft.rfft2(jnp.asarray(imgs)) * q,
                                        s=(H, W)))
        save_image(self.getParam("-o"), out)


class ProgTomoDetectMissingWedge(XmippProgram):
    name = "xmipp_tomo_detect_missing_wedge"

    def defineParams(self):
        self.addUsageLine("Detect the missing wedge orientation/angles of a "
                          "tomogram from its Fourier power distribution.")
        self.addParamsLine("   -i <volume> : Input tomogram/subtomogram")

    def run(self):
        import jax.numpy as jnp
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        F = np.asarray(jnp.abs(jnp.fft.fftshift(jnp.fft.fftn(
            jnp.asarray(vol)))))
        D, H, W = F.shape
        z, y, x = np.mgrid[0:D, 0:H, 0:W].astype(np.float64)
        z, y, x = z - D // 2, y - H // 2, x - W // 2
        r = np.sqrt(x * x + y * y + z * z)
        shell = (r > 4) & (r < min(D, H, W) // 2 - 2)
        # wedge assumed about the y axis: power as a function of the angle in
        # the xz plane
        ang = np.degrees(np.arctan2(z, x))
        ang = np.where(ang > 90, ang - 180, np.where(ang < -90, ang + 180, ang))
        bins = np.linspace(-90, 90, 37)
        pw = np.zeros(len(bins) - 1)
        for i in range(len(bins) - 1):
            sel = shell & (ang >= bins[i]) & (ang < bins[i + 1])
            pw[i] = F[sel].mean() if sel.any() else 0.0
        centers = 0.5 * (bins[:-1] + bins[1:])
        thr = 0.5 * np.median(pw)
        missing = pw < thr
        if missing.any():
            th0 = centers[missing].min()
            thF = centers[missing].max()
        else:
            th0 = thF = 0.0
        self.wedge = (float(th0), float(thF))
        print(f"Missing wedge (deg, about y): [{th0:.1f}, {thF:.1f}]")


PROGRAM = None
