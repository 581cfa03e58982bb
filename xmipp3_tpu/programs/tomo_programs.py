"""Tomography programs: project (tilt series), simulate_tilt_series,
extract_subtomograms, average_subtomos, tiltseries_dose_filter,
detect_missing_wedge.

Contracts: reference libraries/tomo/ set (SURVEY.md §2.3 Tomography):
tomo_project, tomo_simulate_tilt_series, tomo_extract_subtomograms
(tomo_extract_subtomograms), tomo_average_subtomos,
tomo_tiltseries_dose_filter, tomo_detect_missing_wedge.
"""
from __future__ import annotations

import os

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
    """Full reference surface (tomo_simulate_tilt_series.{h,cpp}): plants
    oriented copies of a particle volume into a ground-truth tomogram,
    projects each particle per tilt angle into the tilt series at its
    tilted position, adds gold fiducials and noise.  Unlike the reference
    — which creates the fiducial image/volume but never inserts them
    (cpp:224-230 dead arrays) — fiducials here are actually placed in
    both the tomogram and the tilt series."""
    name = "xmipp_tomo_simulate_tilt_series"

    def defineParams(self):
        self.addUsageLine("Simulate a tilt series + ground-truth tomogram "
                          "from coordinates and a particle volume.")
        self.addParamsLine("   --coordinates <md> : xcoor/ycoor/zcoor "
                           "(+ optional rot/tilt/psi) of particles")
        self.addParamsLine("   --vol <particle>   : Particle volume to plant")
        self.addParamsLine("  [-o <root=\"\">]      : Output rootname "
                           "(legacy; else use --tiltseries/--tomogram)")
        self.addParamsLine("  [--tiltseries <mrc=\"\">] : Output tilt series")
        self.addParamsLine("  [--tomogram <mrc=\"\">]   : Output tomogram")
        self.addParamsLine("  [--xdim <x=256>]    : Tilt-image/tomogram X size")
        self.addParamsLine("  [--ydim <y=256>]    : Tilt-image/tomogram Y size")
        self.addParamsLine("  [--thickness <z=64>] : Tomogram thickness (px)")
        self.addParamsLine("   alias --zdim;")
        self.addParamsLine("  [--minTilt <t=-60>] : Minimum tilt angle")
        self.addParamsLine("  [--maxTilt <t=60>]  : Maximum tilt angle")
        self.addParamsLine("  [--tiltStep <t=3>]  : Tilt angle step")
        self.addParamsLine("  [--tiltRange <t0=-60> <tF=60> <step=3>] : "
                           "Legacy combined tilt scheme")
        self.addParamsLine("  [--sampling <s=1>]  : Sampling rate (A/px)")
        self.addParamsLine("  [--fiducialCoordinates <md=\"\">] : Fiducial "
                           "coordinates in the tomogram")
        self.addParamsLine("  [--fiducialDiameter <d=100>] : Fiducial "
                           "diameter (A)")
        self.addParamsLine("  [--sigmaNoise <s=-1>] : Noise stddev")
        self.addParamsLine("   alias --noise;")

    def run(self):
        from scipy.ndimage import affine_transform
        from xmipp3_tpu.core.geometry import euler_matrix
        from xmipp3_tpu.ops.project import FourierProjector
        md = MetaData(self.getParam("--coordinates"))
        part = np.squeeze(Image(self.getParam("--vol")).data
                          ).astype(np.float32)
        X = self.getIntParam("--xdim")
        Y = self.getIntParam("--ydim")
        Z = self.getIntParam("--thickness")
        if self.checkParam("--tiltRange"):
            t0 = self.getDoubleParam("--tiltRange", 0)
            tF = self.getDoubleParam("--tiltRange", 1)
            step = self.getDoubleParam("--tiltRange", 2)
        else:
            t0 = self.getDoubleParam("--minTilt")
            tF = self.getDoubleParam("--maxTilt")
            step = self.getDoubleParam("--tiltStep")
        tilts = np.arange(t0, tF + 1e-6, step).astype(np.float32)
        sampling = self.getDoubleParam("--sampling")
        sigma = self.getDoubleParam("--sigmaNoise")
        root = self.getParam("-o") if self.checkParam("-o") else ""
        fn_ts = (self.getParam("--tiltseries")
                 if self.checkParam("--tiltseries")
                 and self.getParam("--tiltseries") else root + ".mrcs")
        fn_tomo = (self.getParam("--tomogram")
                   if self.checkParam("--tomogram")
                   and self.getParam("--tomogram")
                   else root + "_tomogram.mrc")

        box = part.shape[-1]
        half = box // 2
        tomo = np.zeros((Z, Y, X), np.float32)
        series = np.zeros((len(tilts), Y, X), np.float32)
        # spherical mask with a smooth rim (maskingRotatedSubtomo)
        zz, yy, xx = np.mgrid[0:box, 0:box, 0:box].astype(np.float32) - half
        r = np.sqrt(zz * zz + yy * yy + xx * xx)
        sph = np.clip((half - r) / 2.0, 0.0, 1.0)
        rng = np.random.default_rng(0)
        ct = np.cos(np.deg2rad(tilts))
        st = np.sin(np.deg2rad(tilts))

        def paste2d(img, patch, xc, yc):
            b = patch.shape[0]
            x0, y0 = int(xc) - b // 2, int(yc) - b // 2
            if x0 < 0 or y0 < 0 or x0 + b > X or y0 + b > Y:
                return
            img[y0:y0 + b, x0:x0 + b] += patch

        for row in md.iterRows():
            xc = int(row["xcoor"])
            yc = int(row["ycoor"])
            zc = int(row.get("zcoor", 0))
            if "anglePsi" in row or "angleRot" in row:
                # the reference reads (theta,phi,xi) = (psi,tilt,rot),
                # tomo_simulate_tilt_series.cpp:283-287
                theta = float(row.get("anglePsi", 0.0))
                phi = float(row.get("angleTilt", 0.0))
                xi = float(row.get("angleRot", 0.0))
            else:
                theta = 360.0 * rng.random()
                phi = np.degrees(np.arccos(2 * rng.random() - 1.0))
                xi = 360.0 * rng.random()
            R = np.asarray(euler_matrix(theta, phi, xi), np.float64)
            Rz = R[::-1, ::-1]       # (x,y,z) rotation in (z,y,x) indexing
            c = np.asarray(part.shape) // 2
            rot_part = affine_transform(
                part, np.linalg.inv(Rz),
                offset=c - np.linalg.inv(Rz) @ c, order=3,
                mode="constant").astype(np.float32) * sph
            # ground-truth tomogram (negated densities, placeSubtomoInTomo)
            z0 = Z // 2 + zc - half
            y0 = Y // 2 + yc - half
            x0 = X // 2 + xc - half
            if (0 <= z0 and z0 + box <= Z and 0 <= y0 and y0 + box <= Y
                    and 0 <= x0 and x0 + box <= X):
                tomo[z0:z0 + box, y0:y0 + box, x0:x0 + box] = -rot_part
            # per-tilt projections at the tilted particle position
            proj = FourierProjector(rot_part, 2.0)
            imgs = np.asarray(proj.project_euler(
                np.zeros_like(tilts), tilts, np.zeros_like(tilts)))
            for idx in range(len(tilts)):
                x2d = int(xc * ct[idx] + zc * st[idx]) + X // 2
                y2d = yc + Y // 2
                paste2d(series[idx], imgs[idx], x2d, y2d)

        # fiducials: disk in projections, ball in the tomogram
        fn_fid = (self.getParam("--fiducialCoordinates")
                  if self.checkParam("--fiducialCoordinates") else "")
        if fn_fid:
            fid_px = max(int(round(self.getDoubleParam("--fiducialDiameter")
                                   / sampling)), 3)
            amp = 5.0 * max(sigma, 1.0)
            fy, fx = np.mgrid[0:fid_px, 0:fid_px] - fid_px // 2
            disk = np.where(fx * fx + fy * fy < (fid_px / 2) ** 2, amp,
                            0.0).astype(np.float32)
            fz, fy, fx = np.mgrid[0:fid_px, 0:fid_px, 0:fid_px] \
                - fid_px // 2
            ball = np.where(fx * fx + fy * fy + fz * fz
                            < (fid_px / 2) ** 2, amp, 0.0
                            ).astype(np.float32)
            for row in MetaData(fn_fid).iterRows():
                xc, yc = int(row["xcoor"]), int(row["ycoor"])
                zc = int(row.get("zcoor", 0))
                z0 = Z // 2 + zc - fid_px // 2
                y0 = Y // 2 + yc - fid_px // 2
                x0 = X // 2 + xc - fid_px // 2
                if (0 <= z0 and z0 + fid_px <= Z and 0 <= y0
                        and y0 + fid_px <= Y and 0 <= x0
                        and x0 + fid_px <= X):
                    tomo[z0:z0 + fid_px, y0:y0 + fid_px,
                         x0:x0 + fid_px] -= ball
                for idx in range(len(tilts)):
                    x2d = int(xc * ct[idx] + zc * st[idx]) + X // 2
                    paste2d(series[idx], disk, x2d, yc + Y // 2)

        series = -series                        # cryo contrast convention
        if sigma > 0:
            series = series + rng.normal(0, sigma, series.shape
                                         ).astype(np.float32)
            tomo = tomo + rng.normal(0, sigma / box, tomo.shape
                                     ).astype(np.float32)
        save_image(fn_ts, series)
        save_image(fn_tomo, tomo)
        fn_xmd = os.path.splitext(fn_ts)[0] + ".xmd"
        MetaData.fromRows([
            {"image": f"{i + 1:06d}@{fn_ts}",
             "angleTilt": float(tilts[i]),
             "tiltAngle": float(tilts[i]), "itemId": i + 1}
            for i in range(len(tilts))]).write(fn_xmd)


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
