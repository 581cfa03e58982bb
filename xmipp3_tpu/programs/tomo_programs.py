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
    """Full reference surface (tomo_extract_subtomograms.cpp:44-330):
    --downsample Fourier-crops each subtomogram by the factor,
    --fixedBoxSize enlarges the extraction window to boxsize*factor so
    the downsampled output is exactly boxsize, --invertContrast negates,
    --normalize zero-means/unit-stds using the outside-sphere background
    statistics (createSphere).  TPU shape: the Fourier crop batch is one
    jitted resize dispatch per subtomogram size."""
    name = "xmipp_tomo_extract_subtomograms"

    def defineParams(self):
        self.addUsageLine("Extract cubic subtomograms at coordinates.")
        self.addParamsLine("   --tomogram <vol> : Input tomogram")
        self.addParamsLine("   --coordinates <md> : xcoor/ycoor/zcoor metadata")
        self.addParamsLine("   --boxsize <b>    : Subtomogram box size "
                           "(before downsampling)")
        self.addParamsLine("   -o <root>        : Output rootname")
        self.addParamsLine("  [--invertContrast] : Invert contrast")
        self.addParamsLine("   alias --invert;")
        self.addParamsLine("  [--normalize]     : Zero mean / unit std "
                           "from the outside-sphere background")
        self.addParamsLine("  [--downsample <factor=1.0>] : Scale factor "
                           "(>1 shrinks the subtomogram by the factor)")
        self.addParamsLine("  [--fixedBoxSize]  : Extract boxsize*factor "
                           "so the downsampled box is exactly boxsize")

    def run(self):
        tomo = np.squeeze(Image(self.getParam("--tomogram")).data
                          ).astype(np.float32)
        md = MetaData(self.getParam("--coordinates"))
        b = self.getIntParam("--boxsize")
        factor = (self.getDoubleParam("--downsample")
                  if self.checkParam("--downsample") else 1.0)
        fixed = self.checkParam("--fixedBoxSize")
        # extraction window / output size (reference extractSubtomoFixedSize)
        if fixed and factor != 1.0:
            b_ext = int(round(b * factor))
            b_out = b
        else:
            b_ext = b
            b_out = int(round(b / factor)) if factor != 1.0 else b
        b_ext += b_ext % 2
        b_out += b_out % 2
        half = b_ext // 2
        Z, Y, X = tomo.shape
        rows = []
        k = 0
        root = self.getParam("-o")
        # background sphere mask at the OUTPUT size (createSphere)
        zz, yy, xx = np.mgrid[0:b_out, 0:b_out, 0:b_out] - b_out // 2
        bg = np.sqrt(zz ** 2 + yy ** 2 + xx ** 2) > b_out // 2
        resize = None
        if b_out != b_ext:
            import jax.numpy as jnp

            from xmipp3_tpu.ops.resize import fourier_resize_3d
            resize = lambda s: np.asarray(fourier_resize_3d(
                jnp.asarray(s), b_out, b_out, b_out))
        for i in md:
            r = md.getRow(i)
            x, y, z = int(r["xcoor"]), int(r["ycoor"]), int(r.get("zcoor", Z // 2))
            if (half <= x < X - half and half <= y < Y - half and
                    half <= z < Z - half):
                s = tomo[z - half:z - half + b_ext,
                         y - half:y - half + b_ext,
                         x - half:x - half + b_ext].copy()
                if resize is not None:
                    s = resize(s)
                if self.checkParam("--invertContrast"):
                    s = -s
                if self.checkParam("--normalize"):
                    mu = float(s[bg].mean())
                    sd = float(s[bg].std())
                    s = (s - mu) / max(sd, 1e-12)
                k += 1
                rows.append({"subtomoName": f"{root}_{k:06d}.mrc",
                             "xcoor": x, "ycoor": y, "zcoor": z, "itemId": k})
                save_image(f"{root}_{k:06d}.mrc", s.astype(np.float32))
        MetaData.fromRows(rows).write(root + ".xmd")
        if self.verbose:
            print(f"Extracted {k} subtomograms of {b_out}^3")
        self.n_extracted = k


class ProgTomoAverageSubtomos(XmippProgram):
    """Full reference surface (tomo_average_subtomos.cpp:38-165): by
    default each subtomogram is rotated/shifted by its row geometry
    (geo2TransformationMatrix) before averaging; --notApplyAlignment
    averages raw; --goldStandard also writes halfMap_1/halfMap_2 from a
    random even split.  TPU shape: all per-row affines run in one
    vmapped dispatch per subtomogram batch."""
    name = "xmipp_tomo_average_subtomos"

    def defineParams(self):
        self.addUsageLine("Average a set of subtomograms, applying their "
                          "alignment.")
        self.addParamsLine("   -i <md>  : Metadata with subtomoName/image "
                           "column")
        self.addParamsLine("   -o <vol> : Output average (with "
                           "--goldStandard, also halfMap_1/2 next to it)")
        self.addParamsLine("  [--notApplyAlignment] : Plain average "
                           "(ignore row geometry)")
        self.addParamsLine("  [--goldStandard] : Also write two half maps "
                           "from a random split")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size (A) "
                           "recorded in the output headers")
        self.addParamsLine("  [--seed <s=0>] : Random split seed")

    def run(self):
        import os

        from xmipp3_tpu.core.geometry import euler_matrix
        from xmipp3_tpu.ops.geo import apply_affine_3d
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        vols = np.stack([
            np.squeeze(Image(str(r.get("subtomoName") or r["image"])).data)
            for r in rows]).astype(np.float32)
        n = len(vols)
        if not self.checkParam("--notApplyAlignment"):
            rot = np.float32([float(r.get("angleRot", 0)) for r in rows])
            tilt = np.float32([float(r.get("angleTilt", 0)) for r in rows])
            psi = np.float32([float(r.get("anglePsi", 0)) for r in rows])
            mats = np.transpose(
                np.asarray(euler_matrix(rot, tilt, psi), np.float32),
                (0, 2, 1))
            sx = np.float32([float(r.get("shiftX", 0)) for r in rows])
            sy = np.float32([float(r.get("shiftY", 0)) for r in rows])
            sz = np.float32([float(r.get("shiftZ", 0)) for r in rows])
            mats = np.concatenate(
                [mats, np.stack([sx, sy, sz], axis=1)[:, :, None]], axis=2)
            import jax
            vols = np.asarray(jax.vmap(
                lambda v, M: apply_affine_3d(v, M[None])[0])(vols, mats))
        Ts = self.getDoubleParam("--sampling") \
            if self.checkParam("--sampling") else 1.0
        avg = vols.mean(axis=0)
        fn_out = self.getParam("-o")
        save_image(fn_out, avg, sampling=Ts)
        if self.checkParam("--goldStandard"):
            rng = np.random.default_rng(self.getIntParam("--seed")
                                        if self.checkParam("--seed") else 0)
            half2_idx = rng.permutation(n)[:n // 2]
            in_h2 = np.zeros(n, bool)
            in_h2[half2_idx] = True
            d = os.path.dirname(fn_out) or "."
            save_image(os.path.join(d, "halfMap_1.mrc"),
                       vols[~in_h2].sum(axis=0) / (n * 0.5), sampling=Ts)
            save_image(os.path.join(d, "halfMap_2.mrc"),
                       vols[in_h2].sum(axis=0) / (n * 0.5), sampling=Ts)


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
    """Full reference surface (tomo_detect_missing_wedge.cpp:30-346): fit
    TWO planes through the Fourier origin, each maximizing the dB-
    magnitude difference between a +-(--width) probe slab's two sides
    within --maxFreq; the second plane is constrained >=20 deg away from
    the first.  --saveMarks writes the magnitude with both probe slabs
    marked; --saveMask writes the wedge mask (1 = missing wedge,
    drawWedge convention z_pos<0 or z_neg>0).  TPU shape: every (rot,
    tilt) candidate scores in ONE batched dot dispatch per refinement
    level (the reference runs a 50-generation differential-evolution +
    Powell per plane)."""
    name = "xmipp_tomo_detect_missing_wedge"

    def defineParams(self):
        self.addUsageLine("Detect the orientation of the missing wedge in "
                          "a tomogram (two bounding planes).")
        self.addParamsLine("   -i <file> : Input tomogram")
        self.addParamsLine("  [--maxFreq <f=0.25>] : Maximum frequency for "
                           "the fit (normalized to 0.5)")
        self.addParamsLine("  [--width <w=2>] : Width of the probe plane "
                           "(Fourier samples)")
        self.addParamsLine("  [--saveMarks] : Save the FFT magnitude with "
                           "the two planes marked (<root>_marks.vol)")
        self.addParamsLine("  [--saveMask] : Save the missing-wedge mask "
                           "(<root>_mask.vol, 1 = missing wedge)")

    @staticmethod
    def _normals(rot_deg, tilt_deg):
        r = np.deg2rad(np.asarray(rot_deg, np.float64))
        t = np.deg2rad(np.asarray(tilt_deg, np.float64))
        # plane normal = Euler(rot, tilt, 0) z-row direction
        return np.stack([np.sin(t) * np.cos(r), np.sin(t) * np.sin(r),
                         np.cos(t)], axis=-1)

    def run(self):
        import jax
        import jax.numpy as jnp
        fn_in = self.getParam("-i")
        vol = np.squeeze(Image(fn_in).data).astype(np.float32)
        D, H, W = vol.shape
        max_freq = self.getDoubleParam("--maxFreq") \
            if self.checkParam("--maxFreq") else 0.25
        width = self.getDoubleParam("--width") \
            if self.checkParam("--width") else 2.0
        Fmag = np.asarray(jnp.abs(jnp.fft.fftn(jnp.asarray(vol))))
        mag_db = 20.0 * np.log10(np.maximum(Fmag, 1e-12))
        fz = np.fft.fftfreq(D)
        fy = np.fft.fftfreq(H)
        fx = np.fft.fftfreq(W)
        FZ, FY, FX = np.meshgrid(fz, fy, fx, indexing="ij")
        r2 = FZ ** 2 + FY ** 2 + FX ** 2
        df = 0.5 / max(D, H, W)
        # hermitian fold: the full-FFT magnitude is centrosymmetric, so a
        # through-origin plane always balances; restrict to the fx>0
        # half-space like the reference's `inverted` XOR (evaluatePlane)
        sel = (r2 <= max_freq * max_freq) & (r2 > 0) & (FX > 1e-9)
        pts = np.stack([FX[sel], FY[sel], FZ[sel]], axis=1)  # (P, 3)
        vals = mag_db[sel]                                   # (P,)
        pts_j = jnp.asarray(pts, jnp.float32)
        vals_j = jnp.asarray(vals, jnp.float32)
        slab = width * df

        @jax.jit
        def score(normals):
            dots = pts_j @ jnp.asarray(normals, jnp.float32).T   # (P, C)
            pos = (dots > 0) & (dots <= slab)
            neg = (dots < 0) & (dots >= -slab)
            s_pos = (vals_j[:, None] * pos).sum(0) / \
                jnp.maximum(pos.sum(0), 1)
            s_neg = (vals_j[:, None] * neg).sum(0) / \
                jnp.maximum(neg.sum(0), 1)
            return s_pos - s_neg        # want MAX difference

        def fit(direction=1.0, exclude=None):
            rot_c, tilt_c, span_r, span_t = 180.0, 0.0, 180.0, 90.0
            best = (0.0, 0.0)
            for level in range(4):
                rots = np.linspace(rot_c - span_r, rot_c + span_r, 25)
                tilts = np.clip(np.linspace(tilt_c - span_t,
                                            tilt_c + span_t, 19), -90, 90)
                rr, tt = np.meshgrid(rots, tilts)
                n = self._normals(rr.ravel(), tt.ravel())
                s = direction * np.asarray(score(n))
                if exclude is not None:
                    ang = np.degrees(np.arccos(
                        np.clip(np.abs(n @ exclude), -1, 1)))
                    s = np.where(ang < 20.0, -np.inf, s)
                k = int(np.argmax(s))
                best = (float(rr.ravel()[k]), float(tt.ravel()[k]))
                rot_c, tilt_c = best
                span_r /= 6.0
                span_t /= 6.0
            return best

        rot_pos, tilt_pos = fit(direction=1.0)
        n_pos = self._normals(rot_pos, tilt_pos)
        rot_neg, tilt_neg = fit(direction=-1.0, exclude=n_pos)
        n_neg = self._normals(rot_neg, tilt_neg)
        print(f"Plane1: {rot_pos} {tilt_pos}")
        print(f"Plane2: {rot_neg} {tilt_neg}")
        self.planes = ((rot_pos, tilt_pos), (rot_neg, tilt_neg))
        # y-axis wedge bound angles from the plane normals: a boundary
        # plane at wedge angle th (about y) has normal (-sin th, 0, cos th)
        ths = []
        for n in (n_pos, n_neg):
            nn = n if n[2] >= 0 else -n       # normal sign is ambiguous
            ths.append(float(np.degrees(np.arctan2(-nn[0], nn[2]))))
        th0, thF = min(ths), max(ths)
        self.wedge = (th0, thF)
        print(f"Missing wedge (deg, about y): [{th0:.1f}, {thF:.1f}]")
        root = fn_in.rsplit(".", 1)[0]
        if self.checkParam("--saveMarks"):
            marks = mag_db.copy()
            for n in (n_pos, n_neg):
                dots = np.stack([FX, FY, FZ], axis=-1) @ n
                in_slab = (np.abs(dots) <= slab) & sel.reshape(D, H, W)
                marks = np.where(in_slab, 2.0 * np.abs(marks), marks)
            save_image(root + "_marks.vol", marks.astype(np.float32))
        if self.checkParam("--saveMask"):
            zpos = np.stack([FX, FY, FZ], axis=-1) @ n_pos
            zneg = np.stack([FX, FY, FZ], axis=-1) @ n_neg
            mask = ((zpos < 0) | (zneg > 0)).astype(np.float32)
            save_image(root + "_mask.vol", mask)


PROGRAM = None
