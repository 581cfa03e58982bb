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
    """Full reference surface (tomo_detect_landmarks.cpp:35-900):
    fiducialSize (A) / samplingRate (A/px) give the landmark size in
    pixels; each tilt image is downsampled so landmarks measure
    --targetLMsize px, directionally enhanced over
    --numberFTdirOfDirections Fourier cones (ops.tomo_landmarks — one
    jitted dispatch for all frames x directions), and peaks more than
    --thrSD sigmas above the mean are reported, scaled back to the
    original pixel grid."""
    name = "xmipp_tomo_detect_landmarks"

    def defineParams(self):
        self.addUsageLine("Detect high-contrast fiducial landmarks in a "
                          "tilt series.")
        self.addParamsLine("   -i <ts>      : Tilt series")
        self.addParamsLine("  [-o <md_file=landmarkCoordinates.xmd>] : "
                           "Landmark coordinates")
        self.addParamsLine("  [--samplingRate <s=1>] : Pixel size (A/px)")
        self.addParamsLine("  [--fiducialSize <f=100>] : Fiducial size (A)")
        self.addParamsLine("  [--targetLMsize <t=8>] : Target landmark "
                           "size (px) after downsampling")
        self.addParamsLine("  [--thrSD <t=5>] : Peak threshold (SDs over "
                           "the mean)")
        self.addParamsLine("   alias --thr;")
        self.addParamsLine("  [--numberFTdirOfDirections <n=8>] : Fourier "
                           "directional-filter cone count")

    def run(self):
        from xmipp3_tpu.ops.resize import fourier_resize_2d
        from xmipp3_tpu.ops.tomo_landmarks import (directional_enhance,
                                                   downsample_factor)
        imgs, tilts = _load_ts(self.getParam("-i"))
        Ts = self.getDoubleParam("--samplingRate")
        fid_px = max(self.getDoubleParam("--fiducialSize") / max(Ts, 1e-6),
                     4.0)
        target = self.getDoubleParam("--targetLMsize")
        thr = self.getDoubleParam("--thrSD")
        n_dirs = self.getIntParam("--numberFTdirOfDirections")
        H, W = imgs.shape[-2:]
        ds = downsample_factor(fid_px, target)
        Hd, Wd = max(int(round(H / ds)), 32), max(int(round(W / ds)), 32)
        Hd -= Hd % 2
        Wd -= Wd % 2
        ds_y, ds_x = H / Hd, W / Wd
        small = np.asarray(fourier_resize_2d(imgs.astype(np.float32),
                                             Hd, Wd))
        # fiducials are dark: negate, then directionally enhance
        enhanced = np.asarray(directional_enhance(
            -(small - small.mean(axis=(1, 2), keepdims=True)),
            float(target), int(n_dirs)))
        rows = []
        half = max(int(round(target)), 3)
        for f in range(len(enhanced)):
            s = enhanced[f].copy()
            mu, sd = s.mean(), s.std()
            for _ in range(80):
                idx = np.argmax(s)
                y, x = divmod(int(idx), Wd)
                if s[y, x] < mu + thr * sd:
                    break
                rows.append({"xcoor": int(round(x * ds_x)),
                             "ycoor": int(round(y * ds_y)),
                             "frameId": f + 1, "cost": float(s[y, x])})
                y0, y1 = max(y - half, 0), min(y + half, Hd)
                x0, x1 = max(x - half, 0), min(x + half, Wd)
                s[y0:y1, x0:x1] = -np.inf
        MetaData.fromRows(rows).write(self.getParam("-o"))
        self.n_landmarks = len(rows)
        if self.verbose:
            print(f"Detected {len(rows)} landmarks")


class ProgTomoFilterCoordinates(XmippProgram):
    """Full reference surface (tomo_filter_coordinates.cpp:40-232):
    optional mask filtering (coordinates whose mask voxel is 0 are
    erased), then per-coordinate statistics from --inTomo: mean and
    stddev over the r2 <= radius neighborhood (the reference compares the
    SQUARED distance against the radius — transliterated faithfully),
    written as avg/stddev columns; near-border coordinates are dropped
    with a warning.  Extension kept: --minScore cost filtering."""
    name = "xmipp_tomo_filter_coordinates"

    def defineParams(self):
        self.addUsageLine("Filter subtomogram coordinates by a mask volume "
                          "and score them against a density/resolution "
                          "tomogram.")
        self.addParamsLine("   --coordinates <md> : Input coordinates")
        self.addParamsLine("   -o <md=filteredCoordinates3D.xmd> : Output "
                           "filtered/scored coordinates")
        self.addParamsLine("  [--inTomo <tomo=\"\">] : Tomogram (density or "
                           "local resolution) for the per-coordinate "
                           "statistics")
        self.addParamsLine("  [--radius <radius=50>] : Neighbourhood radius "
                           "(px) for the statistics")
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
        if self.checkParam("--inTomo") and self.getParam("--inTomo"):
            tomo = np.squeeze(Image(self.getParam("--inTomo")).data
                              ).astype(np.float64)
            Z, Y, X = tomo.shape
            radius = int(self.getDoubleParam("--radius"))
            # reference quirk (calculateCoordinateStatistics): the ball is
            # r2 <= radius (squared distance vs radius), i.e. an effective
            # sqrt(radius) voxel ball
            rr = int(np.floor(np.sqrt(radius))) + 1
            off = np.mgrid[-rr:rr + 1, -rr:rr + 1, -rr:rr + 1]
            ball = (off[0] ** 2 + off[1] ** 2 + off[2] ** 2) <= radius
            dz, dy, dx = (o[ball] for o in off)
            scored = []
            for r in rows:
                x, y = int(r["xcoor"]), int(r["ycoor"])
                z = int(r.get("zcoor", Z // 2))
                if (z - radius < 0 or z + radius > Z - 1
                        or y - radius < 0 or y + radius > Y - 1
                        or x - radius < 0 or x + radius > X - 1):
                    print(f"WARNING: Coordinate at (x={x}, y={y}, z={z}) "
                          "masked out.")
                    continue
                v = tomo[z + dz, y + dy, x + dx]
                d = dict(r)
                d["avg"] = float(v.mean())
                d["stddev"] = float(v.std())
                scored.append(d)
            rows = scored
        MetaData.fromRows(rows).write(self.getParam("-o"))
        self.n_kept = len(rows)


class ProgTomoMapBack(XmippProgram):
    """Full reference surface (tomo_map_back.cpp:38-150): paint the
    reference subtomogram into the tomogram at each --geom row's
    (xcoor, ycoor, zcoor) after applying the row's geometry (Euler
    angles/shifts, geo2TransformationMatrix); painting modes copy, avg
    (region set to its tomogram average inside the thresholded
    reference), highlight (+= K*ref) and copy_binary.  TPU shape: all
    rotated references are produced in one vmapped affine dispatch."""
    name = "xmipp_tomo_map_back"

    def defineParams(self):
        self.addUsageLine("Place a reference subtomogram on a tomogram at "
                          "given locations (map back).")
        self.addParamsLine("   -i <tomogram>    : Original tomogram")
        self.addParamsLine("   alias --tomogram;")
        self.addParamsLine("  [-o <tomogram=\"\">] : Output tomogram")
        self.addParamsLine("   --geom <geometry> : Coordinates and rotation "
                           "angles metadata")
        self.addParamsLine("   alias --coordinates;")
        self.addParamsLine("   --ref <reference> : Subtomogram reference")
        self.addParamsLine("  [--method <mode=copy>] : Painting mode")
        self.addParamsLine("     where <mode>")
        self.addParamsLine("        copy")
        self.addParamsLine("        avg <threshold=0.5>")
        self.addParamsLine("        highlight <K=1>")
        self.addParamsLine("        copy_binary <threshold=0.5>")

    def run(self):
        from xmipp3_tpu.core.geometry import euler_matrix
        from xmipp3_tpu.ops.geo import apply_affine_3d
        tomo = np.squeeze(Image(self.getParam("-i")).data
                          ).astype(np.float32)
        ref = np.squeeze(Image(self.getParam("--ref")).data
                         ).astype(np.float32)
        md = MetaData(self.getParam("--geom"))
        mode = self.getParam("--method") if self.checkParam("--method") \
            else "copy"
        thr = 0.5
        K = 1.0
        if mode in ("avg", "copy_binary") and self.checkParam("--method"):
            try:
                thr = self.getDoubleParam("--method", 1)
            except Exception:
                pass
        if mode == "highlight" and self.checkParam("--method"):
            try:
                K = self.getDoubleParam("--method", 1)
            except Exception:
                pass
        if mode in ("avg", "copy_binary"):
            ref = (ref > thr).astype(np.float32)
        rows = list(md.iterRows())
        rot = np.float32([float(r.get("angleRot", 0)) for r in rows])
        tilt = np.float32([float(r.get("angleTilt", 0)) for r in rows])
        psi = np.float32([float(r.get("anglePsi", 0)) for r in rows])
        # geo2TransformationMatrix: the inverse Euler rotation places the
        # reference in the tomogram frame
        mats = np.asarray(euler_matrix(rot, tilt, psi), np.float32)
        mats = np.transpose(mats, (0, 2, 1))          # A^T = inverse
        rot_refs = np.asarray(apply_affine_3d(ref, mats))
        out = tomo.copy()
        pz, py, px = ref.shape
        Z, Y, X = tomo.shape
        for n, r in enumerate(rows):
            x0 = int(r["xcoor"]) - px // 2
            y0 = int(r["ycoor"]) - py // 2
            z0 = int(r.get("zcoor", Z // 2)) - pz // 2
            zs = slice(max(z0, 0), min(z0 + pz, Z))
            ys = slice(max(y0, 0), min(y0 + py, Y))
            xs = slice(max(x0, 0), min(x0 + px, X))
            rzs = slice(zs.start - z0, zs.stop - z0)
            rys = slice(ys.start - y0, ys.stop - y0)
            rxs = slice(xs.start - x0, xs.stop - x0)
            rr = rot_refs[n][rzs, rys, rxs]
            region = out[zs, ys, xs]
            if mode == "avg":
                # the region average is taken over the tomogram voxels
                # under the whole reference box (reference mode==2 loop)
                avg = float(region.mean()) if region.size else 0.0
                out[zs, ys, xs] = np.where(rr > 0, avg, region)
            elif mode == "highlight":
                out[zs, ys, xs] = region + K * rr
            else:                       # copy / copy_binary
                out[zs, ys, xs] = rr
        save_image(self.getParam("-o") or "mapback.mrc", out)


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
    """Full reference surface subtomo_subtraction.cpp:48-494: per-subtomo
    POCS adjustment of the aligned particle to the reference (amplitude /
    min-max / mask / phase / nonnegativity / std projections via
    ops.pocs.volume_adjust), optional subtraction, alignment recovered on
    output."""
    name = "xmipp_subtomo_subtraction"

    def defineParams(self):
        self.addUsageLine("Adjust each subtomogram to a reference volume "
                          "by POCS iteration and optionally subtract.")
        self.addParamsLine("   -i <md>    : Metadata with the subtomograms")
        self.addParamsLine("   --ref <volume> : Reference volume")
        self.addParamsLine("  [--oroot <root=\"\">] : Output rootname")
        self.addParamsLine("  [-o <out=\"\">] : Output metadata (alias of "
                           "--oroot)")
        self.addParamsLine("  [--sub] : Perform the subtraction; the "
                           "output is the difference")
        self.addParamsLine("  [--sigma <s=3>] : Decay of the filter to "
                           "smooth the mask transition")
        self.addParamsLine("  [--iter <n=5>] : Adjustment iterations")
        self.addParamsLine("  [--mask1 <mask=\"\">] : Mask for volume 1")
        self.addParamsLine("  [--mask2 <mask=\"\">] : Mask for volume 2")
        self.addParamsLine("  [--maskSub <mask=\"\">] : Mask for the "
                           "subtraction region")
        self.addParamsLine("  [--cutFreq <f=0>] : Low-pass both volumes at "
                           "this cutoff frequency (<0.5)")
        self.addParamsLine("  [--lambda <l=1>] : Relaxation factor for the "
                           "Fourier amplitude POCS")
        self.addParamsLine("  [--radavg] : Match radially averaged Fourier "
                           "amplitudes instead of direct ones")
        self.addParamsLine("  [--computeEnergy] : Print the energy "
                           "difference between iterations")
        self.addParamsLine("  [--saveV1 <structure=\"\">] : Save the "
                           "filtered reference (with --sub)")
        self.addParamsLine("  [--saveV2 <structure=\"\">] : Save the "
                           "adjusted subtomogram (with --sub)")

    def run(self):
        import jax.numpy as jnp
        from scipy.ndimage import gaussian_filter

        from xmipp3_tpu.core.geometry import euler_matrix
        from xmipp3_tpu.ops import pocs
        from xmipp3_tpu.ops.geo import apply_affine_3d

        ref = np.squeeze(Image(self.getParam("--ref")).data
                         ).astype(np.float32)
        md = MetaData(self.getParam("-i"))
        root = self.getParam("--oroot") if self.checkParam("--oroot") and \
            self.getParam("--oroot") else self.getParam("-o")
        if root.endswith(".xmd"):
            root = root[:-4]
        perform_sub = self.checkParam("--sub")
        iters = self.getIntParam("--iter")
        sigma = self.getIntParam("--sigma")
        cut = self.getDoubleParam("--cutFreq")
        lam = self.getDoubleParam("--lambda")
        radavg = self.checkParam("--radavg")
        compute_e = self.checkParam("--computeEnergy")
        fn_v1f = self.getParam("--saveV1") or "volume1_filtered.mrc"
        fn_v2a = self.getParam("--saveV2") or "volume2_adjusted.mrc"

        # createMask (subtomo_subtraction.cpp:371-375): mask1*mask2 or all-1
        mask = None
        if self.getParam("--mask1") and self.getParam("--mask2"):
            m1 = np.squeeze(Image(self.getParam("--mask1")).data)
            m2 = np.squeeze(Image(self.getParam("--mask2")).data)
            mask = ((m1 > 0) & (m2 > 0)).astype(np.float32)
        if self.getParam("--maskSub"):
            masksub = np.squeeze(Image(self.getParam("--maskSub")).data
                                 ).astype(np.float32)
        else:
            base = np.ones(ref.shape, np.float32) if mask is None else mask
            masksub = gaussian_filter(base, sigma)

        rows = []
        k = 0
        for i in md:
            r = md.getRow(i)
            label = "image" if "image" in r else "subtomoName"
            v = np.squeeze(Image(str(r[label])).data).astype(np.float32)
            rot = float(r.get("angleRot", 0.0))
            tilt = float(r.get("angleTilt", 0.0))
            psi = float(r.get("anglePsi", 0.0))
            s = np.array([float(r.get("shiftX", 0.0)),
                          float(r.get("shiftY", 0.0)),
                          float(r.get("shiftZ", 0.0))], np.float32)
            aligned_pose = rot or tilt or psi or s.any()
            E = np.asarray(euler_matrix(rot, tilt, psi), np.float32)
            if aligned_pose:
                # Euler_rotate + selfTranslate (cpp:399-407): content at p
                # moves to E^T p + s
                M1 = np.concatenate([E.T, s[:, None]], axis=1)
                v = np.asarray(apply_affine_3d(v, M1[None]))[0]
            if compute_e:
                adj = jnp.asarray(v)
                for it in range(iters):
                    prev = adj
                    adj = pocs.volume_adjust(ref, prev, mask=mask, iters=1,
                                             lam=lam, radavg=radavg,
                                             cut_freq=cut)
                    e = float(np.asarray(((adj - prev) ** 2).mean()))
                    print(f"Energy difference iteration {it}: {e:.6g}")
                adj = np.asarray(adj)
            else:
                adj = np.asarray(pocs.volume_adjust(
                    ref, v, mask=mask, iters=iters, lam=lam, radavg=radavg,
                    cut_freq=cut))
            if perform_sub:
                save_image(fn_v2a, adj)
                v1f = np.asarray(
                    jnp.fft.irfftn(jnp.fft.rfftn(jnp.asarray(ref))
                                   * pocs._lowpass3d(ref.shape, cut),
                                   ref.shape) if cut else ref)
                save_image(fn_v1f, v1f.astype(np.float32))
                out = np.asarray(pocs.subtract_adjusted(ref, adj, masksub,
                                                        cut))
            else:
                out = adj
            if aligned_pose:
                # recover original alignment (cpp:479-487)
                M2 = np.concatenate([E, -(E @ s)[:, None]], axis=1)
                out = np.asarray(apply_affine_3d(out, M2[None]))[0]
            k += 1
            fn = f"{root}_{k:06d}.mrc"
            save_image(fn, out.astype(np.float32))
            d = dict(r)
            d[label] = fn
            rows.append(d)
        MetaData.fromRows(rows).write(root + ".xmd")


PROGRAM = None
