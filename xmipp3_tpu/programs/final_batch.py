"""Remaining endpoint batch: metadata_xml/split_3D, phantom_movie,
image_peak_high_contrast, coordinates_noisy_zones_filter, volumeset_align,
pdb_analysis/label_from_volume/reduce_pseudoatoms/sph_deform,
compare_density, tilt pairs, ctf_correct_wiener3d,
transform_adjust_volume_grey_levels.

Contracts: SURVEY.md Appendix A leftovers.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.pdb import AtomicModel, read_pdb, write_pdb
from xmipp3_tpu.core.program import XmippProgram


class ProgMetadataXML(XmippProgram):
    name = "xmipp_metadata_xml"

    def defineParams(self):
        self.addUsageLine("Export a picking metadata as particlepicking XML "
                          "(metadata_xml.cpp:56-120) or a generic table.")
        self.addParamsLine("   -i <md_file> : Input metadata")
        self.addParamsLine("   -o <xml>     : Output XML")
        self.addParamsLine("  [--extractParticlesMD] : Input comes from the ExtractParticles protocol (single block, micrograph column, disabled rows dropped)")
        self.addParamsLine("  [--root <name=metadata>] : Root element name (generic table mode)")

    @staticmethod
    def _coord_xml(f, md):
        for i in md:
            r = md.getRow(i)
            x = int(float(r.get("xcoor", 0) or 0))
            y = int(float(r.get("ycoor", 0) or 0))
            f.write(f'<coordinate x="{x}" y="{y}"/>\n')

    def run(self):
        import os
        fn_in = self.getParam("-i")
        get_blocks_in_metadata = MetaData.blocksInFile
        md = MetaData(fn_in)
        if self.checkParam("--extractParticlesMD"):
            # single extract_particles table: group rows by micrograph
            md.removeDisabled()
            md.sort("micrograph")
            with open(self.getParam("-o"), "w") as f:
                f.write("<particlepicking>\n")
                cur = None
                for i in md:
                    r = md.getRow(i)
                    mic = os.path.splitext(os.path.basename(
                        str(r.get("micrograph", ""))))[0]
                    if mic != cur:
                        if cur is not None:
                            f.write("</micrograph>\n")
                        f.write(f'<micrograph id="{mic}">\n')
                        cur = mic
                    x = int(float(r.get("xcoor", 0) or 0))
                    y = int(float(r.get("ycoor", 0) or 0))
                    f.write(f'<coordinate x="{x}" y="{y}"/>\n')
                if cur is not None:
                    f.write("</micrograph>\n")
                f.write("</particlepicking>\n")
            return
        try:
            blocks = get_blocks_in_metadata(fn_in)
        except Exception:
            blocks = []
        if blocks and md.containsLabel("xcoor"):
            # per-micrograph picking blocks (reference default mode)
            with open(self.getParam("-o"), "w") as f:
                f.write("<particlepicking>\n")
                for b in blocks:
                    bmd = MetaData(f"{b}@{fn_in}")
                    mic = b.split("_", 1)[-1]
                    f.write(f'<micrograph id="{mic}">\n')
                    self._coord_xml(f, bmd)
                    f.write("</micrograph>\n")
                f.write("</particlepicking>\n")
            return
        root = self.getParam("--root")
        with open(self.getParam("-o"), "w") as f:
            f.write("<?xml version='1.0' encoding='utf-8'?>\n")
            f.write(f"<{root}>\n")
            for i in md:
                r = md.getRow(i)
                f.write("  <ROW ")
                for k, v in r.items():
                    if isinstance(v, np.ndarray):
                        v = " ".join(f"{x:g}" for x in v)
                    f.write(f'{k}="{v}" ')
                f.write("/>\n")
            f.write(f"</{root}>\n")


class ProgMetadataSplit3D(XmippProgram):
    name = "xmipp_metadata_split_3d"

    def defineParams(self):
        self.addUsageLine("Split particles into correlates-well/-poorly "
                          "halves per projection direction "
                          "(metadata_split_3D.cpp:63-210): for each gallery "
                          "direction the neighbouring images are split at "
                          "their median maxCC and each imageIndex "
                          "accumulates +-1 votes.")
        self.addParamsLine("   -i <md_file> : Input with angles, imageIndex and maxCC")
        self.addParamsLine("  [--vol <volume=\"\">] : Reference volume (directions are generated from --sym/--angSampling; the volume itself is not reprojected)")
        self.addParamsLine("  [--oroot <root=split>] : Output rootname")
        self.addParamsLine("  [--sym <symmetry_file=c1>] : Symmetry")
        self.addParamsLine("  [--angSampling <a=5>] : Angular sampling (deg)")
        self.addParamsLine("  [--maxDist <a=10>] : Maximum angular distance (deg)")

    def run(self):
        from xmipp3_tpu.core.sampling import (compute_sampling_points,
                                              remove_redundant_points)
        from xmipp3_tpu.core.sym import SymList
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        root = self.getParam("--oroot") or "split"
        sym = self.getParam("--sym") if self.checkParam("--sym") else "c1"
        samp = (self.getDoubleParam("--angSampling")
                if self.checkParam("--angSampling") else 5.0)
        max_dist = np.deg2rad(self.getDoubleParam("--maxDist")
                              if self.checkParam("--maxDist") else 10.0)

        def direction(rot, tilt):
            r, t = np.deg2rad(rot), np.deg2rad(tilt)
            return np.array([np.cos(r) * np.sin(t),
                             np.sin(r) * np.sin(t), np.cos(t)])

        dirs_in = np.stack([
            direction(float(r.get("angleRot", 0) or 0),
                      float(r.get("angleTilt", 0) or 0)) for r in rows])
        refno = np.array([int(r.get("imageIndex", i) or i)
                          for i, r in enumerate(rows)])
        cc = np.array([float(r.get("maxCC", 0) or 0) for r in rows])

        gal = compute_sampling_points(samp, 0.0, 90.0)
        gal = remove_redundant_points(gal, SymList(sym))
        gal_dirs = np.stack([direction(a[0], a[1]) for a in gal])

        votes = np.zeros(int(refno.max()) + 1)
        cosmax = np.cos(max_dist)
        for gd in gal_dirs:
            near = (dirs_in @ gd) > cosmax
            if not near.any():
                continue
            # one vote per distinct imageIndex at its best cc
            idxs = refno[near]
            ccs = cc[near]
            best: dict[int, float] = {}
            for k, c in zip(idxs, ccs):
                if c > best.get(int(k), -np.inf):
                    best[int(k)] = float(c)
            vals = np.array(sorted(best.values()))
            med = vals[len(vals) // 2]
            for k, c in best.items():
                votes[k] += 1.0 if c > med else -1.0

        upper, lower = [], []
        for i, r in enumerate(rows):
            d = dict(r)
            d["cost"] = float(votes[refno[i]])
            if votes[refno[i]] > 0:
                upper.append(d)
            elif votes[refno[i]] < 0:
                lower.append(d)
        MetaData.fromRows(upper or [{"image": ""}]).write(root + "_upper.xmd")
        MetaData.fromRows(lower or [{"image": ""}]).write(root + "_lower.xmd")
        # compatibility with the previous _1/_2 naming used by our tests
        MetaData.fromRows(upper or [{"image": ""}]).write(root + "_1.xmd")
        MetaData.fromRows(lower or [{"image": ""}]).write(root + "_2.xmd")


class ProgPhantomMovie(XmippProgram):
    """Synthetic movie generator with the reference's full displacement/
    ice/dose model (phantom_movie_main.cpp:41-83, phantom_movie.cpp:30-66
    shift polynomials, :70-93 barrel distortion, :262-280 ice + low-pass,
    :276-305 per-frame resampling and Poisson dose)."""
    name = "xmipp_phantom_movie"

    def defineParams(self):
        self.addUsageLine("Generate a synthetic movie (drifting grid/"
                          "particle scene over low-passed ice, barrel "
                          "distortion, Poisson dose) for testing movie "
                          "alignment (reference phantom_movie).")
        self.addParamsLine("  [-size <x=4096> <y=4096> <n=40>] : Frame size "
                           "and frame count")
        self.addParamsLine("     alias --size;")
        self.addParamsLine("   -o <movie>   : Output stack")
        self.addParamsLine("  [--type <t=grid>] : Scene content")
        self.addParamsLine("      where <t> grid circle cross")
        self.addParamsLine("  [--step <x=50> <y=50>] : Grid period (px)")
        self.addParamsLine("  [--particleSize <min=40> <max=50>] : Particle "
                           "diameter range (circle/cross types)")
        self.addParamsLine("  [--count <c=100>] : Number of particles")
        self.addParamsLine("  [--thickness <t=5>] : Grid-line / cross-arm "
                           "thickness (px)")
        self.addParamsLine("  [--signal <t=0.15>] : Signal added over the "
                           "ice background")
        self.addParamsLine("  [--shift <a1=-0.039> <a2=0.002> <b1=-0.02> "
                           "<b2=0.002>] : Global drift polynomial "
                           "x(t)=a1*t+a2*t^2+cos(t/10)/10, "
                           "y(t)=b1*t+b2*t^2+sin(t^2)/5")
        self.addParamsLine("  [--barrel <k1_start=0.01> <k1_end=0.015> "
                           "<k2_start=0.01> <k2_end=0.015>] : Barrel "
                           "distortion coefficients (linear in frame index)")
        self.addParamsLine("  [--simple] : Use only the linear drift term")
        self.addParamsLine("  [--skipBarrel] : No barrel distortion")
        self.addParamsLine("  [--skipShift] : No drift")
        self.addParamsLine("  [--shiftAfterBarrel] : Apply drift after the "
                           "barrel distortion")
        self.addParamsLine("  [--skipDose] : No Poisson shot noise")
        self.addParamsLine("  [--skipIce] : No ice background")
        self.addParamsLine("  [--gain <file=\"\">] : Write a (unit) gain "
                           "reference image")
        self.addParamsLine("  [--dark <file=\"\">] : Write a (zero) dark "
                           "reference image")
        self.addParamsLine("  [--seed <s=42>]    : Random seed")
        self.addParamsLine("  [--ice <avg=1.0> <stddev=1.0> <min=0.0> "
                           "<max=2.0>] : Ice noise statistics and final "
                           "range")
        self.addParamsLine("  [--low <w1=0.05> <raisedW=0.02>] : Ice "
                           "low-pass cutoff and raised-cosine width")
        self.addParamsLine("  [--dose <mean=1>] : Electron dose (Poisson "
                           "scale)")

    def _shift(self, t):
        a1, a2 = (self.getDoubleParam("--shift", k) for k in (0, 1))
        b1, b2 = (self.getDoubleParam("--shift", k) for k in (2, 3))
        t = float(t)
        if self.checkParam("--simple"):
            return a1 * t, b1 * t
        return (a1 * t + a2 * t * t + np.cos(t / 10.0) / 10.0,
                b1 * t + b2 * t * t + np.sin(t * t) / 5.0)

    def _displace(self, x, y, n, F, X, Y):
        """Source coordinates in the reference frame for output pixel
        (x, y) of frame n (phantom_movie.cpp:70-93)."""
        if self.checkParam("--skipShift"):
            sx = sy = 0.0
        else:
            sx, sy = self._shift(F - n - 1)   # reversed order (see ref doc)
        if self.checkParam("--skipBarrel"):
            return x + sx, y + sy
        after = self.checkParam("--shiftAfterBarrel")
        k1s, k1e, k2s, k2e = (self.getDoubleParam("--barrel", k)
                              for k in range(4))
        g = n / max(F - 1, 1)
        k1 = k1s + g * (k1e - k1s)
        k2 = k2s + g * (k2e - k2s)
        xc, yc = X / 2.0, Y / 2.0
        xn = (x - xc + (0.0 if after else sx)) / xc
        yn = (y - yc + (0.0 if after else sy)) / yc
        r2 = xn * xn + yn * yn
        scale = 1 + k1 * r2 + k2 * r2 * r2
        return (xn * scale * xc + xc + (sx if after else 0.0),
                yn * scale * yc + yc + (sy if after else 0.0))

    def _add_content(self, ref, rng):
        sig = self.getDoubleParam("--signal")
        thick = self.getIntParam("--thickness")
        kind = self.getParam("--type")
        Yr, Xr = ref.shape
        if kind == "grid":
            xs = self.getIntParam("--step", 0)
            ys = self.getIntParam("--step", 1)
            for y0 in range(ys - thick // 2, Yr - thick // 2, ys):
                ref[y0:y0 + thick, :] += sig
            for x0 in range(xs, Xr - thick // 2, xs):
                ref[:, x0:x0 + thick] += sig
            return
        mn = self.getIntParam("--particleSize", 0)
        mx = self.getIntParam("--particleSize", 1)
        count = self.getIntParam("--count")
        lo = mx // 2 + thick // 2
        yy, xx = np.mgrid[0:Yr, 0:Xr]
        for _ in range(count):
            s = int(rng.integers(mn, mx + 1)) // 2
            x = int(rng.integers(lo, Xr - lo))
            y = int(rng.integers(lo, Yr - lo))
            if kind == "circle":
                d2 = (yy - y) ** 2 + (xx - x) ** 2
                ref[(d2 <= s * s) & (d2 >= (s - thick) ** 2)] += sig
            else:  # cross: X-shaped diagonals, thickened
                for t in range(max(thick // 2, 1)):
                    for d in range(s):
                        for oy, ox in ((-t, 0), (t, 0), (0, -t), (0, t)):
                            cy, cx = y + oy, x + ox
                            ref[cy - d, cx - d] += sig
                            ref[cy - d, cx + d] += sig
                            ref[cy + d, cx - d] += sig
                            ref[cy + d, cx + d] += sig

    def run(self):
        X = self.getIntParam("-size", 0)
        Y = self.getIntParam("-size", 1)
        F = self.getIntParam("-size", 2)
        seed = self.getIntParam("--seed")
        rng = np.random.default_rng(seed)
        # work size: pad the reference frame by the maximal |displacement|
        # so every output pixel samples inside it (findWorkSize)
        mx = my = 0.0
        for n in range(F):
            for cx, cy in ((0.0, 0.0), (X - 1.0, Y - 1.0)):
                dx, dy = self._displace(cx, cy, n, F, X, Y)
                mx = max(mx, abs(dx - cx), 1.0)
                my = max(my, abs(dy - cy), 1.0)
        Xr = X + 2 * (int(np.ceil(mx)) + 2)
        Yr = Y + 2 * (int(np.ceil(my)) + 2)
        ref = np.zeros((Yr, Xr), np.float32)
        if not self.checkParam("--skipIce"):
            avg, std, vmin, vmax = (self.getDoubleParam("--ice", k)
                                    for k in range(4))
            ref = (avg + std * rng.standard_normal((Yr, Xr))
                   ).astype(np.float32)
            import jax.numpy as jnp
            from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                                       low_pass_mask)
            w1 = self.getDoubleParam("--low", 0)
            rw = self.getDoubleParam("--low", 1)
            ref = np.asarray(apply_fourier_mask_2d(
                jnp.asarray(ref[None]),
                low_pass_mask(Yr, Xr, w1, rw)))[0]
            lo, hi = ref.min(), ref.max()
            ref = (vmin + (ref - lo) * (vmax - vmin)
                   / max(hi - lo, 1e-12)).astype(np.float32)
        self._add_content(ref, np.random.default_rng(seed))
        fn = self.getParam("-o")
        xc, yc = Xr / 2.0 - X / 2.0, Yr / 2.0 - Y / 2.0
        yy, xx = np.mgrid[0:Y, 0:X].astype(np.float32)
        frames = []
        truth = []
        dose = self.getDoubleParam("--dose")
        do_dose = not self.checkParam("--skipDose")
        for n in range(F):
            sxy = self._displace(xx, yy, n, F, X, Y)
            gx = np.clip(sxy[0] + xc, 0, Xr - 1.001)
            gy = np.clip(sxy[1] + yc, 0, Yr - 1.001)
            x0 = gx.astype(np.int32)
            y0 = gy.astype(np.int32)
            wx = gx - x0
            wy = gy - y0
            fr = (ref[y0, x0] * (1 - wx) * (1 - wy)
                  + ref[y0, x0 + 1] * wx * (1 - wy)
                  + ref[y0 + 1, x0] * (1 - wx) * wy
                  + ref[y0 + 1, x0 + 1] * wx * wy)
            if do_dose:
                fr = rng.poisson(np.clip(fr * dose, 0, None)
                                 ).astype(np.float32)
            frames.append(fr.astype(np.float32))
            if self.checkParam("--skipShift"):
                truth.append((0.0, 0.0))
            else:
                sx, sy = self._shift(F - n - 1)
                truth.append((-sx, -sy))   # content moves opposite the
                # sampling displacement
        save_image(fn, np.stack(frames))
        if self.checkParam("--gain") and self.getParam("--gain"):
            save_image(self.getParam("--gain"), np.ones((Y, X), np.float32))
        if self.checkParam("--dark") and self.getParam("--dark"):
            save_image(self.getParam("--dark"), np.zeros((Y, X), np.float32))
        MetaData.fromRows([
            {"image": f"{i + 1:06d}@{fn}", "shiftX": t[0], "shiftY": t[1],
             "itemId": i + 1} for i, t in enumerate(truth)]
        ).write(fn.rsplit(".", 1)[0] + "_gt.xmd")


class ProgImagePeakHighContrast(XmippProgram):
    name = "xmipp_image_peak_high_contrast"

    def defineParams(self):
        self.addUsageLine("Detect high-contrast peaks (e.g. gold beads) in "
                          "images/volumes.")
        self.addParamsLine("  [-i <image=\"\">]   : Input image or volume "
                           "(simple sigma-peak mode)")
        self.addParamsLine("  [-o <md_file=coordinates3D.xmd>] : Peak "
                           "coordinates")
        self.addParamsLine("  [--boxSize <b=32>] : Box size of the peaked "
                           "fiducials")
        self.addParamsLine("  [--thr <t=5>]  : Threshold (sigmas, simple "
                           "mode)")
        # full fiducial-detection surface
        # (image_peak_high_contrast.cpp:58-68)
        self.addParamsLine("  [--vol <vol=\"\">] : Input tomogram "
                           "(fiducial-detection mode)")
        self.addParamsLine("  [--samplingRate <s=1>] : Sampling (A/px)")
        self.addParamsLine("  [--fiducialSize <f=100>] : Fiducial size (A)")
        self.addParamsLine("  [--numberSampSlices <n=10>] : Slices used to "
                           "estimate the outlier threshold")
        self.addParamsLine("  [--sdThr <s=5>] : STD multiples defining an "
                           "outlier pixel")
        self.addParamsLine("  [--numberOfCoordinatesThr <n=10>] : Minimum "
                           "voxels attracted to a coordinate")
        self.addParamsLine("  [--mirrorCorrelationThr <m=0.1>] : Minimum "
                           "correlation of a peak box with its mirror")
        self.addParamsLine("  [--mahalanobisDistanceThr <m=2>] : Maximum "
                           "Mahalanobis distance of a peak's radial "
                           "profile")
        self.addParamsLine("  [--relaxedModeThr <n=3>] : Disable a filter "
                           "if it would leave fewer coordinates than this")

    def _run_fiducial(self):
        """Full pipeline (image_peak_high_contrast.cpp): bandpass at the
        fiducial scale, dark-outlier thresholding from sampling slices,
        connected-component coordinate attraction, mirror-correlation and
        Mahalanobis filters with relaxed-mode fallbacks."""
        import jax.numpy as jnp
        from scipy import ndimage
        from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                                   band_pass_mask)
        vol = np.squeeze(Image(self.getParam("--vol")).data
                         ).astype(np.float32)
        Ts = self.getDoubleParam("--samplingRate")
        fid_px = max(self.getDoubleParam("--fiducialSize") / Ts, 4.0)
        box = self.getIntParam("--boxSize")
        n_samp = self.getIntParam("--numberSampSlices")
        sd_thr = self.getDoubleParam("--sdThr")
        n_coord_thr = self.getIntParam("--numberOfCoordinatesThr")
        mirror_thr = self.getDoubleParam("--mirrorCorrelationThr")
        maha_thr = self.getDoubleParam("--mahalanobisDistanceThr")
        relaxed = self.getIntParam("--relaxedModeThr")
        Z, H, W = vol.shape
        # slice-wise bandpass at the fiducial scale
        lo = 1.0 / (4.0 * fid_px)
        hi = min(1.0 / (0.5 * fid_px), 0.45)
        filt = np.asarray(apply_fourier_mask_2d(
            jnp.asarray(vol), band_pass_mask(H, W, lo, hi)))
        # outlier threshold from the central sampling slices
        z0 = max(Z // 2 - n_samp // 2, 0)
        samp = filt[z0:z0 + max(n_samp, 1)]
        mu, sd = float(samp.mean()), float(samp.std())
        dark = filt < mu - sd_thr * sd
        labels, n_lab = ndimage.label(dark)
        coords = []
        if n_lab:
            sizes = ndimage.sum_labels(dark, labels,
                                       np.arange(1, n_lab + 1))
            cents = ndimage.center_of_mass(dark, labels,
                                           np.arange(1, n_lab + 1))
            for s, (cz, cy, cx) in zip(sizes, cents):
                if s >= n_coord_thr:
                    coords.append((int(round(cx)), int(round(cy)),
                                   int(round(cz)), float(s)))

        def boxes_of(cs):
            out, kept = [], []
            h = box // 2
            for (x, y, z, s) in cs:
                if h <= x < W - h and h <= y < H - h and 0 <= z < Z:
                    out.append(filt[z, y - h:y + h, x - h:x + h])
                    kept.append((x, y, z, s))
            return np.asarray(out), kept

        bxs, coords = boxes_of(coords)
        # mirror-correlation filter (fiducials are centro-symmetric)
        if len(coords):
            b = bxs - bxs.mean(axis=(1, 2), keepdims=True)
            m = b[:, ::-1, ::-1]
            cc = (b * m).sum(axis=(1, 2)) / np.maximum(
                np.sqrt((b * b).sum(axis=(1, 2))
                        * (m * m).sum(axis=(1, 2))), 1e-12)
            keep = cc >= mirror_thr
            if keep.sum() >= relaxed:          # relaxed mode fallback
                coords = [c for c, k in zip(coords, keep) if k]
                bxs = bxs[keep]
        # Mahalanobis filter on radial profiles
        if len(coords) > 3:
            h = box // 2
            yy, xx = np.mgrid[0:box, 0:box] - h
            r = np.sqrt(yy * yy + xx * xx).astype(int)
            nb = min(h, r.max())
            prof = np.stack([[bx[r == k].mean() for k in range(nb)]
                             for bx in bxs])
            mu_p = prof.mean(axis=0)
            cov = np.cov(prof.T) + 1e-6 * np.eye(nb)
            icov = np.linalg.inv(cov)
            d = np.sqrt(np.einsum("ni,ij,nj->n", prof - mu_p, icov,
                                  prof - mu_p))
            keep = d <= maha_thr
            if keep.sum() >= relaxed:
                coords = [c for c, k in zip(coords, keep) if k]
        rows = [{"xcoor": x, "ycoor": y, "zcoor": z, "cost": s}
                for (x, y, z, s) in coords]
        MetaData.fromRows(rows).write(self.getParam("-o"))
        self.n_peaks = len(rows)
        if self.verbose:
            print(f"Detected {len(rows)} fiducial coordinates")

    def run(self):
        if self.checkParam("--vol") and self.getParam("--vol"):
            self._run_fiducial()
            return
        data = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        thr = self.getDoubleParam("--thr")
        box = self.getIntParam("--boxSize")
        s = np.abs(data - data.mean())
        sigma = data.std()
        rows = []
        work = s.copy()
        for _ in range(200):
            idx = np.argmax(work)
            pos = np.unravel_index(idx, work.shape)
            if work[pos] < thr * sigma:
                break
            if data.ndim == 2:
                y, x = pos
                rows.append({"xcoor": int(x), "ycoor": int(y),
                             "cost": float(work[pos])})
                work[max(y - box, 0):y + box, max(x - box, 0):x + box] = 0
            else:
                z, y, x = pos
                rows.append({"xcoor": int(x), "ycoor": int(y),
                             "zcoor": int(z), "cost": float(work[pos])})
                work[max(z - box, 0):z + box, max(y - box, 0):y + box,
                     max(x - box, 0):x + box] = 0
        MetaData.fromRows(rows).write(self.getParam("-o"))
        self.n_peaks = len(rows)


class ProgCoordinatesNoisyZonesFilter(XmippProgram):
    name = "xmipp_coordinates_noisy_zones_filter"

    def defineParams(self):
        self.addUsageLine("Remove picked coordinates that fall in noisy/"
                          "contaminated micrograph zones (local variance "
                          "screening).")
        self.addParamsLine("   --pos <md>  : Coordinates (xcoor/ycoor)")
        self.addParamsLine("   --mic <micrograph> : The micrograph")
        self.addParamsLine("   -o <md>     : Filtered coordinates")
        self.addParamsLine("  [--patchSize <p=64>] : Analysis window")
        self.addParamsLine("  [--zmax <z=3>] : Max allowed variance zScore")

    def run(self):
        mic = np.squeeze(Image(self.getParam("--mic")).data).astype(np.float32)
        md = MetaData(self.getParam("--pos"))
        p = self.getIntParam("--patchSize")
        H, W = mic.shape
        rows = list(md.iterRows())
        variances = []
        for r in rows:
            x, y = int(r["xcoor"]), int(r["ycoor"])
            x0 = np.clip(x - p // 2, 0, W - p)
            y0 = np.clip(y - p // 2, 0, H - p)
            variances.append(mic[y0:y0 + p, x0:x0 + p].var())
        v = np.array(variances)
        z = np.abs(v - np.median(v)) / max(1.4826 * np.median(
            np.abs(v - np.median(v))), 1e-12)
        zmax = self.getDoubleParam("--zmax")
        keep = [r for r, zz in zip(rows, z) if zz <= zmax]
        MetaData.fromRows(keep).write(self.getParam("-o"))
        self.n_kept = len(keep)


class ProgVolumesetAlign(XmippProgram):
    name = "xmipp_volumeset_align"

    def defineParams(self):
        self.addUsageLine("Align every volume of a set to a reference "
                          "volume (volumeset_align.cpp:40-49 surface).")
        self.addParamsLine("   -i <md_file> : Metadata with volumes (image column)")
        self.addParamsLine("   --ref <volume> : Reference")
        self.addParamsLine("  [-o <md_file=\"\">] : Output with alignment "
                           "angles (default <odir>/volumeset_align.xmd)")
        self.addParamsLine("  [--odir <dir=.>] : Output directory")
        self.addParamsLine("  [--resume] : Skip volumes already present in "
                           "the output metadata")
        self.addParamsLine("  [--step <s=30>] : Coarse angular step")
        self.addParamsLine("  [--frm <L=24>]  : Use SO(3) Fast Rotational "
                           "Matching instead of the grid")
        self.addParamsLine("  [--frm_parameters <freq=0.25> <shift=10>] : "
                           "FRM alignment with this max frequency and "
                           "shift bound")
        self.addParamsLine("  [--tilt_values <t0=-90> <tF=90>] : Missing-"
                           "wedge compensation range for the FRM scoring")
        self.addParamsLine("  [--mask <type=\"\"> <r=0>] : Mask applied "
                           "during the alignment (circular <r> or a file)")

    def run(self):
        import os
        from xmipp3_tpu.programs.volume_programs import ProgVolumeAlign
        md = MetaData(self.getParam("-i"))
        odir = self.getParam("--odir")
        fn_out = (self.getParam("-o")
                  if self.checkParam("-o") and self.getParam("-o")
                  else os.path.join(odir, "volumeset_align.xmd"))
        done = set()
        rows = []
        if self.checkParam("--resume") and os.path.exists(fn_out):
            prev = MetaData(fn_out)
            for r in prev.iterRows():
                done.add(str(r["image"]))
                rows.append(dict(r))
        mask_arg = ([self.getParam("--mask", 0), self.getParam("--mask", 1)]
                    if self.checkParam("--mask") else [])
        for i in md:
            r = md.getRow(i)
            if str(r["image"]) in done:
                continue
            sub = ProgVolumeAlign()
            args = [sub.name, "--i1", self.getParam("--ref"),
                    "--i2", str(r["image"]),
                    "--step", self.getParam("--step")]
            if self.checkParam("--frm_parameters"):
                args += ["--frm",
                         self.getParam("--frm_parameters", 0),
                         self.getParam("--frm_parameters", 1),
                         self.getParam("--tilt_values", 0),
                         self.getParam("--tilt_values", 1)]
            elif self.checkParam("--frm"):
                args += ["--frm", self.getParam("--frm")]
            if mask_arg:
                args += ["--mask"] + mask_arg
            sub.read([a for a in args])
            sub.verbose = 0
            sub.run()
            rot, tilt, psi = sub.angles
            r["angleRot"], r["angleTilt"], r["anglePsi"] = rot, tilt, psi
            r["maxCC"] = sub.corr
            rows.append(r)
            MetaData.fromRows(rows).write(fn_out)   # checkpoint (--resume)
        MetaData.fromRows(rows).write(fn_out)


class ProgPDBAnalysis(XmippProgram):
    name = "xmipp_pdb_analysis"

    def defineParams(self):
        self.addUsageLine("Report geometric statistics of an atomic model.")
        self.addParamsLine("   -i <pdb> : Input model")
        self.addParamsLine("  [--operation <op=stats>] : Operation to perform")
        self.addParamsLine("    where <op>")
        self.addParamsLine("      stats : Print geometric statistics")
        self.addParamsLine("      distance_histogram <fileOut> <Nnearest=3> <MaxDistance=-1> : Histogram of distances between each atom and its N nearest neighbours (pdb_analysis.cpp:35-39)")

    def run(self):
        m = read_pdb(self.getParam("-i"))
        c = m.coords
        if self.checkParam("--operation") and \
                self.getParam("--operation") == "distance_histogram":
            fn_hist = self.getParam("--operation", 1)
            n_near = self.getIntParam("--operation", 2)
            max_d = self.getDoubleParam("--operation", 3)
            d = np.sqrt(((c[:, None] - c[None]) ** 2).sum(-1))
            np.fill_diagonal(d, np.inf)
            k = min(n_near, len(c) - 1)
            nearest = np.sort(d, axis=1)[:, :k].ravel()
            if max_d > 0:
                nearest = nearest[nearest <= max_d]
            counts, edges = np.histogram(nearest, bins=200)
            centers = 0.5 * (edges[:-1] + edges[1:])
            with open(fn_hist, "w") as f:
                for x, v in zip(centers, counts):
                    f.write(f"{x:12.6f} {v}\n")
            self.hist = (centers, counts)
            return
        center = c.mean(axis=0)
        extent = c.max(axis=0) - c.min(axis=0)
        rg = float(np.sqrt(((c - center) ** 2).sum(axis=1).mean()))
        from collections import Counter
        comp = Counter(e.upper() for e in m.elements)
        print(f"Atoms: {len(m)}")
        print(f"Center of mass: {np.round(center, 2)}")
        print(f"Extent (Å): {np.round(extent, 2)}")
        print(f"Radius of gyration: {rg:.2f} Å")
        print("Composition: " + " ".join(f"{k}:{v}"
                                         for k, v in sorted(comp.items())))
        self.radius_of_gyration = rg


class ProgPDBLabelFromVolume(XmippProgram):
    """Full reference surface (pdb_label_from_volume.cpp:36-238
    ProgPdbValueToVol): per atom, average the volume values within
    --radius of the atom position (always including the atom's own
    voxel), restricted to --mask when given; occupancy = sign(signed
    mean) * absolute mean; --md records the global mean and absolute
    mean (MDL_VOLUME_SCORE1/2); --origin shifts the voxel indexing
    (indices run from 0 unless --origin x y z is given)."""
    name = "xmipp_pdb_label_from_volume"

    def defineParams(self):
        self.addUsageLine("Put volume values (e.g. local resolution) on "
                          "the atoms of a PDB.")
        self.addParamsLine("   --pdb <file> : File to process")
        self.addParamsLine("   --vol <volume> : Input volume")
        self.addParamsLine("  [--mask <vol=\"\">] : Input mask (average "
                           "only inside the mask)")
        self.addParamsLine("   -o <file>    : Modified output PDB")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size (A/px)")
        self.addParamsLine("  [--origin <x=0> <y=0> <z=0>] : Volume origin "
                           "(voxels); without it indices start at 0")
        self.addParamsLine("  [--radius <radius=0.8>] : Radius of the atom "
                           "(A)")
        self.addParamsLine("  [--md <output=params.xmd>] : Save mean and "
                           "absolute mean of the atom values")

    def run(self):
        m = read_pdb(self.getParam("--pdb"))
        vol = np.squeeze(Image(self.getParam("--vol")).data
                         ).astype(np.float64)
        mask = None
        if self.checkParam("--mask") and self.getParam("--mask"):
            mask = np.squeeze(Image(self.getParam("--mask")).data) > 1e-5
        Ts = self.getDoubleParam("--sampling")
        radius = self.getDoubleParam("--radius")
        orig = np.zeros(3)
        if self.checkParam("--origin"):
            orig = np.array([self.getDoubleParam("--origin", k)
                             for k in range(3)])
        D, H, W = vol.shape
        # voxel position of each atom: r/Ts shifted by the origin
        vox = m.coords / Ts + orig[None, :]          # (N, 3) x,y,z order
        r2 = radius * radius
        rpad = int(np.ceil(radius)) + 1
        vals = np.zeros(len(m), np.float64)
        absvals = np.zeros(len(m), np.float64)
        for a, (x, y, z) in enumerate(vox):
            k0, kF = max(int(np.floor(z - radius)), 0), \
                min(int(np.ceil(z + radius)), D - 1)
            i0, iF = max(int(np.floor(y - radius)), 0), \
                min(int(np.ceil(y + radius)), H - 1)
            j0, jF = max(int(np.floor(x - radius)), 0), \
                min(int(np.ceil(x + radius)), W - 1)
            if k0 > kF or i0 > iF or j0 > jF:
                continue
            kk, ii, jj = np.mgrid[k0:kF + 1, i0:iF + 1, j0:jF + 1]
            d2 = (z - kk) ** 2 + (y - ii) ** 2 + (x - jj) ** 2
            sel = d2 < r2
            # the atom's own (floor) voxel always participates
            ka, ia, ja = (max(int(np.floor(z)), 0), max(int(np.floor(y)), 0),
                          max(int(np.floor(x)), 0))
            sel |= (kk == ka) & (ii == ia) & (jj == ja)
            if mask is not None:
                sel &= mask[kk, ii, jj]
            if not sel.any():
                continue
            v = vol[kk[sel], ii[sel], jj[sel]]
            sgn = 1.0 if v.mean() >= 0 else -1.0
            vals[a] = sgn * np.abs(v).mean()
            absvals[a] = np.abs(v).mean()
        mean = float(vals.mean()) if len(m) else 0.0
        mean_abs = float(absvals.mean()) if len(m) else 0.0
        if self.verbose:
            print(f"mean value: = {mean}")
            print(f"absolute mean value: = {mean_abs}")
        fn_md = (self.getParam("--md") if self.checkParam("--md")
                 else "params.xmd")
        MetaData.fromRows([{"scoreVolume1": mean,
                            "scoreVolume2": mean_abs}]).write(fn_md)
        out = AtomicModel(m.coords, m.elements, m.bfactors,
                          vals.astype(np.float32))
        write_pdb(self.getParam("-o"), out)
        self.mean, self.mean_abs = mean, mean_abs


class ProgPDBReducePseudoatoms(XmippProgram):
    name = "xmipp_pdb_reduce_pseudoatoms"

    def defineParams(self):
        self.addUsageLine("Reduce a pseudoatom model: keep the strongest "
                          "atoms by intensity (pdb_reduce_pseudoatoms.cpp:"
                          "43-46) or cluster to --num centers (k-means).")
        self.addParamsLine("   -i <pdb>  : Input model")
        self.addParamsLine("   -o <pdb>  : Reduced model")
        self.addParamsLine("  [--number <num=-1>] : Keep this many pseudoatoms with highest intensity")
        self.addParamsLine("  [--threshold <thresh=0.0>] : Remove pseudoatoms below this intensity")
        self.addParamsLine("  [--num <n=100>] : Target pseudoatom count (k-means clustering mode)")

    def run(self):
        m = read_pdb(self.getParam("-i"))
        if self.checkParam("--number") or self.checkParam("--threshold"):
            # reference semantics: intensity (occupancy) selection
            inten = np.asarray(m.occupancies, np.float64)
            keep = np.ones(len(m), bool)
            if self.checkParam("--threshold"):
                keep &= inten >= self.getDoubleParam("--threshold")
            if self.checkParam("--number"):
                num = self.getIntParam("--number")
                if 0 < num < int(keep.sum()):
                    order = np.argsort(-inten)
                    chosen = [i for i in order if keep[i]][:num]
                    keep = np.zeros(len(m), bool)
                    keep[chosen] = True
            sel = np.where(keep)[0]
            out = AtomicModel(m.coords[sel],
                              [m.elements[i] for i in sel],
                              np.asarray(m.bfactors)[sel],
                              np.asarray(m.occupancies)[sel])
            write_pdb(self.getParam("-o"), out)
            return
        n = min(self.getIntParam("--num"), len(m))
        rng = np.random.default_rng(0)
        centers = m.coords[rng.choice(len(m), n, replace=False)]
        w = m.weights
        for _ in range(20):
            d = ((m.coords[:, None] - centers[None]) ** 2).sum(-1)
            assign = d.argmin(axis=1)
            for k in range(n):
                sel = assign == k
                if sel.any():
                    centers[k] = np.average(m.coords[sel], axis=0,
                                            weights=w[sel])
        out = AtomicModel(centers, ["C"] * n, np.zeros(n, np.float32),
                          np.ones(n, np.float32))
        write_pdb(self.getParam("-o"), out)


class ProgPDBSphDeform(XmippProgram):
    name = "xmipp_pdb_sph_deform"

    def defineParams(self):
        self.addUsageLine("Deform an atomic model with Zernike3D "
                          "coefficients.")
        self.addParamsLine("   --pdb <file> : Input model")
        self.addParamsLine("   -o <file>    : Deformed model")
        self.addParamsLine("   --clnm <md>  : Metadata with sphCoefficients")
        self.addParamsLine("  [--l1 <l=3>] : Zernike radial depth")
        self.addParamsLine("  [--l2 <l=2>] : Spherical harmonic depth")
        self.addParamsLine("  [--radius <r=-1>] : Normalization radius (Å)")
        self.addParamsLine("  [--center_mass] : Center the PDB at its center of mass first")
        self.addParamsLine("  [--boxsize <b=0>] : Box size (px) of the volume the coefficients were fitted in")
        self.addParamsLine("  [--sr <s=1>] : Sampling rate (Å/px) of that volume")

    def run(self):
        from xmipp3_tpu.ops.zernike import (real_sph_harm, zernike_indices,
                                            zernike_radial)
        m = read_pdb(self.getParam("--pdb"))
        if self.checkParam("--center_mass"):
            m = m.centered()
        md = MetaData(self.getParam("--clnm"))
        flat = np.asarray(md.getValue("sphCoefficients", md.firstObject()),
                          np.float64)
        coeffs = flat.reshape(3, -1)
        radius = self.getDoubleParam("--radius")
        boxsize = (self.getIntParam("--boxsize")
                   if self.checkParam("--boxsize") else 0)
        sr = self.getDoubleParam("--sr") if self.checkParam("--sr") else 1.0
        if radius <= 0 and boxsize > 0:
            # normalization radius of the fitting volume, in Å
            # (pdb_sph_deform.cpp:36-38)
            radius = 0.5 * boxsize * sr
        if radius <= 0:
            radius = np.linalg.norm(m.coords, axis=1).max() + 1e-6
        r = np.linalg.norm(m.coords, axis=1) / radius
        rs = np.where(r > 0, r, 1e-9)
        theta = np.arccos(np.clip(m.coords[:, 2] / (rs * radius), -1, 1))
        phi = np.arctan2(m.coords[:, 1], m.coords[:, 0])
        idx = zernike_indices(self.getIntParam("--l1"),
                              self.getIntParam("--l2"))
        disp = np.zeros_like(m.coords)
        for k, (l, n, mm) in enumerate(idx[: coeffs.shape[1]]):
            B = zernike_radial(n, l, r) * real_sph_harm(l, mm, theta, phi)
            B = np.where(r <= 1.0, B, 0.0)
            for c in range(3):
                disp[:, c] += coeffs[c, k] * B
        out = AtomicModel(m.coords + disp, m.elements, m.bfactors,
                          m.occupancies)
        write_pdb(self.getParam("-o"), out)


class ProgCompareDensity(XmippProgram):
    """Full reference surface (compare_density.cpp:119-126): -v1/-v2,
    --degstep grid; for each (rot, tilt) cell project both volumes,
    low-pass filter (w1=1/12, raised 0.02), Otsu-binarize, subtract the
    biggest connected component, and record the SIGN of the residual
    pixel-wise density difference (+1 where v1's residual mass dominates,
    -1 where v2's does, 0 when equal). TPU shape: one batched projection
    + filter + Otsu dispatch over the whole grid; connected components on
    host (scipy.ndimage.label)."""
    name = "xmipp_compare_density"

    def defineParams(self):
        self.addUsageLine("Compare the segmented densities of two volumes "
                          "over a (rot, tilt) projection grid.")
        self.addParamsLine("   -v1 <volume>  : First volume to compare")
        self.addParamsLine("   -v2 <volume>  : Second volume to compare")
        self.addParamsLine("  [-o <image=\"\">] : Output correlation image")
        self.addParamsLine("  [--degstep <d=5.0>] : Degrees step size for "
                           "rot and tilt angles")
        self.addParamsLine("  [--thr <N=-1>] : Max processing threads "
                           "(device batching replaces the thread pool)")

    def run(self):
        import jax.numpy as jnp
        from scipy import ndimage
        from xmipp3_tpu.core.funcs import otsu_threshold
        from xmipp3_tpu.ops.fourier_filter import (low_pass_mask,
                                                   apply_fourier_mask_2d)
        from xmipp3_tpu.programs.angular_misc import project_both_on_grid
        p1, p2, n_rot, n_tilt = project_both_on_grid(
            self.getParam("-v1"), self.getParam("-v2"),
            self.getDoubleParam("--degstep"))
        h, w = p1.shape[-2:]
        mask = low_pass_mask(h, w, 1.0 / 12.0, raised_w=0.02)
        p1 = np.asarray(apply_fourier_mask_2d(jnp.asarray(p1), mask))
        p2 = np.asarray(apply_fourier_mask_2d(jnp.asarray(p2), mask))
        corr = np.zeros(len(p1), np.float32)
        for i in range(len(p1)):
            b1 = (p1[i] > otsu_threshold(p1[i])).astype(np.float64)
            b2 = (p2[i] > otsu_threshold(p2[i])).astype(np.float64)
            for b in (b1, b2):
                lab, n = ndimage.label(b)
                if n > 0:
                    sizes = ndimage.sum(b, lab, range(1, n + 1))
                    b -= (lab == (1 + int(np.argmax(sizes))))
            diff = np.sign(b1 - b2).sum()
            corr[i] = np.sign(diff)
        cc = corr.reshape(n_rot, n_tilt)
        fn_out = self.getParam("-o") or "Rot_tilt_corr_map.xmp"
        save_image(fn_out, cc)
        self.corr_image = cc
        if self.verbose:
            frac = float((cc != 0).mean())
            print(f"fraction of differing views: {frac:.3f}")


class ProgImageAssignmentTiltPair(XmippProgram):
    name = "xmipp_image_assignment_tilt_pair"

    def defineParams(self):
        self.addUsageLine("Match particle coordinates between untilted and "
                          "tilted micrographs: Delaunay-triangle RANSAC "
                          "initialization (reference external/delaunay + "
                          "TiltPairAligner, data/micrograph.h:549) followed "
                          "by iterative affine refinement on mutual nearest "
                          "neighbors.")
        self.addParamsLine("   --untiltcoor <md> : Untilted coordinates")
        self.addParamsLine("   --tiltcoor <md>   : Tilted coordinates")
        self.addParamsLine("   --odir <dir=.>    : Output directory")
        self.addParamsLine("  [--maxshift <s=50>] : Max residual (px)")
        self.addParamsLine("  [--tiltmicsize <img_file=\"\">] : Tilt "
                           "micrograph (its dimensions bound the projected "
                           "untilted points, reference "
                           "image_assignment_tilt_pair.cpp:124)")
        self.addParamsLine("  [--tiltangle <s=-1>] : Tilt angle estimate; "
                           "candidate affines are gated to the "
                           "[tiltangle-15, tiltangle+15] deg area-"
                           "compression band (reference :332-369)")
        self.addParamsLine("  [--particlesize <p=100>] : Particle size (px)")
        self.addParamsLine("  [--threshold <d=0.3>] : Points closer than "
                           "threshold*particlesize count as the same point "
                           "(inlier tolerance)")
        self.addParamsLine("  [--no_delaunay]     : Skip the Delaunay RANSAC initialization")

    @staticmethod
    def _delaunay_ransac(u, t, max_cands=300, tol=None, cos_band=None,
                         dims=None):
        """Initial affine from corresponding adjacent-triangle quads of the
        two Delaunay triangulations (the robust role of the reference's
        7.8k-LoC DCEL Delaunay matcher, external/delaunay +
        TiltPairAligner, data/micrograph.h:549).

        Two triangles sharing an edge form a 4-point quad whose barycentric
        coordinates are EXACT affine invariants (single-triangle shape is
        not invariant under the anisotropic tilt transform). Quads are
        matched by invariant distance, each candidate's 4-point affine is
        scored by nearest-neighbor inlier count."""
        from scipy.spatial import Delaunay, cKDTree

        def quads(P):
            """Canonical (p, q, r1, r2) quads + invariant descriptors."""
            dt = Delaunay(P)
            simp = dt.simplices
            nbr = dt.neighbors
            out_pts = []
            out_desc = []
            for i in range(len(simp)):
                for k in range(3):
                    j = nbr[i, k]
                    if j <= i:
                        continue
                    shared = [v for v in simp[j] if v in simp[i]]
                    if len(shared) != 2:
                        continue
                    r1 = [v for v in simp[i] if v not in shared][0]
                    r2 = [v for v in simp[j] if v not in shared][0]
                    a, b = shared
                    # canonical labels: bigger triangle first; edge order
                    # fixed by positive orientation (tilt affines preserve
                    # orientation)
                    def area(x, y, z):
                        return 0.5 * ((P[y, 0] - P[x, 0])
                                      * (P[z, 1] - P[x, 1])
                                      - (P[z, 0] - P[x, 0])
                                      * (P[y, 1] - P[x, 1]))
                    if abs(area(a, b, r1)) < abs(area(a, b, r2)):
                        r1, r2 = r2, r1
                    if area(a, b, r1) < 0:
                        a, b = b, a
                    # barycentric coords of r2 in triangle (a, b, r1)
                    T = np.array([[P[a, 0], P[b, 0], P[r1, 0]],
                                  [P[a, 1], P[b, 1], P[r1, 1]],
                                  [1.0, 1.0, 1.0]])
                    try:
                        lam = np.linalg.solve(
                            T, np.array([P[r2, 0], P[r2, 1], 1.0]))
                    except np.linalg.LinAlgError:
                        continue
                    out_pts.append((a, b, r1, r2))
                    out_desc.append(lam[:2])
            return np.array(out_pts, int), np.array(out_desc, float)

        qu, du = quads(u)
        qt, dtt = quads(t)
        if len(qu) == 0 or len(qt) == 0:
            return np.eye(2), t.mean(0) - u.mean(0)
        tree_d = cKDTree(dtt)
        dist, jidx = tree_d.query(du, k=1)
        order = np.argsort(dist)[:max_cands]
        tree = cKDTree(t)
        if tol is None:
            nn_d, _ = tree.query(t, k=2)
            tol = max(0.75 * np.median(nn_d[:, 1]), 4.0)
        best = (0, np.eye(2), t.mean(0) - u.mean(0))
        for o in order:
            pu = u[list(qu[o])]
            pt = t[list(qt[jidx[o]])]
            U = np.hstack([pu, np.ones((4, 1))])
            M, *_ = np.linalg.lstsq(U, pt, rcond=None)
            A = M[:2].T
            if cos_band is not None:
                # tilt compresses areas by cos(tilt): gate det(A) to the
                # [cos(tilt+15), cos(tilt-15)] band (reference :332-369)
                det = abs(np.linalg.det(A))
                if not (cos_band[0] - 0.02 <= det <= cos_band[1] + 0.02):
                    continue
            proj = u @ A.T + M[2]
            d, _ = tree.query(proj, k=1)
            ok = d < tol
            if dims is not None:
                # reject projections falling outside the tilt micrograph
                ok &= ((proj[:, 0] >= 0) & (proj[:, 0] <= dims[0])
                       & (proj[:, 1] >= 0) & (proj[:, 1] <= dims[1]))
            inl = int(ok.sum())
            if inl > best[0]:
                best = (inl, A, M[2])
        return best[1], best[2]

    def run(self):
        import os
        md_u = MetaData(self.getParam("--untiltcoor"))
        md_t = MetaData(self.getParam("--tiltcoor"))
        u = np.stack([md_u.getColumn("xcoor").astype(float),
                      md_u.getColumn("ycoor").astype(float)], axis=1)
        t = np.stack([md_t.getColumn("xcoor").astype(float),
                      md_t.getColumn("ycoor").astype(float)], axis=1)
        # inlier tolerance = threshold * particlesize (reference readParams)
        psize = (self.getDoubleParam("--particlesize")
                 if self.checkParam("--particlesize") else 0.0)
        thr = (self.getDoubleParam("--threshold")
               if self.checkParam("--threshold") else 0.3)
        tol = thr * psize if psize > 0 else None
        tiltest = (self.getDoubleParam("--tiltangle")
                   if self.checkParam("--tiltangle") else -1.0)
        cos_band = None
        if tiltest >= 0:
            cos_band = (np.cos(np.deg2rad(min(tiltest + 15.0, 89.0))),
                        np.cos(np.deg2rad(max(tiltest - 15.0, 0.0))))
        dims = None
        if self.checkParam("--tiltmicsize") and \
                self.getParam("--tiltmicsize"):
            hdr = Image()
            hdr.read(self.getParam("--tiltmicsize"), header_only=True)
            _, _, yd, xd = hdr.header.shape
            dims = (xd, yd)
        # Delaunay RANSAC initialization, then iterative mutual-NN affine
        if len(u) >= 4 and len(t) >= 4 and \
                not self.checkParam("--no_delaunay"):
            A, b = self._delaunay_ransac(u, t, tol=tol, cos_band=cos_band,
                                         dims=dims)
        else:
            A = np.eye(2)
            b = t.mean(axis=0) - u.mean(axis=0)
        pairs = []
        for _ in range(5):
            proj = u @ A.T + b
            d = ((proj[:, None] - t[None]) ** 2).sum(-1)
            fwd = d.argmin(axis=1)
            bwd = d.argmin(axis=0)
            pairs = [(i, fwd[i]) for i in range(len(u)) if bwd[fwd[i]] == i]
            if len(pairs) < 3:
                break
            U = np.hstack([u[[p[0] for p in pairs]],
                           np.ones((len(pairs), 1))])
            T = t[[p[1] for p in pairs]]
            M, *_ = np.linalg.lstsq(U, T, rcond=None)
            A = M[:2].T
            b = M[2]
        max_shift = self.getDoubleParam("--maxshift")
        if tol is not None:
            max_shift = min(max_shift, tol)
        proj = u @ A.T + b
        good = [(i, j) for i, j in pairs
                if np.linalg.norm(proj[i] - t[j]) <= max_shift]
        odir = self.getParam("--odir")
        MetaData.fromRows([
            {"itemId": k + 1, "xcoor": int(u[i, 0]), "ycoor": int(u[i, 1])}
            for k, (i, j) in enumerate(good)]).write(
                os.path.join(odir, "untilted_assigned.xmd"))
        MetaData.fromRows([
            {"itemId": k + 1, "xcoor": int(t[j, 0]), "ycoor": int(t[j, 1])}
            for k, (i, j) in enumerate(good)]).write(
                os.path.join(odir, "tilted_assigned.xmd"))
        self.n_pairs = len(good)
        if self.verbose:
            print(f"Assigned {len(good)} tilt pairs")


class ProgCTFCorrectWiener3D(XmippProgram):
    name = "xmipp_ctf_correct_wiener3d"

    def defineParams(self):
        self.addUsageLine("3D Wiener deconvolution of defocus-group volumes "
                          "(ctf_correct_wiener3d.cpp:61-69): combines the "
                          "group volumes with image-count-weighted Wiener "
                          "filters and writes the per-group refiltered "
                          "volumes.")
        self.addParamsLine("   -i <input>  : Metadata with _image (group volume), _CTFModel and _class_count columns, or a single volume")
        self.addParamsLine("  [--oroot <root=wiener3d>] : Output rootname (root_deconvolved.vol + root_ctffiltered_groupNN.vol)")
        self.addParamsLine("  [--minFreq <Ang=-1>] : Apply the Wiener filter only beyond this resolution (A)")
        self.addParamsLine("  [--phase_flipped] : Volumes were reconstructed from phase-corrected images")
        self.addParamsLine("  [--wienerConstant <K=0.05>] : Wiener constant (multiplied by the total image count)")
        self.addParamsLine("  [--ctf <ctfparam=\"\">] : Representative CTF (single-volume mode)")
        self.addParamsLine("  [-o <out=\"\">] : Output (single-volume mode)")
        self.addParamsLine("  [--sampling <Ts=0>] : Override pixel size")
        self.addParamsLine("  [--wc <w=0.05>] : Wiener constant (single-volume mode)")

    def _radial_ctf(self, ctf, shape, phase_flipped):
        from xmipp3_tpu.ops.fourier import freq_grid_3d
        fz, fy, fx = freq_grid_3d(*shape)
        r = np.sqrt(fz ** 2 + fy ** 2 + fx ** 2) / ctf.sampling_rate
        c = np.asarray(ctf.pure_at(r, np.zeros_like(r)))
        return np.abs(c) if phase_flipped else c, r

    def run(self):
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        from xmipp3_tpu.ops.ctf import CTFDescription
        fn_in = self.getParam("-i")
        Ts = self.getDoubleParam("--sampling")
        flipped = self.checkParam("--phase_flipped")
        if is_metadata_file(fn_in):
            md = MetaData(fn_in)
            root = (self.getParam("--oroot")
                    if self.checkParam("--oroot") else "wiener3d")
            K = self.getDoubleParam("--wienerConstant")
            min_freq = self.getDoubleParam("--minFreq")
            vols, ctfs, counts = [], [], []
            for r in md.iterRows():
                vols.append(np.squeeze(Image(str(r["image"])).data)
                            .astype(np.float64))
                ctf = CTFDescription.from_metadata(str(r["ctfModel"]))
                if Ts > 0:
                    ctf.sampling_rate = Ts
                ctfs.append(ctf)
                counts.append(float(r.get("classCount", 1) or 1))
            shape = vols[0].shape
            Ntot = sum(counts)
            cs = []
            for ctf in ctfs:
                c, freq = self._radial_ctf(ctf, shape, flipped)
                if min_freq > 0:
                    # reference generateCTF1D (ctf_correct_wiener3d.cpp):
                    # below the resolution limit the CTF is taken as 1
                    # INSIDE the shared Wiener denominator, so the weights
                    # transition continuously (w = n/(K*Ntot + sum n_g))
                    c = np.where(freq < 1.0 / min_freq, 1.0, c)
                cs.append(c)
            denom = K * Ntot + sum(n * c * c
                                   for n, c in zip(counts, cs))
            num = None
            F = [np.fft.rfftn(v) for v in vols]
            wiens = []
            for n, c, f in zip(counts, cs, F):
                w = n * c / denom
                wiens.append(w)
                num = f * w if num is None else num + f * w
            dec = np.fft.irfftn(num, s=shape)
            save_image(root + "_deconvolved.vol", dec.astype(np.float32))
            for g, (c, _w) in enumerate(zip(cs, wiens), start=1):
                filt = np.fft.irfftn(np.fft.rfftn(dec) * c, s=shape)
                save_image(f"{root}_ctffiltered_group{g:02d}.vol",
                           filt.astype(np.float32))
            return
        # single-volume convenience mode (previous surface, kept)
        vol = np.squeeze(Image(fn_in).data).astype(np.float32)
        ctf = CTFDescription.from_metadata(self.getParam("--ctf"))
        if Ts > 0:
            ctf.sampling_rate = Ts
        c, _ = self._radial_ctf(ctf, vol.shape, flipped)
        wc = self.getDoubleParam("--wc")
        wien = c / (c * c + wc)
        out = np.fft.irfftn(np.fft.rfftn(vol) * wien, s=vol.shape)
        save_image(self.getParam("-o") or "wiener3d.vol",
                   out.astype(np.float32))


class ProgAdjustVolumeGreyLevels(XmippProgram):
    """Full reference surface (adjust_volume_grey_levels.cpp:40-236):
    adjust the volume's grey range so its projections match a set of
    experimental projections (-m): first guess a = stddevF/stddev0,
    b = avgF - a*avg0 with avgF = avg_pict/r, stddevF = stddev_pict/
    sqrt(r), r = cbrt(#voxels); --optimize refines (a, b) on the
    projection-mismatch cost over a random image subset (--probb_eval
    selection probability).  TPU shape: proj(a*V + b) = a*proj(V) +
    b*proj(1), so ONE batched projection pass of V and of the unit
    volume turns the reference's per-evaluation reprojection Powell
    into a closed-form 2x2 least squares.  Extension kept: -r adjusts
    against a reference volume directly."""
    name = "xmipp_transform_adjust_volume_grey_levels"

    def defineParams(self):
        self.addUsageLine("Adjust the grey level range of a volume to "
                          "its experimental projections.")
        self.addParamsLine("   -i <volume>  : Volume to adjust")
        self.addParamsLine("  [-m <metadata=\"\">] : Set of projections of "
                           "the volume (with angles)")
        self.addParamsLine("   alias --metadata;")
        self.addParamsLine("  [-r <volume=\"\">]  : Reference volume "
                           "(direct voxel least-squares mode)")
        self.addParamsLine("  [-o <out=\"\">] : Output (default in-place)")
        self.addParamsLine("  [--optimize] : Refine the linear transform "
                           "on the projection-mismatch cost")
        self.addParamsLine("  [--probb_eval <p=0.2>] : Probability of "
                           "each image entering the goal function")
        self.addParamsLine("  [--seed <s=0>] : Random subset seed")

    def run(self):
        v = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        fn_out = self.getParam("-o") or self.getParam("-i")
        if self.checkParam("-r") and self.getParam("-r"):
            ref = np.squeeze(Image(self.getParam("-r")).data
                             ).astype(np.float32)
            A = np.stack([v.ravel(), np.ones(v.size, np.float32)], axis=1)
            coef, *_ = np.linalg.lstsq(A, ref.ravel(), rcond=None)
            save_image(fn_out, coef[0] * v + coef[1])
            return
        from xmipp3_tpu.core.metadata_program import load_image_rows
        md = MetaData(self.getParam("-m"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        # first estimate (reference apply()): ray statistics
        avg_pict = float(np.mean([i.mean() for i in imgs]))
        stddev_pict = float(np.sqrt(np.mean([i.std() ** 2 for i in imgs])))
        r = v.size ** (1.0 / 3.0)
        avgF = avg_pict / r
        stddevF = stddev_pict / np.sqrt(r)
        avg0, stddev0 = float(v.mean()), float(max(v.std(), 1e-12))
        a = stddevF / stddev0
        b = avgF - a * avg0
        if self.verbose:
            print(f"First Linear transformation: y={a}*x+{b}")
        if self.checkParam("--optimize"):
            from xmipp3_tpu.ops.project import project_real_space
            rng = np.random.default_rng(
                self.getIntParam("--seed") if self.checkParam("--seed")
                else 0)
            p = self.getDoubleParam("--probb_eval") \
                if self.checkParam("--probb_eval") else 0.2
            sel = rng.uniform(0, 1, len(rows)) <= p
            if not sel.any():
                sel[rng.integers(len(rows))] = True
            idx = np.nonzero(sel)[0]
            get = lambda k: np.array([float(rows[i].get(k, 0.0))
                                      for i in idx], np.float32)
            rot, tilt, psi = get("angleRot"), get("angleTilt"), \
                get("anglePsi")
            P = np.asarray(project_real_space(v, rot, tilt, psi))
            T = np.asarray(project_real_space(
                np.ones_like(v), rot, tilt, psi))
            I = imgs[idx]
            # normal equations for min ||I - aP - bT||^2
            M = np.array([[(P * P).sum(), (P * T).sum()],
                          [(P * T).sum(), (T * T).sum()]])
            rhs = np.array([(P * I).sum(), (T * I).sum()])
            try:
                a, b = np.linalg.solve(M, rhs)
            except np.linalg.LinAlgError:
                pass
            if self.verbose:
                print(f"Optimized transformation: y={a}*x+{b}")
        save_image(fn_out, (a * v + b).astype(np.float32))
        self.ab = (float(a), float(b))


PROGRAM = None
