"""More angular programs: assignment_mag, discrete_assign, continuous_assign,
break_symmetry, estimate_tilt_axis, multireference_aligneability,
validation_nontilt, compare_views.

Contracts: reference angular_assignment_mag (angular_assignment_mag.h:49),
angular_discrete_assign, angular_continuous_assign, angular_break_symmetry,
angular_estimate_tilt_axis, multireference_aligneability, validation_nontilt.
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.programs.angular_projection_matching import \
    ProgAngularProjectionMatching


class ProgAngularDiscreteAssign(ProgAngularProjectionMatching):
    """Discrete angular assignment in WAVELET space (reference
    angular_discrete_assign.h:41: DWT feature matching with coarse-to-fine
    selection). TPU shape: a db4 low-band correlation over the WHOLE
    gallery (a batched matmul on 16x-smaller coefficients) selects the
    top-M candidate orientations per image; the shared ring-FFT engine
    then resolves (psi, shift) only inside that candidate set — the
    multiscale discrete selection of the reference with the dense
    refinement of the matching engine."""
    name = "xmipp_angular_discrete_assign"

    _ll_cache = None

    def defineParams(self):
        super().defineParams()
        # reference grammar: angular_discrete_assign.cpp defineParams
        self.addParamsLine("  [--sym <symmetry=\"\">] : Symmetry group "
                           "(used by the rot-tilt restriction)")
        self.addParamsLine("  [--max_shift_change <r=0>] : Maximum change "
                           "allowed in shift (0 = use --max_shift)")
        self.addParamsLine("  [--psi_step <ang=5>] : Step in psi (deg) of "
                           "the coarse in-plane search")
        self.addParamsLine("  [--shift_step <r=1>] : Step in shift (px) of "
                           "the translation grid")
        self.addParamsLine("  [--search5D]        : Joint 5D search (the "
                           "TPU engine always searches (ref, psi, shift) "
                           "jointly; accepted for grammar parity)")
        self.addParamsLine("  [--dont_check_mirrors] : Do not check "
                           "mirrors of the input images")
        self.addParamsLine("  [--max_proj_change <ang=-1>] : Maximum "
                           "change allowed in rot-tilt")
        self.addParamsLine("  [--max_psi_change <ang=-1>] : Maximum change "
                           "allowed in psi")
        self.addParamsLine("  [--keep <th=50>]    : Percentage of gallery "
                           "candidates kept by the wavelet preselection")
        self.addParamsLine("  [--smin <s=1>]      : Finest DWT scale used")
        self.addParamsLine("  [--smax <s=-1>]     : Coarsest DWT scale "
                           "used (-1 = 2 levels)")
        self.addParamsLine("  [--pick <mth=1>]    : 0 = best-correlation "
                           "candidate set; 1 = most populated direction "
                           "cluster among the candidates")
        self.addParamsLine("  [--show_rot_tilt]   : Show the rot-tilt "
                           "preselection")
        self.addParamsLine("  [--show_psi_shift]  : Show the psi-shift "
                           "resolution")
        self.addParamsLine("  [--show_options]    : Show the final "
                           "candidate options")

    def readParams(self):
        super().readParams()
        if self.checkParam("--sym") and self.getParam("--sym"):
            from xmipp3_tpu.core.sym import SymList
            self.sym = SymList(self.getParam("--sym"))
        msc = self.getDoubleParam("--max_shift_change")
        if msc > 0:
            self.max_shift = int(round(msc))
        self.psi_step = self.getDoubleParam("--psi_step")
        self.trial_step = self.getDoubleParam("--shift_step")
        if self.checkParam("--dont_check_mirrors"):
            self.check_mirror = False
        mpc = self.getDoubleParam("--max_proj_change")
        if mpc >= 0:
            self.max_ang_change = mpc
        mpsi = self.getDoubleParam("--max_psi_change")
        self.max_psi_change = mpsi if mpsi >= 0 else None
        self.keep_pct = self.getDoubleParam("--keep")
        self.smin = self.getIntParam("--smin")
        self.smax = self.getIntParam("--smax")
        self.pick = self.getIntParam("--pick")
        self.show_rot_tilt = self.checkParam("--show_rot_tilt")
        self.show_psi_shift = self.checkParam("--show_psi_shift")
        self.show_options = self.checkParam("--show_options")

    def _dwt_levels(self, H):
        """--smin/--smax -> number of db4 decomposition levels: the
        coarsest scale bounds the pyramid depth (reference smax; -1 keeps
        the 2-level default), clamped so the low band stays >= 8 px."""
        import math
        levels = self.smax if self.smax > 0 else 2
        return int(max(1, min(levels, math.floor(math.log2(H)) - 3)))

    def _extra_allowed(self, imgs, refs):
        import jax.numpy as jnp
        from xmipp3_tpu.ops.denoise import db4_dwt2
        levels = self._dwt_levels(refs.shape[-1])
        if self._ll_cache is None or self._ll_cache[0] is not refs:
            ll_r, _ = db4_dwt2(jnp.asarray(refs), levels)
            ll_r = np.array(ll_r).reshape(len(refs), -1)
            ll_r -= ll_r.mean(axis=1, keepdims=True)
            ll_r /= np.maximum(np.linalg.norm(ll_r, axis=1,
                                              keepdims=True), 1e-9)
            self._ll_cache = (refs, ll_r)
        ll_r = self._ll_cache[1]
        ll_i, _ = db4_dwt2(jnp.asarray(imgs), levels)
        ll_i = np.array(ll_i).reshape(len(imgs), -1)
        ll_i -= ll_i.mean(axis=1, keepdims=True)
        ll_i /= np.maximum(np.linalg.norm(ll_i, axis=1, keepdims=True),
                           1e-9)
        cc = ll_i @ ll_r.T                       # (B, R) low-band NCC
        R = len(ll_r)
        # --keep is the PER-ROUND retention of the reference's
        # coarse-to-fine scale sweep; the single-pass equivalent keeps
        # (keep/100)^levels of the gallery (50% over 2 rounds = 25%)
        keep = getattr(self, "keep_pct", 50.0)
        frac = (keep / 100.0) ** levels
        m = int(np.clip(round(R * frac), min(8, R), R))
        thresh = np.sort(cc, axis=1)[:, -m][:, None]
        mask = (cc >= thresh).astype(np.float32)
        if getattr(self, "pick", 1) == 1 and self._ref_dirs_all is not None:
            mask = self._pick_populated(mask, cc)
        if getattr(self, "show_rot_tilt", False):
            for i in range(len(mask)):
                print(f"  image {i}: {int(mask[i].sum())} rot-tilt "
                      f"candidates kept")
        return mask

    def _pick_populated(self, mask, cc):
        """--pick 1: among the wavelet-preselected candidates keep only
        the most populated projection-direction cluster (reference 'maximum
        of the most populated' group selection). The clustering radius
        adapts to the gallery's nearest-neighbor separation; size ties
        break toward the cluster holding the best correlation."""
        dirs = self._ref_dirs_all
        # nearest-neighbor angular separation of the gallery
        cosg = np.clip(np.abs(dirs @ dirs.T), -1.0, 1.0)
        np.fill_diagonal(cosg, -1.0)
        nn_sep = np.degrees(np.arccos(np.median(cosg.max(axis=1))))
        cos_thr = np.cos(np.deg2rad(max(15.0, 1.6 * nn_sep)))
        out = np.array(mask)
        for i in range(len(mask)):
            cand = np.flatnonzero(mask[i] > 0)
            if len(cand) <= 1:
                continue
            # the reference picks among a SHORT final-options list (the
            # per-scale winners); cluster only the best few candidates
            if len(cand) > 8:
                cand = cand[np.argsort(cc[i, cand])[-8:]]
            d = dirs[cand]
            adj = np.abs(d @ d.T) >= cos_thr
            # connected components (greedy BFS)
            comp = -np.ones(len(cand), int)
            c = 0
            for s in range(len(cand)):
                if comp[s] >= 0:
                    continue
                stack = [s]
                comp[s] = c
                while stack:
                    u = stack.pop()
                    for v in np.flatnonzero(adj[u]):
                        if comp[v] < 0:
                            comp[v] = c
                            stack.append(v)
                c += 1
            sizes = np.bincount(comp)
            # score: population first, best candidate correlation second
            cc_i = cc[i, cand]
            best_cc = np.array([cc_i[comp == k].max()
                                for k in range(c)])
            best = np.lexsort((best_cc, sizes))[-1]
            keep = cand[comp == best]
            out[i] = 0.0
            out[i, keep] = 1.0
            if getattr(self, "show_options", False):
                print(f"  image {i}: cluster sizes {sizes.tolist()}, "
                      f"kept {len(keep)}")
        return out


class ProgAngularAssignmentMag(ProgAngularProjectionMatching):
    """Fast assignment via Fourier-magnitude rotation estimation
    (reference angular_assignment_mag.h:49). The gallery path shares the
    matching engine; the magnitude trick lives in ops.align and is used by
    the in-plane stage. Accepts the reference's single-dash spellings
    (-ref/-odir/-sampling/-angleStep, angular_assignment_mag.cpp grammar)
    and its validation extras."""
    name = "xmipp_angular_assignment_mag"

    def defineParams(self):
        super().defineParams()
        g = self._grammar
        # reference single-dash spellings -> the matching grammar
        g._alias_map["-ref"] = "--ref"
        g.params["--ref"].aliases.append("-ref")
        g._alias_map["--maxShift"] = "--max_shift"
        g.params["--max_shift"].aliases.append("--maxShift")
        self.addParamsLine("  [-odir <outputDir=\".\">] : Output directory")
        self.addParamsLine("  [--sym <symfile=c1>] : Enforce symmetry in "
                           "the assigned projections")
        self.addParamsLine("  [-sampling <sampling=1.>] : Pixel size (A)")
        self.addParamsLine("  [-angleStep <angStep=3.>] : Gallery angular "
                           "step when reprojecting --refVol")
        self.addParamsLine("  [--refVol <refVolFile=NULL>] : Reference "
                           "volume reprojected as the gallery (instead of "
                           "--ref projections)")
        self.addParamsLine("  [--useForValidation] : Keep the per-image "
                           "neighborhood candidate list for the "
                           "multireference aligneability validation")

    def read(self, argv):
        # --refVol: reproject the volume at -angleStep into a gallery so
        # the base matcher can run unchanged (the reference builds its
        # own gallery internally in this mode)
        argv = list(argv)
        if "--refVol" in argv and not any(
                t in argv for t in ("--ref", "-r", "-ref")):
            import os
            import tempfile
            from xmipp3_tpu.core.image import Image as _Img
            from xmipp3_tpu.core.metadata import MetaData as _MD
            from xmipp3_tpu.core.sampling import compute_sampling_points
            from xmipp3_tpu.ops.project import FourierProjector

            def _val(flag, default):
                return (argv[argv.index(flag) + 1] if flag in argv
                        and argv.index(flag) + 1 < len(argv) else default)
            vol = np.squeeze(_Img(_val("--refVol", "")).data
                             ).astype(np.float32)
            step = float(_val("-angleStep", "3.0"))
            angles = compute_sampling_points(step)
            proj = np.asarray(FourierProjector(vol).project_euler(
                angles[:, 0].astype(np.float32),
                angles[:, 1].astype(np.float32),
                np.zeros(len(angles), np.float32)))
            odir = _val("-odir", ".")
            os.makedirs(odir or ".", exist_ok=True)
            d = tempfile.mkdtemp(dir=odir or ".")
            _Img(proj).write(os.path.join(d, "gal.stk"))
            _MD.fromRows([
                {"image": f"{k + 1:06d}@{os.path.join(d, 'gal.stk')}",
                 "angleRot": float(angles[k, 0]),
                 "angleTilt": float(angles[k, 1]), "anglePsi": 0.0}
                for k in range(len(angles))]).write(
                os.path.join(d, "gal.doc"))
            argv = argv + ["--ref", os.path.join(d, "gal.doc")]
        super().read(argv)


class ProgAngularBreakSymmetry(XmippProgram):
    name = "xmipp_angular_break_symmetry"

    def defineParams(self):
        self.addUsageLine("Randomly reassign each image's angles among its "
                          "symmetry-equivalent versions (break symmetry).")
        self.addParamsLine("   -i <md_file>  : Input angles")
        self.addParamsLine("   -o <md_file>  : Output angles")
        self.addParamsLine("  [--sym <s=c1>] : Symmetry group")
        self.addParamsLine("  [--seed <n=0>] : Random seed")

    def run(self):
        from xmipp3_tpu.core.sym import SymList
        md = MetaData(self.getParam("-i"))
        sym = SymList(self.getParam("--sym"))
        rng = np.random.default_rng(self.getIntParam("--seed"))
        rows = []
        for i in md:
            r = md.getRow(i)
            equiv = sym.expand_euler(float(r.get("angleRot", 0)),
                                     float(r.get("angleTilt", 0)),
                                     float(r.get("anglePsi", 0)))
            rot, tilt, psi = equiv[rng.integers(0, len(equiv))]
            r["angleRot"], r["angleTilt"], r["anglePsi"] = rot, tilt, psi
            rows.append(r)
        MetaData.fromRows(rows).write(self.getParam("-o"))


class ProgAngularEstimateTiltAxis(XmippProgram):
    name = "xmipp_angular_estimate_tilt_axis"

    def defineParams(self):
        self.addUsageLine("Estimate the tilt axis direction from matching "
                          "untilted/tilted coordinate pairs.")
        self.addParamsLine("   --untilted <md> : Untilted coordinates (xcoor/ycoor)")
        self.addParamsLine("   --tilted <md>   : Tilted coordinates")
        self.addParamsLine("  [-o <md=\"\">]     : Output metadata")

    def run(self):
        md_u = MetaData(self.getParam("--untilted"))
        md_t = MetaData(self.getParam("--tilted"))
        u = np.stack([md_u.getColumn("xcoor").astype(float),
                      md_u.getColumn("ycoor").astype(float)], axis=1)
        t = np.stack([md_t.getColumn("xcoor").astype(float),
                      md_t.getColumn("ycoor").astype(float)], axis=1)
        n = min(len(u), len(t))
        u, t = u[:n], t[:n]
        # affine fit t = A u + b; tilt axis = eigenvector of A with |lam|=1
        U = np.hstack([u, np.ones((n, 1))])
        A, *_ = np.linalg.lstsq(U, t, rcond=None)
        M = A[:2].T                     # 2x2 linear part
        # direction preserved in length: M^T M eigenvector with eigenvalue ~1
        w, v = np.linalg.eigh(M.T @ M)
        axis = v[:, np.argmin(np.abs(w - 1.0))]
        ang = float(np.degrees(np.arctan2(axis[1], axis[0])))
        cos_tilt = np.sqrt(np.clip(w.min(), 0, 1))
        tilt = float(np.degrees(np.arccos(np.clip(cos_tilt, -1, 1))))
        self.tilt_axis_angle = ang
        self.tilt_angle = tilt
        print(f"Tilt axis angle: {ang:.2f} deg; tilt: {tilt:.2f} deg")
        if self.checkParam("-o") and self.getParam("-o"):
            MetaData.fromRows([{"tiltAxisAngle": ang, "angleY": tilt}]
                              ).write(self.getParam("-o"))


class ProgMultireferenceAligneability(XmippProgram):
    name = "xmipp_multireference_aligneability"

    def defineParams(self):
        self.addUsageLine("Alignability validation: precision/accuracy of "
                          "each particle's angular assignment against a "
                          "reference volume gallery.")
        self.addParamsLine("   -i <md_file>  : Particles with poses")
        self.addParamsLine("   --volume <vol> : Reference volume")
        self.addParamsLine("   -o <md_file>  : Output with alignability scores")
        self.addParamsLine("  [--sampling <s=15>] : Gallery sampling (deg)")

    def run(self):
        from xmipp3_tpu.core.sampling import (Sampling,
                                              directions_from_angles)
        from xmipp3_tpu.ops.match import rotational_corr_matrix
        from xmipp3_tpu.ops.polar import cartesian_to_polar, ring_ffts
        from xmipp3_tpu.ops.project import FourierProjector
        import jax.numpy as jnp
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        vol = np.squeeze(Image(self.getParam("--volume")).data
                         ).astype(np.float32)
        s = Sampling(self.getDoubleParam("--sampling"), "c1")
        proj = FourierProjector(vol)
        refs = np.asarray(proj.project_euler(
            s.angles[:, 0].astype(np.float32),
            s.angles[:, 1].astype(np.float32),
            np.zeros(len(s.angles), np.float32)))
        H = imgs.shape[-1]
        f_refs = ring_ffts(cartesian_to_polar(jnp.asarray(refs), 2, H // 2 - 2))
        f_imgs = ring_ffts(cartesian_to_polar(jnp.asarray(imgs), 2, H // 2 - 2))
        corr = np.asarray(rotational_corr_matrix(f_refs, f_imgs, 2)
                          ).max(axis=2)                       # (B,R)
        best = corr.argmax(axis=1)
        d_ref = s.directions
        d_ass = directions_from_angles(np.stack(
            [np.array([float(r.get("angleRot", 0)) for r in rows]),
             np.array([float(r.get("angleTilt", 0)) for r in rows])], axis=1))
        # precision: sharpness of the correlation landscape;
        # accuracy: distance between claimed pose and gallery-best pose
        sorted_corr = np.sort(corr, axis=1)
        precision = (sorted_corr[:, -1] - sorted_corr[:, -5]) / \
            np.maximum(np.abs(sorted_corr[:, -1]), 1e-9)
        acc_ang = np.degrees(np.arccos(np.clip(
            (d_ass * d_ref[best]).sum(1), -1, 1)))
        accuracy = np.minimum(acc_ang, 180 - acc_ang)
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["weightAlignabilityPrecision"] = float(precision[i])
            d["weightAlignabilityAccuracy"] = float(
                np.exp(-accuracy[i] / 30.0))
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o"))
        self.precision = precision
        self.accuracy = accuracy


class ProgValidationNonTilt(ProgMultireferenceAligneability):
    """Non-tilt validation — same alignability machinery, summarized as one
    quality score per volume (reference validation_nontilt)."""
    name = "xmipp_validation_nontilt"

    def run(self):
        super().run()
        p = float(np.mean(self.precision > 0.02))
        print(f"Validation score (fraction confidently alignable): {p:.3f}")
        self.score = p


class ProgCompareViews(XmippProgram):
    name = "xmipp_compare_views"

    def defineParams(self):
        self.addUsageLine("Compare experimental images against the "
                          "projections of a volume at their assigned angles.")
        self.addParamsLine("   -i <md_file>  : Particles with poses")
        self.addParamsLine("   --ref <volume> : Reference volume")
        self.addParamsLine("  [-o <md=\"\">]   : Output metadata with correlations")

    def run(self):
        from xmipp3_tpu.ops.project import FourierProjector
        from xmipp3_tpu.ops.geo import apply_md_geometry
        from xmipp3_tpu.ops.shift import correlation_index
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        vol = np.squeeze(Image(self.getParam("--ref")).data).astype(np.float32)
        proj = FourierProjector(vol)
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        registered = np.asarray(apply_md_geometry(
            imgs, get("anglePsi"), get("shiftX"), get("shiftY"),
            np.array([bool(r.get("flip", 0)) for r in rows])))
        refs = np.asarray(proj.project_euler(get("angleRot"),
                                             get("angleTilt"),
                                             np.zeros(len(rows), np.float32)))
        cc = np.asarray(correlation_index(refs, registered))
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["maxCC"] = float(cc[i])
            out.append(d)
        result = MetaData.fromRows(out)
        if self.checkParam("-o") and self.getParam("-o"):
            result.write(self.getParam("-o"))
        self.correlations = cc
        if self.verbose:
            print(f"mean CC vs reference views: {cc.mean():.4f}")


PROGRAM = None
