"""Zernike3D programs: volume_deform_sph, volume_apply_coefficient_zernike3d,
angular_sph_alignment.

Contracts: reference volume_deform_sph (volume_deform_sph.h:38),
volume_apply_deform_sph / volume_apply_coefficient_zernike3d,
angular_sph_alignment (angular_sph_alignment.h:42).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.errors import ErrCode, XmippError
from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram


class ProgVolumeDeformSph(XmippProgram):
    name = "xmipp_volume_deform_sph"

    def defineParams(self):
        self.addUsageLine("Deform a volume onto a reference with a Zernike3D "
                          "displacement field.")
        self.addParamsLine("   -i <volume>  : Volume to deform")
        self.addParamsLine("   -r <volume>  : Target (reference) volume")
        self.addParamsLine("  [-o <out=deformed.vol>] : Deformed volume")
        self.addParamsLine("  [--l1 <l1=3>]  : Zernike radial depth")
        self.addParamsLine("  [--l2 <l2=2>]  : Spherical harmonic depth")
        self.addParamsLine("  [--steps <n=100>] : Optimization steps")
        self.addParamsLine("  [--oroot <root=\"\">] : Also write coefficients (.xmd)")

    def run(self):
        from xmipp3_tpu.ops.zernike import (deformation_amplitude,
                                            fit_deformation,
                                            zernike_basis_grid)
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        ref = np.squeeze(Image(self.getParam("-r")).data).astype(np.float32)
        L1 = self.getIntParam("--l1")
        L2 = self.getIntParam("--l2")
        coeffs, deformed, ncc = fit_deformation(
            vol, ref, L1, L2, n_steps=self.getIntParam("--steps"),
            verbose=self.verbose)
        save_image(self.getParam("-o"), deformed)
        self.ncc = ncc
        basis = zernike_basis_grid(vol.shape[0], L1, L2)
        self.deformation = deformation_amplitude(basis, coeffs)
        if self.verbose:
            print(f"NCC after deformation: {ncc:.4f}  "
                  f"RMS deformation: {self.deformation:.3f} px")
        root = self.getParam("--oroot")
        if root:
            md = MetaData.fromRows([{
                "sphCoefficients": coeffs.ravel().astype(np.float64),
                "sphDeformation": self.deformation,
                "image": self.getParam("-i")}])
            md.write(root + ".xmd")


class ProgVolumeApplyCoefficientZernike3D(XmippProgram):
    name = "xmipp_volume_apply_coefficient_zernike3d"

    def defineParams(self):
        self.addUsageLine("Apply stored Zernike3D coefficients to a volume.")
        self.addParamsLine("   -i <volume>  : Input volume")
        self.addParamsLine("   --clnm <md>  : Metadata with sphCoefficients")
        self.addParamsLine("  [-o <out=deformed.vol>] : Output")
        self.addParamsLine("  [--l1 <l1=3>]  : Zernike radial depth")
        self.addParamsLine("  [--l2 <l2=2>]  : Spherical harmonic depth")

    def run(self):
        from xmipp3_tpu.ops.zernike import deform_volume, zernike_basis_grid
        import jax.numpy as jnp
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        md = MetaData(self.getParam("--clnm"))
        flat = np.asarray(md.getValue("sphCoefficients", md.firstObject()),
                          np.float32)
        coeffs = flat.reshape(3, -1)
        basis = jnp.asarray(zernike_basis_grid(
            vol.shape[0], self.getIntParam("--l1"),
            self.getIntParam("--l2")))
        if basis.shape[0] != coeffs.shape[1]:
            from xmipp3_tpu.core.errors import ErrCode, XmippError
            raise XmippError(ErrCode.PARAM_INCORRECT,
                             f"coefficient count {coeffs.shape[1]} != basis "
                             f"size {basis.shape[0]} for l1/l2")
        out = deform_volume(jnp.asarray(vol), basis, jnp.asarray(coeffs))
        save_image(self.getParam("-o"), np.asarray(out))


class ProgAngularSphAlignment(XmippProgram):
    name = "xmipp_angular_sph_alignment"

    def defineParams(self):
        self.addUsageLine("Per-particle flexible alignment: fit Zernike3D "
                          "coefficients (+ pose refinement) against particle "
                          "images through the differentiable projector.")
        self.addParamsLine("   -i <md_file> : Particles with poses")
        self.addParamsLine("   --ref <volume> : Reference volume")
        self.addParamsLine("   -o <md_file> : Output with sphCoefficients")
        self.addParamsLine("  [--l1 <l1=2>]  : Zernike radial depth")
        self.addParamsLine("  [--l2 <l2=2>]  : Spherical harmonic depth")
        self.addParamsLine("  [--steps <n=40>] : Optimization steps per batch")
        self.addParamsLine("  [--batch <b=16>] : Particles per batch")
        self.addParamsLine("  [--priors <md=\"\">] : Metadata with prior "
                          "sphCoefficients (per-row, or one global row) used "
                          "to initialize the per-particle coefficients "
                          "(forward_zernike_images_priors contract)")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def run(self):
        import jax
        import jax.numpy as jnp
        from xmipp3_tpu.core.metadata_program import load_image_rows
        from xmipp3_tpu.ops.zernike import deform_volume, zernike_basis_grid
        from xmipp3_tpu.ops.project import (prepare_fourier_volume,
                                            extract_central_slices,
                                            slices_to_projections)
        from xmipp3_tpu.ops.continuous import _euler_jnp

        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        vol = np.squeeze(Image(self.getParam("--ref")).data).astype(np.float32)
        D = vol.shape[0]
        L1, L2 = self.getIntParam("--l1"), self.getIntParam("--l2")
        basis = jnp.asarray(zernike_basis_grid(D, L1, L2))
        K = basis.shape[0]
        get = lambda k, d=0.0: np.array([float(r.get(k, d)) for r in rows],
                                        np.float32)
        rot, tilt, psi = get("angleRot"), get("angleTilt"), get("anglePsi")
        N = imgs.shape[-1]
        vol_j = jnp.asarray(vol)

        def one_loss(coeffs, img, rot_i, tilt_i, psi_i):
            warped = deform_volume(vol_j, basis, coeffs)
            vf, _ = prepare_fourier_volume(warped, 2.0)
            mats = _euler_jnp(rot_i[None], tilt_i[None], psi_i[None])
            proj = slices_to_projections(
                extract_central_slices(vf, mats, N), N)[0]
            pm = proj - proj.mean()
            im = img - img.mean()
            return -(pm * im).sum() / jnp.maximum(
                jnp.sqrt((pm ** 2).sum() * (im ** 2).sum()), 1e-12)

        def batch_loss(coeffs_b, imgs_b, rot_b, tilt_b, psi_b):
            losses = jax.vmap(one_loss)(coeffs_b, imgs_b, rot_b, tilt_b,
                                        psi_b)
            return losses.mean(), losses

        grad_fn = jax.jit(jax.value_and_grad(batch_loss, has_aux=True))
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             read_mesh_params, resolve_mesh)
        read_mesh_params(self)
        maybe_init_distributed(self)
        mesh, _ = resolve_mesh(self.mesh_mode)
        B = len(rows)
        bs = self.getIntParam("--batch")
        n_steps = self.getIntParam("--steps")
        out_rows = []
        priors = None
        if self.checkParam("--priors") and self.getParam("--priors"):
            pmd = MetaData(self.getParam("--priors"))
            pc = [np.asarray(v, np.float32).reshape(3, -1)
                  for v in pmd.getColumnValues("sphCoefficients")]
            if len(pc) == 1:
                priors = np.stack(pc * B)
            else:
                priors = np.stack(pc)[:B]
            if priors.shape[-1] != K:
                raise XmippError(ErrCode.VALUE_INCORRECT,
                                 f"prior has {priors.shape[-1]} coefficients"
                                 f", basis has {K}")
        for s in range(0, B, bs):
            sl = slice(s, min(s + bs, B))
            nb = sl.stop - sl.start
            coeffs = (np.zeros((nb, 3, K), np.float32) if priors is None
                      else priors[sl])
            args = [imgs[sl], rot[sl], tilt[sl], psi[sl]]
            nb_run = nb
            if mesh is not None:
                # per-particle DP (the reference's mpi_angular_sph_alignment
                # particle distribution): everything in batch_loss is
                # per-particle, so sharding the batch axis alone makes XLA
                # partition the whole fit; padded rows are dropped after.
                from xmipp3_tpu.parallel.engines import shard_batch
                n_dev = mesh.shape["data"]
                rep = (-nb) % n_dev

                def pad_rep(a):
                    # pad by repeating row 0 (zero images would make the
                    # normalized-correlation grad NaN at sqrt(0))
                    a = np.asarray(a, np.float32)
                    if rep:
                        a = np.concatenate(
                            [a, np.broadcast_to(a[:1],
                                                (rep,) + a.shape[1:])])
                    return shard_batch(jnp.asarray(a), mesh)
                coeffs = pad_rep(coeffs)
                args = [pad_rep(a) for a in args]
                nb_run = int(coeffs.shape[0])
            else:
                coeffs = jnp.asarray(coeffs, jnp.float32)
                args = [jnp.asarray(a) for a in args]
            m = jnp.zeros_like(coeffs)
            v = jnp.zeros_like(coeffs)
            losses = None
            for step in range(n_steps):
                (loss, losses), g = grad_fn(coeffs, *args)
                g = g * nb_run
                m = 0.9 * m + 0.1 * g
                v = 0.999 * v + 0.001 * g * g
                mhat = m / (1 - 0.9 ** (step + 1))
                vhat = v / (1 - 0.999 ** (step + 1))
                coeffs = coeffs - 0.05 * mhat / (jnp.sqrt(vhat) + 1e-8)
            cc = -np.asarray(losses)[:nb]
            cf = np.asarray(coeffs)[:nb]
            for i in range(nb):
                d = dict(rows[s + i])
                d["sphCoefficients"] = cf[i].ravel().astype(np.float64)
                d["sphDeformation"] = float(np.abs(cf[i]).mean())
                d["maxCC"] = float(cc[i])
                out_rows.append(d)
            if self.verbose:
                print(f"  sph batch {s // bs + 1}: mean CC {cc.mean():.4f}")
        MetaData.fromRows(out_rows).write(self.getParam("-o"))


PROGRAM = None


class ProgForwardZernikeImages(XmippProgram):
    """DISTINCT forward-model Zernike3D engine (reference
    forward_zernike_images.{h,cpp}): each particle is fit by splatting the
    deformed masked voxel cloud directly into its projection plane
    (deformVol, forward_zernike_images.cpp:1047-1145) with simultaneous
    pose-delta refinement and deformation regularization — not the
    deform-volume-then-project scheme of angular_sph_alignment."""
    name = "xmipp_forward_zernike_images"

    def defineParams(self):
        self.addUsageLine("Per-particle flexible refinement with the "
                          "forward splatting model.")
        self.addParamsLine("   -i <md_file> : Particles with poses")
        self.addParamsLine("   --ref <volume> : Reference volume")
        self.addParamsLine("   -o <md_file> : Output metadata")
        self.addParamsLine("  [--l1 <l1=2>] : Zernike radial depth")
        self.addParamsLine("  [--l2 <l2=2>] : Spherical harmonic depth")
        self.addParamsLine("  [--max_shift <s=5>] : Maximum shift delta (px)")
        self.addParamsLine("  [--max_angular_change <a=5>] : Maximum angular delta (deg)")
        self.addParamsLine("  [--regularization <l=0.005>] : Deformation penalty lambda")
        self.addParamsLine("  [--steps <n=60>] : Optimization steps")
        self.addParamsLine("  [--batch <b=16>] : Particles per device batch")
        self.addParamsLine("  [--priors <md=\"\">] : Metadata whose sphCoefficients initialize the fit (the _priors program contract)")
        from xmipp3_tpu.parallel.cli import add_mesh_params
        add_mesh_params(self)

    def _priors_for(self, B, K):
        if not (self.checkParam("--priors") and self.getParam("--priors")):
            return None
        pmd = MetaData(self.getParam("--priors"))
        pc = [np.asarray(v, np.float32).reshape(3, -1)
              for v in pmd.getColumnValues("sphCoefficients")]
        priors = np.stack(pc * B)[:B] if len(pc) == 1 else np.stack(pc)[:B]
        if priors.shape[-1] != K:
            raise XmippError(ErrCode.VALUE_INCORRECT,
                             f"prior has {priors.shape[-1]} coefficients, "
                             f"basis has {K}")
        return priors

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.core.metadata_program import load_image_rows
        from xmipp3_tpu.ops.forward_zernike import (fit_forward_zernike_batch,
                                                    masked_voxel_basis)

        md = MetaData(self.getParam("-i"))
        md.removeDisabled()
        rows = list(md.iterRows())
        imgs = load_image_rows(rows)
        vol = np.squeeze(Image(self.getParam("--ref")).data).astype(
            np.float32)
        L1 = self.getIntParam("--l1")
        L2 = self.getIntParam("--l2")
        lam = float(self.getDoubleParam("--regularization"))
        positions, values, Z = masked_voxel_basis(
            vol, L1, L2, value_threshold=float(np.abs(vol).max()) * 1e-3)
        K = Z.shape[0]
        size = imgs.shape[-1]
        get = lambda k, d=0.0: np.array([float(r.get(k, d)) for r in rows],
                                        np.float32)
        rot, tilt, psi = get("angleRot"), get("angleTilt"), get("anglePsi")
        B = len(rows)
        bs = self.getIntParam("--batch")
        self._rows = rows
        priors = self._priors_for(B, K)
        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             read_mesh_params, resolve_mesh)
        read_mesh_params(self)
        maybe_init_distributed(self)
        mesh, _ = resolve_mesh(self.mesh_mode)
        out_rows = []
        for s in range(0, B, bs):
            sl = slice(s, min(s + bs, B))
            nb = sl.stop - sl.start
            c0 = (np.zeros((nb, 3, K), np.float32) if priors is None
                  else np.asarray(priors[sl], np.float32))
            batch = [imgs[sl], rot[sl], tilt[sl], psi[sl], c0]
            if mesh is not None:
                # per-particle DP (mpi_forward_zernike_images analog):
                # shard the batch axis; the vmapped fit partitions with no
                # collectives. Pad by repeating row 0, drop after.
                from xmipp3_tpu.parallel.engines import shard_batch
                rep = (-nb) % mesh.shape["data"]

                def pad_rep(a):
                    a = np.asarray(a, np.float32)
                    if rep:
                        a = np.concatenate(
                            [a, np.broadcast_to(a[:1],
                                                (rep,) + a.shape[1:])])
                    return shard_batch(jnp.asarray(a), mesh)
                batch = [pad_rep(a) for a in batch]
            else:
                batch = [jnp.asarray(a) for a in batch]
            c3, dpose, corr, deform = fit_forward_zernike_batch(
                jnp.asarray(positions), jnp.asarray(values), jnp.asarray(Z),
                batch[0], batch[1], batch[2], batch[3], batch[4], lam,
                size, int(self.getIntParam("--steps")),
                max_angular=float(self.getDoubleParam("--max_angular_change")),
                max_shift=float(self.getDoubleParam("--max_shift")))
            c3 = np.asarray(c3)[:nb]
            dpose = np.asarray(dpose)[:nb]
            for k in range(nb):
                r = dict(rows[sl.start + k])
                r["angleRot"] = float(rot[sl.start + k] + dpose[k, 0])
                r["angleTilt"] = float(tilt[sl.start + k] + dpose[k, 1])
                r["anglePsi"] = float(psi[sl.start + k] + dpose[k, 2])
                r["shiftX"] = float(r.get("shiftX", 0.0)) + float(dpose[k, 3])
                r["shiftY"] = float(r.get("shiftY", 0.0)) + float(dpose[k, 4])
                r["sphCoefficients"] = c3[k].reshape(-1)
                r["sphDeformation"] = float(np.asarray(deform)[k])
                r["maxCC"] = float(np.asarray(corr)[k])
                out_rows.append(r)
        out = MetaData.fromRows(out_rows)
        out.write(self.getParam("-o"))
        self.mean_corr = float(np.mean([r["maxCC"] for r in out_rows]))
        if self.verbose:
            print(f"  mean corr {self.mean_corr:.4f}")


class ProgForwardZernikeImagesPriors(ProgForwardZernikeImages):
    """forward_zernike_images_priors: the forward engine initialized from
    prior coefficients (reference forward_zernike_images_priors.h —
    same model, priors seed the optimization). Priors come from --priors
    or, failing that, from the input rows' own sphCoefficients column."""
    name = "xmipp_forward_zernike_images_priors"

    def _priors_for(self, B, K):
        explicit = super()._priors_for(B, K)
        if explicit is not None:
            return explicit
        rows = getattr(self, "_rows", [])
        if rows and "sphCoefficients" in rows[0]:
            pc = [np.asarray(r["sphCoefficients"],
                             np.float32).reshape(3, -1) for r in rows]
            priors = np.stack(pc)
            if priors.shape[-1] == K:
                return priors
        return None
