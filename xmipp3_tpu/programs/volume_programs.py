"""Volume programs: from_pdb, center, align, subtraction, segment,
transform_mask, transform_symmetrize, volume_to_pseudoatoms.

Contracts: reference volume_from_pdb, volume_center, volume_align_prog,
volume_subtraction (volume_subtraction.h:33), volume_segment, ProgMask
(data/mask.h:1039), symmetrize (symmetrize.h:39), volume_to_pseudoatoms
(volume_to_pseudoatoms.h:72).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import XmippMetadataProgram
from xmipp3_tpu.core.program import XmippProgram


class ProgVolumeFromPDB(XmippProgram):
    name = "xmipp_volume_from_pdb"

    def defineParams(self):
        self.addUsageLine("Rasterize an atomic model (PDB/mmCIF) into a "
                          "voxel volume.")
        self.addParamsLine("   -i <pdb_file> : Input atomic model")
        self.addParamsLine("  [-o <root=\"\">] : Output rootname (.vol)")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size (Å)")
        self.addParamsLine("  [--size <n=-1>] : Box size (voxels; -1 = auto)")
        self.addParamsLine("  [--centerPDB]   : Center the model")

    def run(self):
        from xmipp3_tpu.core.pdb import rasterize, read_pdb
        fn = self.getParam("-i")
        model = read_pdb(fn)
        Ts = self.getDoubleParam("--sampling")
        n = self.getIntParam("--size")
        if n <= 0:
            extent = (model.coords.max(axis=0) - model.coords.min(axis=0)).max()
            n = int(np.ceil(extent / Ts)) + 10
            n += n % 2
        vol = rasterize(model, n, Ts)
        root = self.getParam("-o") or fn.rsplit(".", 1)[0]
        if not root.endswith(".vol"):
            root += ".vol"
        save_image(root, vol, sampling=Ts)
        if self.verbose:
            print(f"Rasterized {len(model)} atoms into {n}^3 at {Ts} A/px")


class ProgVolumeCenter(XmippProgram):
    name = "xmipp_volume_center"

    def defineParams(self):
        self.addUsageLine("Center a volume by its center of mass.")
        self.addParamsLine("   -i <volume> : Input volume")
        self.addParamsLine("  [-o <out=\"\">] : Output (default in-place)")

    def run(self):
        from xmipp3_tpu.ops.fourier import fourier_shift_2d
        import jax.numpy as jnp
        fn = self.getParam("-i")
        vol = np.squeeze(Image(fn).data).astype(np.float32)
        D, H, W = vol.shape
        m = np.maximum(vol, 0)
        s = m.sum()
        z, y, x = np.mgrid[0:D, 0:H, 0:W].astype(np.float32)
        cz = (m * z).sum() / s - D // 2
        cy = (m * y).sum() / s - H // 2
        cx = (m * x).sum() / s - W // 2
        fz = np.fft.fftfreq(D).astype(np.float32)[:, None, None]
        fy = np.fft.fftfreq(H).astype(np.float32)[None, :, None]
        fx = np.fft.rfftfreq(W).astype(np.float32)[None, None, :]
        phase = jnp.exp(2j * jnp.pi * (fx * cx + fy * cy + fz * cz))
        out = np.asarray(jnp.fft.irfftn(jnp.fft.rfftn(jnp.asarray(vol)) *
                                        phase, s=vol.shape))
        save_image(self.getParam("-o") or fn, out)
        self.shift = (-cx, -cy, -cz)


class ProgVolumeAlign(XmippProgram):
    name = "xmipp_volume_align"

    def defineParams(self):
        self.addUsageLine("Align two volumes (exhaustive coarse Euler search "
                          "+ local refinement by projection correlation).")
        self.addParamsLine("   --i1 <volume> : Reference volume")
        self.addParamsLine("   --i2 <volume> : Volume to align")
        self.addParamsLine("  [--apply <out=\"\">] : Write aligned i2 here")
        self.addParamsLine("  [--step <s=20>] : Coarse angular step (deg)")
        self.addParamsLine("  [--local]       : Only local refinement around identity")
        self.addParamsLine("  [--frm <L=24>]  : Fast Rotational Matching over SO(3) via spherical harmonics (reference interface/frm.h; replaces the coarse grid)")

    def run(self):
        from xmipp3_tpu.core.sampling import compute_sampling_points
        from xmipp3_tpu.ops.geo import apply_affine_3d
        from xmipp3_tpu.core.geometry import euler_matrix
        import jax.numpy as jnp
        v1 = np.squeeze(Image(self.getParam("--i1")).data).astype(np.float32)
        v2 = np.squeeze(Image(self.getParam("--i2")).data).astype(np.float32)
        step = self.getDoubleParam("--step")
        if self.checkParam("--frm"):
            self._run_frm(v1, v2, self.getIntParam("--frm"))
            return
        if self.checkParam("--local"):
            cands = [(0.0, 0.0, 0.0)]
        else:
            pts = compute_sampling_points(step)
            psis = np.arange(-180.0, 180.0, step)
            cands = [(r, t, p) for r, t in pts for p in psis]
        v1j = jnp.asarray(v1 - v1.mean())
        n1 = float(jnp.linalg.norm(v1j))
        best = (-2.0, (0.0, 0.0, 0.0))
        B = 32
        for s in range(0, len(cands), B):
            chunk = np.array(cands[s:s + B], np.float32)
            mats = np.asarray(euler_matrix(chunk[:, 0], chunk[:, 1],
                                           chunk[:, 2]), np.float32)
            rotated = apply_affine_3d(v2, mats)
            r = rotated - rotated.mean(axis=(1, 2, 3), keepdims=True)
            norms = jnp.sqrt((r ** 2).sum(axis=(1, 2, 3)))
            cc = np.asarray((r * v1j[None]).sum(axis=(1, 2, 3)) /
                            jnp.maximum(norms * n1, 1e-12))
            k = int(np.argmax(cc))
            if cc[k] > best[0]:
                best = (float(cc[k]), tuple(chunk[k]))
        self.corr, self.angles = best
        if self.verbose:
            print(f"Best alignment: rot/tilt/psi = {self.angles} "
                  f"corr={self.corr:.4f}")
        if self.checkParam("--apply") and self.getParam("--apply"):
            mats = np.asarray(euler_matrix(*self.angles), np.float32)[None]
            from xmipp3_tpu.ops.geo import apply_affine_3d as aff
            save_image(self.getParam("--apply"),
                       np.asarray(aff(v2, mats))[0])

    def _run_frm(self, v1, v2, L):
        """SO(3) FRM alignment (ops.frm) + correlation report."""
        import jax.numpy as jnp
        from xmipp3_tpu.core.geometry import matrix_to_euler
        from xmipp3_tpu.ops.frm import frm_align_volumes
        from xmipp3_tpu.ops.geo import apply_affine_3d
        M = frm_align_volumes(v1, v2, L=L)
        rot, tilt, psi = (float(a) for a in matrix_to_euler(M))
        rotated = np.asarray(apply_affine_3d(v2, M[None]))[0]
        a = v1 - v1.mean()
        b = rotated - rotated.mean()
        corr = float((a * b).sum() /
                     max(np.linalg.norm(a) * np.linalg.norm(b), 1e-12))
        self.corr, self.angles = corr, (rot, tilt, psi)
        self.matrix = M
        if self.verbose:
            print(f"FRM alignment: rot/tilt/psi = ({rot:.3f}, {tilt:.3f}, "
                  f"{psi:.3f}) corr={corr:.4f}")
        if self.checkParam("--apply") and self.getParam("--apply"):
            save_image(self.getParam("--apply"), rotated)


class ProgVolumeSubtraction(XmippProgram):
    name = "xmipp_volume_subtraction"

    def defineParams(self):
        self.addUsageLine("Adjust a volume to a reference by POCS iteration "
                          "and optionally subtract (reference "
                          "volume_subtraction.{h,cpp}: POCS amplitude/"
                          "minmax/mask/phase/nonneg projections per "
                          "iteration, runIteration at volume_subtraction."
                          "cpp:362-410).")
        self.addParamsLine("   --i1 <volume> : Reference volume")
        self.addParamsLine("   --i2 <volume> : Volume to modify")
        self.addParamsLine("  [-o <out=output_volume.mrc>] : Adjusted volume (or difference with --sub)")
        self.addParamsLine("  [--sub] : Output the subtraction instead")
        self.addParamsLine("  [--iter <n=5>] : Adjustment iterations")
        self.addParamsLine("  [--sigma <s=3>] : Smoothing decay of the subtraction mask transition")
        self.addParamsLine("  [--mask1 <m=\"\">] : Mask for volume 1")
        self.addParamsLine("  [--mask2 <m=\"\">] : Mask for volume 2")
        self.addParamsLine("  [--maskSub <m=\"\">] : Mask for the subtraction region")
        self.addParamsLine("  [--cutFreq <f=0>] : Low-pass both volumes at this digital frequency")
        self.addParamsLine("  [--lambda <l=1>] : Relaxation factor for the amplitude POCS")
        self.addParamsLine("  [--radavg] : Match radially averaged amplitudes instead of direct ones")
        self.addParamsLine("  [--saveV1 <f=\"\">] : Save the filtered reference (with --sub)")
        self.addParamsLine("  [--saveV2 <f=\"\">] : Save the adjusted volume (with --sub)")
        self.addParamsLine("  [--computeEnergy] : Print per-step convergence energy")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops import pocs
        v1 = np.squeeze(Image(self.getParam("--i1")).data).astype(np.float32)
        v2 = np.squeeze(Image(self.getParam("--i2")).data).astype(np.float32)
        mask = None
        if self.getParam("--mask1") and self.getParam("--mask2"):
            m1 = np.squeeze(Image(self.getParam("--mask1")).data)
            m2 = np.squeeze(Image(self.getParam("--mask2")).data)
            mask = (m1 * m2).astype(np.float32)
        cut = float(self.getDoubleParam("--cutFreq"))
        adj = pocs.volume_adjust(
            v1, v2, mask=mask, iters=int(self.getIntParam("--iter")),
            lam=float(self.getDoubleParam("--lambda")),
            radavg=self.checkParam("--radavg"), cut_freq=cut)
        adj = np.asarray(adj)
        if self.checkParam("--sub"):
            if self.getParam("--maskSub"):
                msub = np.squeeze(Image(self.getParam("--maskSub")).data)
            else:
                base = np.ones(v1.shape, np.float32) if mask is None else mask
                sigma = float(self.getIntParam("--sigma"))
                from scipy.ndimage import gaussian_filter
                msub = gaussian_filter(base, sigma)
            if self.getParam("--saveV2"):
                save_image(self.getParam("--saveV2"), adj)
            if self.getParam("--saveV1"):
                v1f = np.asarray(
                    jnp.fft.irfftn(jnp.fft.rfftn(jnp.asarray(v1))
                                   * pocs._lowpass3d(v1.shape, cut), v1.shape)
                    if cut else v1)
                save_image(self.getParam("--saveV1"), v1f)
            out = np.asarray(pocs.subtract_adjusted(v1, adj, msub, cut))
        else:
            out = adj
        save_image(self.getParam("-o"), out)


class ProgVolumeSegment(XmippProgram):
    name = "xmipp_volume_segment"

    def defineParams(self):
        self.addUsageLine("Segment a volume into a binary mask.")
        self.addParamsLine("   -i <volume> : Input volume")
        self.addParamsLine("  [-o <mask=segmented.vol>] : Output binary mask")
        self.addParamsLine("  [--method <seg_method=otsu>] : Segmentation")
        self.addParamsLine("    where <seg_method>")
        self.addParamsLine("       voxel_mass <mass> : Keep the heaviest <mass> voxels")
        self.addParamsLine("       threshold <th>    : Absolute threshold")
        self.addParamsLine("       otsu              : Automatic (Otsu)")

    def run(self):
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        toks = self.getListParam("--method") or ["otsu"]
        if toks[0] == "threshold":
            th = float(toks[1])
        elif toks[0] == "voxel_mass":
            n_keep = int(float(toks[1]))
            th = np.partition(vol.ravel(), -n_keep)[-n_keep]
        else:  # otsu
            hist, edges = np.histogram(vol, bins=256)
            centers = 0.5 * (edges[:-1] + edges[1:])
            total = hist.sum()
            best, th = -1.0, centers[128]
            w0 = np.cumsum(hist)
            m0 = np.cumsum(hist * centers)
            mT = m0[-1]
            for k in range(1, 255):
                wb, wf = w0[k], total - w0[k]
                if wb == 0 or wf == 0:
                    continue
                mb = m0[k] / wb
                mf = (mT - m0[k]) / wf
                var = wb * wf * (mb - mf) ** 2
                if var > best:
                    best, th = var, centers[k]
        mask = (vol >= th).astype(np.float32)
        save_image(self.getParam("-o"), mask)
        self.threshold = float(th)
        if self.verbose:
            print(f"Threshold {th:.5f}: {int(mask.sum())} voxels")


class ProgTransformMask(XmippMetadataProgram):
    name = "xmipp_transform_mask"

    def defineProcessParams(self):
        self.addUsageLine("Apply a mask to images/volumes (reference ProgMask).")
        self.addParamsLine(" --mask <mask_type>  : Mask to apply")
        self.addParamsLine("    where <mask_type>")
        self.addParamsLine("       circular <R>  : Circle/sphere of radius R (R<0: dim/2+R)")
        self.addParamsLine("       crown <R1> <R2> : Ring between radii")
        self.addParamsLine("       gaussian <sigma> : Gaussian mask")
        self.addParamsLine("       rectangular <x> <y> <z=-1> : Box half-sizes")
        self.addParamsLine("       binary_file <file> : Mask image from file")
        self.addParamsLine("[--substitute <v=0>] : Value outside the mask (number or min|max|avg)")
        self.addParamsLine("[--create_mask <out=\"\">] : Only write the mask image")
        self.addParamsLine("[--count_above <th=0>] : Count pixels within mask >= th")
        self.addParamsLine("[--count_below <th=0>] : Count pixels within mask <= th")

    def readProcessParams(self):
        self.mask_spec = self.getListParam("--mask")
        self.sub_str = self.getParam("--substitute") if \
            self.checkParam("--substitute") else "0"
        self.fn_create = self.getParam("--create_mask") if \
            self.checkParam("--create_mask") else ""
        self.count_above = self.getDoubleParam("--count_above") if \
            self.checkParam("--count_above") else None
        self.count_below = self.getDoubleParam("--count_below") if \
            self.checkParam("--count_below") else None

    def _sub_val(self, img):
        if self.sub_str == "min":
            return float(img.min())
        if self.sub_str == "max":
            return float(img.max())
        if self.sub_str == "avg":
            return float(img.mean())
        return float(self.sub_str)

    def _mask_for(self, shape):
        from xmipp3_tpu.ops.mask import (circular_mask, crown_mask,
                                         gaussian_mask, rectangular_mask)
        t = self.mask_spec[0]
        a = self.mask_spec[1:]
        if t == "circular":
            return circular_mask(shape, abs(float(a[0])) if float(a[0]) > 0
                                 else float(a[0]))
        if t == "crown":
            return crown_mask(shape, float(a[0]), float(a[1]))
        if t == "gaussian":
            return gaussian_mask(shape, float(a[0]))
        if t == "rectangular":
            dims = [abs(int(float(v))) for v in a]
            return rectangular_mask(shape, dims[0], dims[1],
                                    dims[2] if len(dims) > 2 and
                                    len(shape) > 2 else None)
        if t == "binary_file":
            return np.squeeze(Image(a[0]).data).astype(np.float32)
        raise ValueError(t)

    def run(self):
        if self.fn_create:
            # mask-only mode: need dims from input
            img = Image()
            img.read(self.fn_in, header_only=True)
            n, z, y, x = img.header.shape
            shape = (z, y, x) if z > 1 else (y, x)
            save_image(self.fn_create, self._mask_for(shape))
            return
        super().run()

    def processBatch(self, imgs, rows):
        m = self._mask_for(imgs.shape[1:])
        if self.count_above is not None or self.count_below is not None:
            # reference ProgMask count mode (mask.cpp:1900-1936): report
            # per-image counts of in-mask values crossing the thresholds
            mb = m > 0.5
            elem = "voxels" if imgs.ndim == 4 else "pixels"
            for img, row in zip(imgs, rows):
                name = row.get("image", "")
                if self.count_above is not None and self.count_below is None:
                    n = int(np.count_nonzero(mb & (img >= self.count_above)))
                    print(f"{name} number of {elem} above "
                          f"{self.count_above} = {n}")
                elif self.count_below is not None and \
                        self.count_above is None:
                    n = int(np.count_nonzero(mb & (img <= self.count_below)))
                    print(f"{name} number of {elem} below "
                          f"{self.count_below} = {n}")
                else:
                    n = int(np.count_nonzero(
                        mb & (img >= self.count_above)
                        & (img <= self.count_below)))
                    print(f"{name} number of {elem} above "
                          f"{self.count_above} and below "
                          f"{self.count_below} = {n}")
                row["count"] = n
            return imgs
        if self.sub_str in ("min", "max", "avg"):
            return np.stack([img * m + self._sub_val(img) * (1.0 - m)
                             for img in imgs])
        return imgs * m[None] + float(self.sub_str) * (1.0 - m[None])


class ProgTransformSymmetrize(XmippMetadataProgram):
    name = "xmipp_transform_symmetrize"

    def defineProcessParams(self):
        self.addUsageLine("Symmetrize a volume (average over the symmetry "
                          "group; reference symmetrize.h:39).")
        self.addParamsLine(" [--sym <s=c1>] : Symmetry group")

    def readProcessParams(self):
        self.sym = self.getParam("--sym")

    def processBatch(self, imgs, rows):
        from xmipp3_tpu.core.sym import SymList
        from xmipp3_tpu.ops.geo import apply_affine_3d
        out = np.empty_like(imgs)
        mats = SymList(self.sym).sym_matrices()
        for i in range(len(imgs)):
            v = imgs[i]
            if v.ndim == 2:
                # 2D: rotational symmetrization about center
                from xmipp3_tpu.ops.geo import rotate_2d
                import re
                m = re.fullmatch(r"c(\d+)", self.sym.lower())
                n = int(m.group(1)) if m else 1
                acc = np.zeros_like(v)
                for k in range(n):
                    acc += np.asarray(rotate_2d(v[None], 360.0 * k / n))[0]
                out[i] = acc / max(n, 1)
            else:
                rotated = np.asarray(apply_affine_3d(v, mats))
                out[i] = rotated.mean(axis=0)
        return out


class ProgVolumeToPseudoatoms(XmippProgram):
    name = "xmipp_volume_to_pseudoatoms"

    def defineParams(self):
        self.addUsageLine("Approximate a volume with gaussian pseudoatoms "
                          "(greedy placement + local refinement).")
        self.addParamsLine("   -i <volume>  : Input volume")
        self.addParamsLine("   -o <root>    : Output rootname (.pdb)")
        self.addParamsLine("  [--nAtoms <n=200>] : Number of pseudoatoms")
        self.addParamsLine("  [--sigma <s=1.5>]  : Gaussian sigma (voxels)")
        self.addParamsLine("  [--sampling <Ts=1>] : Pixel size")

    def run(self):
        from xmipp3_tpu.core.pdb import AtomicModel, write_pdb
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float64)
        n_atoms = self.getIntParam("--nAtoms")
        sigma = self.getDoubleParam("--sigma")
        Ts = self.getDoubleParam("--sampling")
        D = vol.shape[0]
        resid = np.maximum(vol, 0).copy()
        r = max(int(3 * sigma), 1)
        offs = np.arange(-r, r + 1)
        dz, dy, dx = np.meshgrid(offs, offs, offs, indexing="ij")
        kern = np.exp(-(dz ** 2 + dy ** 2 + dx ** 2) / (2 * sigma ** 2))
        coords, weights = [], []
        for _ in range(n_atoms):
            idx = np.argmax(resid)
            z, rem = divmod(int(idx), vol.shape[1] * vol.shape[2])
            y, x = divmod(rem, vol.shape[2])
            amp = resid[z, y, x]
            if amp <= 0:
                break
            z0, z1 = max(z - r, 0), min(z + r + 1, vol.shape[0])
            y0, y1 = max(y - r, 0), min(y + r + 1, vol.shape[1])
            x0, x1 = max(x - r, 0), min(x + r + 1, vol.shape[2])
            k = kern[r - (z - z0): r + (z1 - z), r - (y - y0): r + (y1 - y),
                     r - (x - x0): r + (x1 - x)]
            resid[z0:z1, y0:y1, x0:x1] -= amp * k
            np.maximum(resid, 0, out=resid)
            coords.append(((x - D // 2) * Ts, (y - D // 2) * Ts,
                           (z - D // 2) * Ts))
            weights.append(amp)
        model = AtomicModel(np.array(coords), ["C"] * len(coords),
                            np.array(weights, np.float32),
                            np.ones(len(coords), np.float32))
        write_pdb(self.getParam("-o") + ".pdb", model)
        self.n_placed = len(coords)
        if self.verbose:
            print(f"Placed {len(coords)} pseudoatoms")


PROGRAM = None
