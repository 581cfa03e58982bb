"""NMA programs: nma_alignment_vol, pdb_nma_deform, and ENM mode generation.

Contracts: reference nma_alignment_vol (volume-vs-reference mode amplitude
fitting; CONDOR optimizer replaced by batched Adam, SURVEY.md §2.6),
pdb_nma_deform (deform a PDB along modes).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.pdb import read_pdb, write_pdb, AtomicModel
from xmipp3_tpu.core.program import XmippProgram


class ProgNMAModes(XmippProgram):
    """Generate elastic-network normal modes from a PDB/pseudoatom model
    (role of the reference's external mode computation step)."""
    name = "xmipp_nma_modes"

    def defineParams(self):
        self.addUsageLine("Compute elastic-network (Tirion) normal modes of "
                          "an atomic/pseudoatomic model.")
        self.addParamsLine("   -i <pdb>      : Input model")
        self.addParamsLine("   --oroot <root> : Output rootname (mode files + metadata)")
        self.addParamsLine("  [--nmodes <n=6>] : Number of nonrigid modes")
        self.addParamsLine("  [--cutoff <c=-1>] : Interaction cutoff (Å; -1 auto)")

    def run(self):
        from xmipp3_tpu.models.nma import elastic_network_modes, write_modes
        model = read_pdb(self.getParam("-i"))
        cutoff = self.getDoubleParam("--cutoff")
        modes, evals = elastic_network_modes(
            model.coords, self.getIntParam("--nmodes"),
            None if cutoff <= 0 else cutoff)
        root = self.getParam("--oroot")
        files = write_modes(root, modes)
        MetaData.fromRows([
            {"nmaModefile": f, "nmaEnergy": float(evals[i], ),
             "itemId": i + 1} for i, f in enumerate(files)]
        ).write(root + "_modes.xmd")
        self.modes = modes


class ProgNMAAlignmentVol(XmippProgram):
    """Full reference surface nma_alignment_vol.cpp:54-73: deformed-volume
    NMA fitting with optional FRM rigid alignment, 3-D mask, missing-wedge
    compensation and low-pass matching metric. The CONDOR trust-region
    optimizer maps to Adam on the differentiable warp->NCC chain
    (rhoStart scales the step, niter bounds the steps)."""
    name = "xmipp_nma_alignment_vol"

    def defineParams(self):
        self.addUsageLine("Fit NMA mode amplitudes deforming a reference "
                          "volume onto an input volume.")
        self.addParamsLine("   -i <volume>   : Volume (or metadata of "
                           "volumes) to explain")
        self.addParamsLine("   --pdb <pdb>   : Reference atomic/pseudoatom "
                           "model")
        self.addParamsLine("   --modes <md>  : Metadata listing mode files")
        self.addParamsLine("  [--vol <ref=\"\">] : Reference volume "
                           "(default: rasterized pdb)")
        self.addParamsLine("  [-o <md=nma_vol.xmd>] : Output amplitudes")
        self.addParamsLine("  [--odir <outputDir=\".\">] : Output directory")
        self.addParamsLine("  [--resume] : Resume processing (skip if the "
                           "output exists)")
        self.addParamsLine("  [--opdb <PDB_filename=\"\">] : Write the "
                           "deformed input PDB here")
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size")
        self.addParamsLine("  [--filterVol <cutoff=15.>] : Low-pass the "
                           "deformed volume at this cutoff (A) before "
                           "comparing")
        self.addParamsLine("  [--centerPDB] : Center the PDB structure")
        self.addParamsLine("  [--fixed_Gaussian <std=-1>] : Pseudo-atom "
                           "fixed Gaussian std (A; -1 = from the PDB)")
        self.addParamsLine("  [--trustradius_scale <s=1>] : Scales the "
                           "optimizer's initial step size")
        self.addParamsLine("  [--alignVolumes <frm_freq=0.25> "
                           "<frm_shift=10>] : FRM-align the deformed "
                           "volume to the input before comparing")
        self.addParamsLine("  [--mask <m=\"\">] : 3D mask for the "
                           "comparison")
        self.addParamsLine("  [--tilt_values <tilt0=-90> <tiltF=90>] : "
                           "Missing-wedge compensation (Fourier wedge "
                           "between these tilts)")
        self.addParamsLine("  [--condor_params <rhoStartBase=250.> "
                           "<rhoEndBase=50.> <niter=10000>] : Optimizer "
                           "parameters (rhoStart scales the step, niter "
                           "bounds the iterations)")
        self.addParamsLine("  [--steps <n=60>] : Optimization steps")

    def run(self):
        import os

        import jax
        import jax.numpy as jnp

        from xmipp3_tpu.core.pdb import AtomicModel, rasterize, write_pdb
        from xmipp3_tpu.models.nma import (displacement_field, read_mode,
                                           warp_volume_field)
        from xmipp3_tpu.ops.optim import adam_scan

        odir = self.getParam("--odir") if self.checkParam("--odir") else "."
        fn_out = self.getParam("-o")
        if not os.path.isabs(fn_out) and odir not in ("", "."):
            os.makedirs(odir, exist_ok=True)
            fn_out = os.path.join(odir, fn_out)
        if self.checkParam("--resume") and os.path.exists(fn_out):
            return
        vol_t = np.squeeze(Image(self.getParam("-i")).data
                           ).astype(np.float32)
        model = read_pdb(self.getParam("--pdb"))
        if self.checkParam("--centerPDB"):
            model = model.centered()
        md_modes = MetaData(self.getParam("--modes"))
        modes = np.stack([read_mode(str(r["nmaModefile"]))
                          for r in md_modes.iterRows()])
        Ts = self.getDoubleParam("--sampling_rate")
        N = vol_t.shape[0]
        fixed_std = self.getDoubleParam("--fixed_Gaussian")
        if self.checkParam("--vol") and self.getParam("--vol"):
            vol_r = np.squeeze(Image(self.getParam("--vol")).data
                               ).astype(np.float32)
        else:
            vol_r = rasterize(model, N, Ts,
                              sigma_a=fixed_std if fixed_std > 0 else 2.0)

        M = len(modes)
        unit_fields = np.stack([
            displacement_field(model.coords, modes[m:m + 1], [1.0], N, Ts)
            for m in range(M)])
        uf = jnp.asarray(unit_fields)
        vr = jnp.asarray(vol_r, jnp.float32)

        # matching weights: low-pass (--filterVol) and missing wedge
        # (--tilt_values) act in Fourier; --mask in real space
        fz = np.fft.fftfreq(N)[:, None, None]
        fy = np.fft.fftfreq(N)[None, :, None]
        fx = np.fft.rfftfreq(N)[None, None, :]
        w = np.ones((N, N, N // 2 + 1), np.float32)
        if self.checkParam("--filterVol"):
            fc = Ts / max(self.getDoubleParam("--filterVol"), 2 * Ts)
            w *= (np.sqrt(fz ** 2 + fy ** 2 + fx ** 2) <= fc)
        if self.checkParam("--tilt_values"):
            toks = self.getListParam("--tilt_values")
            t0, tf = float(toks[0]), float(toks[1])
            # wedge about the y (tilt) axis: data where the (x,z) polar
            # angle lies within the acquired tilt range
            ang = np.degrees(np.arctan2(fz, fx + 0 * fy))
            inside = ((ang >= t0) & (ang <= tf)) | \
                     ((ang - 180 >= t0) & (ang - 180 <= tf)) | \
                     ((ang + 180 >= t0) & (ang + 180 <= tf))
            w *= inside | ((fz == 0) & (fx == 0) + np.zeros_like(ang,
                                                                 bool))
        spec_w = jnp.asarray(w) if (self.checkParam("--filterVol") or
                                    self.checkParam("--tilt_values")) \
            else None
        mask3 = None
        if self.checkParam("--mask") and self.getParam("--mask"):
            mask3 = jnp.asarray((np.squeeze(
                Image(self.getParam("--mask")).data) > 0
            ).astype(np.float32))

        align_R = [np.eye(3, dtype=np.float32)]
        do_align = self.checkParam("--alignVolumes")

        def prepare(v):
            if spec_w is not None:
                v = jnp.fft.irfftn(jnp.fft.rfftn(v) * spec_w, v.shape)
            if mask3 is not None:
                v = v * mask3
            return v

        vt_j = prepare(jnp.asarray(vol_t, jnp.float32))

        def loss(amp, R):
            field = jnp.einsum("m,mczyx->czyx", amp, uf)
            warped = warp_volume_field(vr, field)
            if do_align:
                from xmipp3_tpu.ops.geo import apply_affine_3d
                warped = apply_affine_3d(warped, R[None])[0]
            warped = prepare(warped)
            am = warped - warped.mean()
            bm = vt_j - vt_j.mean()
            return -(am * bm).sum() / jnp.maximum(
                jnp.sqrt((am ** 2).sum() * (bm ** 2).sum()), 1e-12)

        tr = self.getDoubleParam("--trustradius_scale")
        lr = 0.5 * tr
        n_steps = self.getIntParam("--steps")
        if self.checkParam("--condor_params"):
            toks = self.getListParam("--condor_params")
            lr *= float(toks[0]) / 250.0
            n_steps = min(n_steps, int(float(toks[2])))
        amp = jnp.zeros(M, jnp.float32)
        rounds = 3 if do_align else 1
        for _ in range(rounds):
            if do_align:
                from xmipp3_tpu.models.nma import warp_volume_field as wvf
                from xmipp3_tpu.ops.frm import frm_align_volumes
                field = jnp.einsum("m,mczyx->czyx", amp, uf)
                warped = np.asarray(wvf(vr, field))
                R, _ang, _c = frm_align_volumes(vol_t, warped, L=12,
                                                refine=False)
                align_R[0] = np.asarray(R, np.float32)
            Rj = jnp.asarray(align_R[0])
            amp, last = adam_scan(lambda a: loss(a, Rj), amp,
                                  max(n_steps // rounds, 1), lr)
        ncc = -float(loss(amp, jnp.asarray(align_R[0])))
        amp = np.asarray(amp)
        row = {"image": self.getParam("-i"),
               "nmaDisplacements": amp.astype(np.float64),
               "cost": float(ncc), "maxCC": float(ncc)}
        MetaData.fromRows([row]).write(fn_out)
        if self.checkParam("--opdb") and self.getParam("--opdb"):
            disp = np.einsum("m,mnk->nk", amp.astype(np.float64),
                             modes.astype(np.float64))
            write_pdb(self.getParam("--opdb"),
                      AtomicModel(model.coords + disp, model.elements,
                                  model.bfactors, model.occupancies))
        self.amplitudes = amp
        self.ncc = ncc
        if self.verbose:
            print(f"amplitudes: {np.round(amp, 3)}  NCC={ncc:.4f}")


class ProgPDBNMADeform(XmippProgram):
    name = "xmipp_pdb_nma_deform"

    def defineParams(self):
        self.addUsageLine("Deform a PDB along normal modes with given "
                          "amplitudes.")
        self.addParamsLine("   --pdb <file>  : Input PDB")
        self.addParamsLine("   -o <file>     : Deformed PDB")
        self.addParamsLine("   --nma <md>  : Metadata listing mode files (label nmaModefile)")
        self.addParamsLine("   alias --modes;")
        self.addParamsLine("   --deformations <...> : One amplitude per mode")

    def run(self):
        from xmipp3_tpu.models.nma import read_mode
        model = read_pdb(self.getParam("--pdb"))
        md_modes = MetaData(self.getParam("--nma"))
        modes = np.stack([read_mode(str(r["nmaModefile"]))
                          for r in md_modes.iterRows()])
        amps = np.array([float(t) for t in
                         self.getListParam("--deformations")], np.float64)
        disp = np.einsum("m,mnk->nk", amps[: len(modes)],
                         modes[: len(amps)].astype(np.float64))
        out = AtomicModel(model.coords + disp, model.elements,
                          model.bfactors, model.occupancies)
        write_pdb(self.getParam("-o"), out)


PROGRAM = None
