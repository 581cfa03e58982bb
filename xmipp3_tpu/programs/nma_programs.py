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
    name = "xmipp_nma_alignment_vol"

    def defineParams(self):
        self.addUsageLine("Fit NMA mode amplitudes deforming a reference "
                          "volume onto an input volume.")
        self.addParamsLine("   -i <volume>   : Volume to explain")
        self.addParamsLine("   --pdb <pdb>   : Reference atomic/pseudoatom model")
        self.addParamsLine("   --modes <md>  : Metadata listing mode files")
        self.addParamsLine("  [--vol <ref=\"\">] : Reference volume (default: rasterized pdb)")
        self.addParamsLine("  [-o <md=nma_vol.xmd>] : Output amplitudes")
        self.addParamsLine("  [--sampling_rate <Ts=1>] : Pixel size")
        self.addParamsLine("  [--steps <n=60>] : Optimization steps")

    def run(self):
        from xmipp3_tpu.core.pdb import rasterize
        from xmipp3_tpu.models.nma import fit_mode_amplitudes, read_mode
        vol_t = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        model = read_pdb(self.getParam("--pdb")).centered()
        md_modes = MetaData(self.getParam("--modes"))
        modes = np.stack([read_mode(str(r["nmaModefile"]))
                          for r in md_modes.iterRows()])
        Ts = self.getDoubleParam("--sampling_rate")
        if self.checkParam("--vol") and self.getParam("--vol"):
            vol_r = np.squeeze(Image(self.getParam("--vol")).data
                               ).astype(np.float32)
        else:
            vol_r = rasterize(model, vol_t.shape[0], Ts, sigma_a=2.0)
        amp, ncc = fit_mode_amplitudes(vol_r, vol_t, model.coords, modes,
                                       Ts, n_steps=self.getIntParam("--steps"),
                                       verbose=self.verbose)
        MetaData.fromRows([{
            "image": self.getParam("-i"),
            "nmaDisplacements": amp.astype(np.float64),
            "cost": float(ncc)}]).write(self.getParam("-o"))
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
        self.addParamsLine("   --modes <md>  : Metadata listing mode files")
        self.addParamsLine("   --deformations <...> : One amplitude per mode")

    def run(self):
        from xmipp3_tpu.models.nma import read_mode
        model = read_pdb(self.getParam("--pdb"))
        md_modes = MetaData(self.getParam("--modes"))
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
