"""Phantom programs: create, project, simulate_microscope.

Contracts: reference phantom_create, project (project.h:45) and
phantom_simulate_microscope (SURVEY.md Appendix A phantom_*).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram
from xmipp3_tpu.ops.phantom import Phantom


class ProgPhantomCreate(XmippProgram):
    name = "xmipp_phantom_create"

    def defineParams(self):
        self.addUsageLine("Create a voxel volume from a mathematical phantom "
                          "description file.")
        self.addParamsLine("   -i <description_file> : Phantom description (.descr)")
        self.addParamsLine("   -o <output_volume>    : Output volume")

    def run(self):
        ph = Phantom.read(self.getParam("-i"))
        save_image(self.getParam("-o"), ph.voxelize())


class ProgPhantomProject(XmippProgram):
    name = "xmipp_phantom_project"

    def defineParams(self):
        self.addUsageLine("Generate projections from a volume or phantom "
                          "description.")
        self.addParamsLine("   -i <volume_or_descr>  : Input volume (or .descr phantom)")
        self.addParamsLine("   -o <output>           : Output projection (single) or stack rootname")
        self.addParamsLine("  [--angles <rot=0> <tilt=0> <psi=0>] : Single projection angles")
        self.addParamsLine("  [--params <file>]      : Projection parameter file (metadata with angles)")
        self.addParamsLine("  [--nangles <n=0>]      : Generate n random projections")
        self.addParamsLine("  [--seed <s=0>]         : Random seed")
        self.addParamsLine("  [--method <m=fourier>] : fourier | real_space")

    def run(self):
        fn_in = self.getParam("-i")
        fn_out = self.getParam("-o")
        if fn_in.endswith(".descr"):
            vol = Phantom.read(fn_in).voxelize()
        else:
            vol = np.squeeze(Image(fn_in).data).astype(np.float32)
        from xmipp3_tpu.ops.project import FourierProjector, project_real_space
        method = self.getParam("--method")

        if self.checkParam("--params"):
            md = MetaData(self.getParam("--params"))
            rot = md.getColumn("angleRot").astype(np.float32)
            tilt = md.getColumn("angleTilt").astype(np.float32)
            psi = md.getColumn("anglePsi", 0.0).astype(np.float32) if \
                md.containsLabel("anglePsi") else np.zeros(len(md), np.float32)
        elif self.checkParam("--nangles") and self.getIntParam("--nangles") > 0:
            n = self.getIntParam("--nangles")
            rng = np.random.default_rng(self.getIntParam("--seed"))
            rot = rng.uniform(-180, 180, n).astype(np.float32)
            tilt = np.degrees(np.arccos(rng.uniform(-1, 1, n))).astype(np.float32)
            psi = rng.uniform(-180, 180, n).astype(np.float32)
        else:
            rot = np.float32([self.getDoubleParam("--angles", 0)])
            tilt = np.float32([self.getDoubleParam("--angles", 1)])
            psi = np.float32([self.getDoubleParam("--angles", 2)])

        if method == "real_space":
            imgs = np.asarray(project_real_space(vol, rot, tilt, psi))
        else:
            proj = FourierProjector(vol)
            imgs = []
            for s in range(0, len(rot), 256):
                imgs.append(np.asarray(proj.project_euler(
                    rot[s:s + 256], tilt[s:s + 256], psi[s:s + 256])))
            imgs = np.concatenate(imgs)

        if len(imgs) == 1 and not self.checkParam("--params") and \
                not self.checkParam("--nangles"):
            save_image(fn_out, imgs[0])
        else:
            root = fn_out[:-4] if fn_out.endswith((".stk", ".xmd")) else fn_out
            fn_stk = root + ".stk"
            save_image(fn_stk, imgs)
            MetaData.fromRows([
                {"image": f"{i + 1:06d}@{fn_stk}", "angleRot": float(rot[i]),
                 "angleTilt": float(tilt[i]), "anglePsi": float(psi[i]),
                 "itemId": i + 1} for i in range(len(imgs))
            ]).write(root + ".xmd")


class ProgPhantomSimulateMicroscope(XmippProgram):
    name = "xmipp_phantom_simulate_microscope"

    def defineParams(self):
        self.addUsageLine("Simulate the microscope: apply CTF and noise to "
                          "ideal projections.")
        self.addParamsLine("   -i <stack_or_md>  : Input projections")
        self.addParamsLine("   -o <stack>        : Output images")
        self.addParamsLine("  [--ctf <ctfparam=\"\">] : CTF description file")
        self.addParamsLine("  [--noise <stddev=0>]  : Gaussian noise sigma (after CTF)")
        self.addParamsLine("  [--noise_before <stddev=0>] : Noise before CTF")
        self.addParamsLine("  [--seed <s=0>]    : Random seed")

    def run(self):
        from xmipp3_tpu.core.metadata_program import is_metadata_file
        from xmipp3_tpu.ops.ctf import CTFDescription, apply_ctf
        fn_in = self.getParam("-i")
        if is_metadata_file(fn_in):
            md = MetaData(fn_in)
            imgs = np.stack([np.squeeze(Image(r["image"]).data)
                             for r in md.iterRows()]).astype(np.float32)
        else:
            imgs = Image.read_stack(fn_in)
        rng = np.random.default_rng(self.getIntParam("--seed"))
        s_before = self.getDoubleParam("--noise_before")
        if s_before > 0:
            imgs = imgs + rng.normal(0, s_before, imgs.shape).astype(np.float32)
        if self.checkParam("--ctf") and self.getParam("--ctf"):
            ctf = CTFDescription.from_metadata(self.getParam("--ctf"))
            imgs = np.asarray(apply_ctf(imgs, ctf))
        s_after = self.getDoubleParam("--noise")
        if s_after > 0:
            imgs = imgs + rng.normal(0, s_after, imgs.shape).astype(np.float32)
        save_image(self.getParam("-o"), imgs)


PROGRAM = None
