"""xmipp_image_align — 2-D alignment of a stack to a reference (or
reference-free with iterative average refinement).

Contract: reference align2d / image_align CLI (reconstruction/align2d.h:36);
compute path is the batched TPU aligner (ops.align).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import XmippMetadataProgram
from xmipp3_tpu.ops.align import align_considering_mirrors, iterative_align


def _pspc_reference(imgs: np.ndarray, use_mirror: bool, max_shift: int,
                    verbose: int = 0) -> np.ndarray:
    """Pyramidal pairwise combination initial reference (align2d.cpp
    do_pspc/alignPairs): at each level align image 2k+1 onto image 2k,
    average the pair, translationally center, carry any odd remainder up,
    until one image is left.  TPU shape: every pair at a level is aligned
    in ONE vmapped dispatch (the reference loops alignImages per pair)."""
    import jax

    from xmipp3_tpu.ops import features as _feat
    level = np.asarray(imgs, np.float32)
    lev_no = 0
    while len(level) > 1:
        half = len(level) // 2
        refs = level[0:2 * half:2]
        movs = level[1:2 * half:2]
        if use_mirror:
            fn = lambda r, m: align_considering_mirrors(
                r, m[None], n_iters=3, max_shift=max_shift)[5][0]
        else:
            fn = lambda r, m: iterative_align(
                r, m[None], n_iters=3, max_shift=max_shift)[4][0]
        aligned = np.asarray(jax.vmap(fn)(refs, movs))
        merged = 0.5 * (refs + aligned)
        merged = np.asarray(_feat.center_translationally(merged))
        if len(level) % 2:
            merged = np.concatenate([merged, level[-1:]])
        if verbose:
            print(f"pspc level {lev_no}: {len(level)} -> {len(merged)}")
        level = merged
        lev_no += 1
    return level[0]


class ProgImageAlign(XmippMetadataProgram):
    name = "xmipp_image_align"
    batch_size = 1024

    def defineProcessParams(self):
        self.addUsageLine("Align a stack of images: to a reference image, or "
                          "reference-free (iterative average).")
        self.addParamsLine("[--ref <reference=\"\">]  : Reference image; if absent, reference-free")
        self.addParamsLine("[--iter <n=5>]        : Reference-free refinement iterations")
        self.addParamsLine("[--max_shift <s=-1>]  : Maximum shift (pixels; -1 = dim/4)")
        self.addParamsLine("[--dont_mirror]       : Do not check mirrored alignment")
        self.addParamsLine("   alias --do_not_check_mirrors;")
        self.addParamsLine("[--pspc]              : Build the first reference by pyramidal pairwise combination (align2d.cpp do_pspc) instead of the plain average")
        self.addParamsLine("[--oaligned <stk=\"\">] : Also write the aligned stack here")

    def readProcessParams(self):
        self.fn_ref = self.getParam("--ref") if self.checkParam("--ref") else ""
        self.n_ref_iters = self.getIntParam("--iter") if self.checkParam("--iter") else 5
        self.max_shift = self.getIntParam("--max_shift") if self.checkParam("--max_shift") else -1
        self.use_mirror = not self.checkParam("--dont_mirror")
        self.fn_aligned = self.getParam("--oaligned") if self.checkParam("--oaligned") else ""

    def run(self):
        self.setup_input()
        rows = list(self.mdIn.iterRows())
        imgs = self.load_batch(rows)
        B, H, W = imgs.shape
        max_shift = self.max_shift if self.max_shift > 0 else H // 4

        if self.fn_ref:
            ref = np.squeeze(Image(self.fn_ref).data).astype(np.float32)
        elif self.checkParam("--pspc"):
            ref = _pspc_reference(imgs, self.use_mirror, max_shift,
                                  self.verbose)
        else:
            # reference-free: start from the plain average, iterate
            ref = imgs.mean(axis=0)

        n_outer = 1 if self.fn_ref else self.n_ref_iters
        for it in range(n_outer):
            if self.use_mirror:
                psi, sx, sy, flip, corr, aligned = (
                    align_considering_mirrors(ref, imgs, n_iters=3,
                                              max_shift=max_shift))
            else:
                psi, sx, sy, corr, aligned = iterative_align(
                    ref, imgs, n_iters=3, max_shift=max_shift)
                flip = np.zeros(B, bool)
            if not self.fn_ref:
                ref = np.asarray(aligned).mean(axis=0)
            if self.verbose:
                print(f"iter {it + 1}: mean corr "
                      f"{float(np.asarray(corr).mean()):.4f}")

        # convert applied-alignment params to the stored metadata pose
        # convention (ops.geo.alignment_to_md_pose). NOTE: iterative_align /
        # align_considering_mirrors return aligned = M_x^f(T·R·img) with the
        # x-mirror applied to the INPUT (mirrored = others[:, :, ::-1] before
        # aligning), i.e. aligned = T(s)R(ψ)·M_x·img. M_x = F_y·R(180), so
        # this equals T(s)R(ψ+180)·F_y·img — shift ψ by 180 for the F_y form
        # the converter expects.
        psi, sx, sy, corr = (np.asarray(v) for v in (psi, sx, sy, corr))
        flip = np.asarray(flip)
        aligned = np.asarray(aligned)
        from xmipp3_tpu.ops.geo import alignment_to_md_pose
        psi_c = np.where(flip, psi + 180.0, psi)
        psi_md, sx_md, sy_md, _ = (np.asarray(v) for v in alignment_to_md_pose(
            psi_c.astype(np.float32), sx.astype(np.float32),
            sy.astype(np.float32), flip))

        for i, r in enumerate(rows):
            r["anglePsi"] = float(psi_md[i])
            r["shiftX"] = float(sx_md[i])
            r["shiftY"] = float(sy_md[i])
            r["flip"] = int(flip[i])
            r["maxCC"] = float(corr[i])
        self.mdOut = MetaData.fromRows(rows)
        if self.fn_out:
            if self.fn_out.endswith((".stk", ".mrcs", ".mrc", ".spi", ".xmp")):
                print(f"WARNING: -o {self.fn_out} is the output METADATA "
                      "(alignment parameters); use --oaligned for the "
                      "aligned image stack")
            self.mdOut.write(self.fn_out)
        if self.fn_aligned:
            save_image(self.fn_aligned, aligned)
            if not self.fn_ref:
                save_image(self.fn_aligned.replace(".", "_avg.", 1),
                           aligned.mean(axis=0))
        self.postProcess()


PROGRAM = ProgImageAlign
