"""xmipp_align_significant — multireference alignment with significance
weighting.

Contract: reference AProgAlignSignificant (reconstruction/
aalign_significant.{h,cpp}:46-77, computeWeightsAndSave :283-311; GPU impl
align_significant_gpu). The engine aligns every experimental image against
every reference, then converts the correlation population into
per-(reference, image) significance weights: for each reference r, the
merits of ALL images against r's angular neighborhood (references within
--angDistance) are pooled and sorted; weight = merit * (1/max_merit) * cdf,
where cdf is the merit's rank in the pooled population — an image scores
high for r only if its correlation is high relative to everything that
competes for r's neighborhood.

TPU design: one batched scan produces the full (image, reference)
best-over-(psi, shift) correlation matrix (ops.match.match_score_matrix);
weighting is a vectorized host pass over that matrix; the selected poses
are refined by the shared batched winner-refinement tail.
"""
from __future__ import annotations

import os

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram


def significance_weights(cc: np.ndarray, ref_dirs: np.ndarray,
                         ang_distance: float) -> np.ndarray:
    """Per-(image, reference) significance weights (reference
    computeWeightsAndSave, aalign_significant.cpp:283-311)."""
    B, R = cc.shape
    W = np.zeros((B, R), np.float32)
    cosd = np.clip(ref_dirs @ ref_dirs.T, -1.0, 1.0)
    ang = np.degrees(np.arccos(cosd))
    for r in range(R):
        nb = (ang[r] <= ang_distance)
        nb[r] = True
        nb_idx = np.flatnonzero(nb)
        merits = cc[:, nb_idx].ravel()
        n = merits.size
        if n < 2:
            W[:, r] = np.maximum(cc[:, r], 0.0)
            continue
        order = np.argsort(merits, kind="stable")
        max_merit = merits[order[-1]]
        inv_max = 1.0 / max_merit if max_merit > 0 else 0.0
        cdf = np.empty(n, np.float64)
        cdf[order] = np.arange(n, dtype=np.float64) / (n - 1)
        pos_r = int(np.flatnonzero(nb_idx == r)[0])
        cdf_r = cdf.reshape(B, nb_idx.size)[:, pos_r]
        m_r = cc[:, r]
        W[:, r] = np.where(m_r > 0, m_r * inv_max * cdf_r, 0.0)
    return W


class ProgAlignSignificant(XmippProgram):
    name = "xmipp_align_significant"

    def defineParams(self):
        self.addUsageLine("Find alignment of experimental images against a "
                          "set of references, with significance weighting.")
        self.addParamsLine("   -i <md_file>  : Metadata with experimental images")
        self.addParamsLine("   -r <md_file>  : Metadata with reference images (angleRot/angleTilt)")
        self.addParamsLine("   -o <md_file>  : Output metadata")
        self.addParamsLine("  [--angDistance <a=10>] : Angular distance defining each reference's neighborhood")
        self.addParamsLine("  [--keepBestN <N=1>]    : Store the N best alignments per image")
        self.addParamsLine("  [--useWeightInsteadOfCC] : Select the best reference by weight, not CC")
        self.addParamsLine("  [--oUpdatedRefs <baseName=\"\">] : Update references from the assignments and store here")
        self.addParamsLine("  [--max_shift <s=-1>]  : Maximum shift (pixels; -1 = dim/8)")
        self.addParamsLine("  [--batch <b=512>]     : Particles per device batch")
        self.addParamsLine("  [--mesh <mode=none>]  : Shard scoring over the device mesh (dp)")

    def readParams(self):
        self.fn_in = self.getParam("-i")
        self.fn_ref = self.getParam("-r")
        self.fn_out = self.getParam("-o")
        self.ang_distance = self.getDoubleParam("--angDistance")
        self.keep_n = self.getIntParam("--keepBestN")
        self.use_weight = self.checkParam("--useWeightInsteadOfCC")
        self.fn_updated = self.getParam("--oUpdatedRefs") \
            if self.checkParam("--oUpdatedRefs") else ""
        self.max_shift = self.getIntParam("--max_shift")
        self.batch = self.getIntParam("--batch")
        self.mesh_mode = self.getParam("--mesh") \
            if self.checkParam("--mesh") else "none"

    def run(self):
        import jax
        import jax.numpy as jnp
        from xmipp3_tpu.core.geometry import euler_matrix
        from xmipp3_tpu.ops.match import (match_score_matrix, refine_winners)

        md_ref = MetaData(self.fn_ref)
        ref_rows = list(md_ref.iterRows())
        refs = np.stack([np.squeeze(Image(r["image"]).data)
                         for r in ref_rows]).astype(np.float32)
        rot = np.array([float(r.get("angleRot", 0)) for r in ref_rows],
                       np.float32)
        tilt = np.array([float(r.get("angleTilt", 0)) for r in ref_rows],
                        np.float32)
        A = np.asarray(euler_matrix(rot, tilt, np.zeros_like(rot)))
        dirs = A[:, 2, :].astype(np.float64)     # projection direction = A[2]

        md_in = MetaData(self.fn_in)
        md_in.removeDisabled()
        rows = list(md_in.iterRows())
        H = refs.shape[-1]
        max_shift = self.max_shift if self.max_shift > 0 else max(H // 8, 2)
        R = len(refs)
        B = len(rows)

        cc = np.zeros((B, R), np.float32)
        psi_m = np.zeros((B, R), np.float32)
        trial_m = np.zeros((B, R), np.int32)
        flip_m = np.zeros((B, R), bool)
        imgs_all = np.stack([np.squeeze(Image(r["image"]).data)
                             for r in rows]).astype(np.float32)
        trials = None

        from xmipp3_tpu.parallel.cli import (maybe_init_distributed,
                                             resolve_mesh)
        maybe_init_distributed(self)
        mesh, mesh_mode = resolve_mesh(self.mesh_mode)
        if mesh is not None:
            if self.verbose:
                print(f"mesh: {mesh_mode} over "
                      f"{len(mesh.devices.ravel())} devices")
            from xmipp3_tpu.parallel.match import parallel_match_score_matrix
            out = parallel_match_score_matrix(mesh, refs, imgs_all,
                                              max_shift=max_shift)
            cc[:] = out["peak"]
            psi_m[:] = out["psi"]
            trial_m[:] = out["trial"]
            flip_m[:] = out["flip"]
            trials = out["trials"]
        else:
            for s in range(0, B, self.batch):
                e = min(s + self.batch, B)
                out = match_score_matrix(refs, imgs_all[s:e],
                                         max_shift=max_shift)
                cc[s:e] = np.asarray(out["peak"])
                psi_m[s:e] = np.asarray(out["psi"])
                trial_m[s:e] = np.asarray(out["trial"])
                flip_m[s:e] = np.asarray(out["flip"])
                trials = out["trials"]
                if self.verbose:
                    print(f"  scored {e}/{B}")

        W = significance_weights(cc, dirs, self.ang_distance)
        crit = W if self.use_weight else cc
        order = np.argsort(-crit, axis=1)[:, : self.keep_n]   # (B, N)

        out_rows = []
        acc = np.zeros_like(refs)
        acc_w = np.zeros(R, np.float64)
        bi = np.arange(B)
        for n in range(self.keep_n):
            rk = order[:, n]
            res = refine_winners(
                jnp.asarray(refs), jnp.asarray(imgs_all),
                jnp.asarray(rk), jnp.asarray(psi_m[bi, rk]),
                jnp.asarray(trials[trial_m[bi, rk]]),
                jnp.asarray(flip_m[bi, rk]), max_shift, 2, H // 2 - 2)
            res = {k: np.asarray(v) for k, v in res.items()}
            for i, r in enumerate(rows):
                k = int(rk[i])
                d = dict(r)
                d.update({
                    "angleRot": float(rot[k]), "angleTilt": float(tilt[k]),
                    "anglePsi": float(res["psi"][i]),
                    "shiftX": float(res["sx"][i]),
                    "shiftY": float(res["sy"][i]),
                    "ref": k + 1, "flip": int(res["flip"][i]),
                    "maxCC": float(cc[i, k]),
                    "weight": float(W[i, k]),
                    "weightSignificant": float(W[i, k]),
                })
                out_rows.append(d)
            if n == 0 and self.fn_updated:
                aligned = res["aligned"]
                for i in range(B):
                    k = int(rk[i])
                    w = float(W[i, k])
                    acc[k] += w * aligned[i]
                    acc_w[k] += w
        md_out = MetaData.fromRows(out_rows)
        md_out.write(self.fn_out)

        if self.fn_updated:
            upd = refs.copy()
            for k in range(R):
                if acc_w[k] > 1e-8:
                    upd[k] = acc[k] / acc_w[k]
            stk = self.fn_updated + ".stk"
            save_image(stk, upd)
            ref_out = []
            for k, r in enumerate(ref_rows):
                d = dict(r)
                d["image"] = f"{k + 1:06d}@{stk}"
                d["weight"] = float(acc_w[k])
                ref_out.append(d)
            MetaData.fromRows(ref_out).write(self.fn_updated + ".xmd")
        if self.verbose:
            print(f"aligned {B} images against {R} references "
                  f"(keepBestN={self.keep_n})")


PROGRAM = ProgAlignSignificant
