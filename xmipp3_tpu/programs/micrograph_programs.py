"""Micrograph programs: scissor (particle extraction) and automatic picking.

Contracts: reference micrograph_scissor (data/micrograph.h:78 particle
scissoring) and micrograph_automatic_picking2 (PCA + correlation two-stage
picker, micrograph_automatic_picking2.h:61-97 — the SVM stage is replaced by
a correlation/threshold classifier; libsvm is not vendored here).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.program import XmippProgram


class ProgMicrographScissor(XmippProgram):
    name = "xmipp_micrograph_scissor"

    def defineParams(self):
        self.addUsageLine("Extract (cut out) particles from a micrograph at "
                          "given coordinates.")
        self.addParamsLine("   -i <micrograph>   : Input micrograph")
        self.addParamsLine("   --pos <coords_md> : Metadata with xcoor/ycoor")
        self.addParamsLine("   --oroot <root>    : Output rootname (.mrcs stack + .xmd)")
        self.addParamsLine("   --Xdim <size>     : Particle box size")
        self.addParamsLine("  [--invert]         : Invert contrast")
        self.addParamsLine("  [--downsampling <f=1>] : Coordinate downsampling factor")

    def run(self):
        mic = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        md = MetaData(self.getParam("--pos"))
        box = self.getIntParam("--Xdim")
        root = self.getParam("--oroot")
        factor = self.getDoubleParam("--downsampling")
        invert = self.checkParam("--invert")
        H, W = mic.shape
        half = box // 2
        parts = []
        rows = []
        k = 0
        for i in md:
            r = md.getRow(i)
            x = int(round(float(r["xcoor"]) * factor))
            y = int(round(float(r["ycoor"]) * factor))
            x0, y0 = x - half, y - half
            if x0 < 0 or y0 < 0 or x0 + box > W or y0 + box > H:
                continue
            p = mic[y0:y0 + box, x0:x0 + box].copy()
            if invert:
                p = -p
            parts.append(p)
            k += 1
            rows.append({"image": f"{k:06d}@{root}.mrcs",
                         "xcoor": x, "ycoor": y, "itemId": k, "enabled": 1})
        if not parts:
            from xmipp3_tpu.core.errors import ErrCode, XmippError
            raise XmippError(ErrCode.MD_NOACTIVE,
                             "no particle fits inside the micrograph")
        save_image(root + ".mrcs", np.stack(parts))
        MetaData.fromRows(rows).write(root + ".xmd")
        if self.verbose:
            print(f"Extracted {len(parts)} particles of {box}x{box}")


class ProgMicrographAutomaticPicking(XmippProgram):
    name = "xmipp_micrograph_automatic_picking"

    def defineParams(self):
        self.addUsageLine("Automatic particle picking by template correlation "
                          "(train with --ref particles or pick by blob "
                          "detection).")
        self.addParamsLine("   -i <micrograph>  : Input micrograph")
        self.addParamsLine("   -o <coords_md>   : Output coordinates")
        self.addParamsLine("   --particleSize <s> : Particle diameter (px)")
        self.addParamsLine("  [--ref <stack=\"\">] : Reference particles/templates")
        self.addParamsLine("  [--thr <t=3.0>]   : Peak threshold (sigma over background)")
        self.addParamsLine("  [--max_peaks <n=500>] : Maximum number of picks")
        self.addParamsLine("  [--svm <model=\"\">]  : SVM model for the second classification stage (candidates are kept only if the SVM accepts them)")
        self.addParamsLine("  [--trainSVM]      : Train the --svm model from --trainPos/--trainNeg and exit")
        self.addParamsLine("  [--kernel <k=rbf>] : SVM kernel for training: rbf (random-Fourier-feature C-SVC, the reference libsvm equivalent) or linear")
        self.addParamsLine("  [--fastBayes]     : Also train/use a Gaussian naive-Bayes fast-rejection stage before the SVM (reference two-stage classifier, micrograph_automatic_picking2.h:61-97)")
        self.addParamsLine("  [--trainPos <md=\"\">] : Positive training particles")
        self.addParamsLine("  [--trainNeg <md=\"\">] : Negative training particles")

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.ops.fourier_filter import (apply_fourier_mask_2d,
                                                   band_pass_mask)
        if self.checkParam("--trainSVM"):
            self._train_svm()
            return
        mic = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        size = self.getIntParam("--particleSize")
        thr = self.getDoubleParam("--thr")
        max_peaks = self.getIntParam("--max_peaks")
        H, W = mic.shape
        # band-pass to particle scale (DoG-style)
        f_lo = 1.0 / (2.0 * size)
        f_hi = 1.0 / (0.5 * size)
        filt = np.asarray(apply_fourier_mask_2d(
            mic - mic.mean(), band_pass_mask(H, W, f_lo, min(f_hi, 0.45))))
        if self.checkParam("--ref") and self.getParam("--ref"):
            refs = Image.read_stack(self.getParam("--ref"))
            # template matching: max over templates of normalized correlation
            score = np.full_like(filt, -np.inf)
            fm = jnp.fft.rfft2(jnp.asarray(filt))
            for t in refs:
                tt = np.zeros_like(filt)
                th, tw = t.shape
                tt[:th, :tw] = (t - t.mean()) / max(t.std(), 1e-8)
                corr = np.asarray(jnp.fft.irfft2(
                    fm * jnp.conj(jnp.fft.rfft2(jnp.asarray(tt))),
                    s=(H, W)))
                corr = np.roll(corr, (th // 2, tw // 2), axis=(0, 1))
                score = np.maximum(score, corr)
        else:
            score = -filt  # particles darker than background by convention
        mu, sd = score.mean(), score.std()
        peaks = []
        s = score.copy()
        half = size // 2
        for _ in range(max_peaks):
            idx = np.argmax(s)
            y, x = divmod(int(idx), W)
            if s[y, x] < mu + thr * sd:
                break
            if half <= x < W - half and half <= y < H - half:
                peaks.append((x, y, float(s[y, x])))
            # suppress neighborhood
            y0, y1 = max(y - half, 0), min(y + half, H)
            x0, x1 = max(x - half, 0), min(x + half, W)
            s[y0:y1, x0:x1] = -np.inf
        # SVM second stage: classify candidate boxes, keep accepted ones
        # (reference two-stage picker: correlation candidates -> SVM)
        if self.checkParam("--svm") and self.getParam("--svm") and peaks:
            import os
            from xmipp3_tpu.models.svm import (GaussianNB, LinearSVM,
                                               RBFSVM, particle_features)
            fn_model = self.getParam("--svm")
            fz = fn_model if fn_model.endswith(".npz") else fn_model + ".npz"
            z = np.load(fz, allow_pickle=True)
            svm = RBFSVM.load(fn_model) if "kind" in z.files and \
                str(z["kind"]) == "rbf" else LinearSVM.load(fn_model)
            nb = None
            if os.path.exists(fn_model + "_nb.npz"):
                nb = GaussianNB.load(fn_model + "_nb.npz")
            boxes = []
            kept_idx = []
            for i, (x, y, c) in enumerate(peaks):
                if half <= x < W - half and half <= y < H - half:
                    boxes.append(mic[y - half:y - half + 2 * half,
                                     x - half:x - half + 2 * half])
                    kept_idx.append(i)
            if boxes:
                feats = particle_features(np.stack(boxes))
                ok = np.asarray(svm.predict(feats)) > 0
                if nb is not None:
                    # fast-rejection stage: candidates the naive Bayes
                    # calls noise are dropped before/with the SVM verdict
                    ok &= np.asarray(nb.predict(feats)) > 0
                peaks = [peaks[kept_idx[j]] for j in range(len(boxes))
                         if ok[j]]
        MetaData.fromRows([
            {"xcoor": x, "ycoor": y, "cost": c, "itemId": i + 1}
            for i, (x, y, c) in enumerate(peaks)]).write(self.getParam("-o"))
        if self.verbose:
            print(f"Picked {len(peaks)} particles")
        self.n_picked = len(peaks)

    def _train_svm(self):
        from xmipp3_tpu.core.metadata_program import load_image_rows
        from xmipp3_tpu.models.svm import (GaussianNB, LinearSVM, RBFSVM,
                                           particle_features)
        pos = load_image_rows(list(MetaData(
            self.getParam("--trainPos")).iterRows()))
        neg = load_image_rows(list(MetaData(
            self.getParam("--trainNeg")).iterRows()))
        X = particle_features(np.concatenate([pos, neg]))
        y = np.concatenate([np.ones(len(pos)), np.zeros(len(neg))])
        kind = self.getParam("--kernel")
        svm = (RBFSVM() if kind == "rbf" else LinearSVM()).fit(X, y)
        svm.save(self.getParam("--svm"))
        if self.checkParam("--fastBayes"):
            GaussianNB().fit(X, y).save(self.getParam("--svm") + "_nb")
        pred = svm.predict(X)
        acc = ((pred > 0).astype(int) == y).mean()
        self.train_accuracy = float(acc)
        if self.verbose:
            print(f"{kind} SVM trained on {len(y)} boxes "
                  f"(train accuracy {acc:.3f}) -> {self.getParam('--svm')}")


PROGRAM = None
