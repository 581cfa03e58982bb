"""deep_* script programs (reference applications/scripts/deep_*, SURVEY
L7) rebuilt as JAX/flax programs on models/deep.py — same CLI roles
(train + predict), no conda-env dispatch.

- deep_consensus: particle-vs-noise box classifier (deep_consensus.py role)
- deep_micrograph_cleaner: per-patch micrograph scoring -> mask
- deep_hand: handedness classifier on volume z-slices
- deepRes_resolution: local-resolution regression from volume patches
- deep_global_assignment(+_predict): projection-direction regression
- deep_misalignment_detection: aligned-vs-misaligned subtomo classifier
- deep_volume_postprocessing: volume-to-volume residual U-net
"""
from __future__ import annotations

import os

import numpy as np

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.core.metadata_program import load_image_rows
from xmipp3_tpu.core.program import XmippProgram


def _norm(x):
    x = np.asarray(x, np.float32)
    ax = tuple(range(1, x.ndim))
    mu = x.mean(axis=ax, keepdims=True)
    sd = x.std(axis=ax, keepdims=True)
    return (x - mu) / np.maximum(sd, 1e-8)


class _DeepBase(XmippProgram):
    def _common_params(self):
        self.addParamsLine("  [--model <path=model.pkl>] : Model file (written in train mode, read otherwise)")
        self.addParamsLine("  [--train]          : Train a model")
        self.addParamsLine("  [--epochs <e=20>]  : Training epochs")
        self.addParamsLine("  [--lr <l=0.001>]   : Learning rate")

    def _train_args(self):
        return dict(n_epochs=self.getIntParam("--epochs")
                    if self.checkParam("--epochs") else 20,
                    lr=self.getDoubleParam("--lr")
                    if self.checkParam("--lr") else 1e-3,
                    verbose=self.verbose)


class ProgDeepConsensus(_DeepBase):
    name = "xmipp_deep_consensus"

    def defineParams(self):
        self.addUsageLine("Particle-picking consensus CNN: train on "
                          "positive particle boxes + noise boxes, then "
                          "score candidate particles.")
        self.addParamsLine("   -i <md>          : Candidate particles (metadata with image column)")
        self.addParamsLine("  [-o <md=scored.xmd>] : Scored output")
        self.addParamsLine("  [--posTrain <md=\"\">] : Positive training particles")
        self.addParamsLine("  [--negTrain <md=\"\">] : Negative (noise) training particles")
        self._common_params()

    def run(self):
        from xmipp3_tpu.models.deep import (ConvNet2D, load_params, predict,
                                            save_params, train_model)
        model = ConvNet2D(n_out=2)
        mpath = self.getParam("--model") if self.checkParam("--model") \
            else "model.pkl"
        if self.checkParam("--train"):
            pos = _norm(load_image_rows(list(MetaData(
                self.getParam("--posTrain")).iterRows())))
            neg = _norm(load_image_rows(list(MetaData(
                self.getParam("--negTrain")).iterRows())))
            X = np.concatenate([pos, neg])
            y = np.concatenate([np.ones(len(pos), np.int32),
                                np.zeros(len(neg), np.int32)])
            params, hist = train_model(model, X, y, "xent",
                                       **self._train_args())
            save_params(mpath, "ConvNet2D", params)
            if self.verbose:
                print(f"trained: loss {hist[0]:.3f} -> {hist[-1]:.3f}")
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        X = _norm(load_image_rows(rows))
        params, _ = load_params(mpath, model, X[:1])
        logits = predict(model, params, X)
        p = np.exp(logits[:, 1]) / np.exp(logits).sum(axis=1)
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["zScoreDeepLearning1"] = float(p[i])
            d["enabled"] = 1 if p[i] > 0.5 else -1
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o")
                                     if self.checkParam("-o")
                                     else "scored.xmd")
        self.scores = p
        if self.verbose:
            print(f"scored {len(p)} candidates; {int((p > .5).sum())} kept")


class ProgDeepMicrographCleaner(_DeepBase):
    name = "xmipp_deep_micrograph_cleaner"

    def defineParams(self):
        self.addUsageLine("Score micrograph patches (carbon/contamination "
                          "vs clean ice) and write a mask.")
        self.addParamsLine("   -i <mic>        : Micrograph")
        self.addParamsLine("  [-o <mask=mask.mrc>] : Output goodness mask (1 = clean)")
        self.addParamsLine("  [--boxSize <b=64>] : Patch size")
        self.addParamsLine("  [--goodTrain <md=\"\">] : Clean training patches")
        self.addParamsLine("  [--badTrain <md=\"\">]  : Contaminated training patches")
        self._common_params()

    def run(self):
        from xmipp3_tpu.models.deep import (ConvNet2D, load_params, predict,
                                            save_params, train_model)
        model = ConvNet2D(n_out=2)
        mpath = self.getParam("--model") if self.checkParam("--model") \
            else "model.pkl"
        b = self.getIntParam("--boxSize") if self.checkParam("--boxSize") \
            else 64
        if self.checkParam("--train"):
            good = _norm(load_image_rows(list(MetaData(
                self.getParam("--goodTrain")).iterRows())))
            bad = _norm(load_image_rows(list(MetaData(
                self.getParam("--badTrain")).iterRows())))
            X = np.concatenate([good, bad])
            y = np.concatenate([np.ones(len(good), np.int32),
                                np.zeros(len(bad), np.int32)])
            params, hist = train_model(model, X, y, "xent",
                                       **self._train_args())
            save_params(mpath, "ConvNet2D", params)
            if self.verbose:
                print(f"trained: loss {hist[0]:.3f} -> {hist[-1]:.3f}")
        mic = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        H, W = mic.shape
        ys = list(range(0, H - b + 1, b // 2)) or [0]
        xs = list(range(0, W - b + 1, b // 2)) or [0]
        patches = np.stack([mic[y:y + b, x:x + b] for y in ys for x in xs])
        params, _ = load_params(mpath, model, patches[:1])
        logits = predict(model, params, _norm(patches))
        p = np.exp(logits[:, 1]) / np.exp(logits).sum(axis=1)
        mask = np.zeros((H, W), np.float32)
        wsum = np.zeros((H, W), np.float32)
        k = 0
        for y in ys:
            for x in xs:
                mask[y:y + b, x:x + b] += p[k]
                wsum[y:y + b, x:x + b] += 1
                k += 1
        mask /= np.maximum(wsum, 1)
        save_image(self.getParam("-o") if self.checkParam("-o")
                   else "mask.mrc", mask)
        self.mask = mask
        if self.verbose:
            print(f"mean cleanliness {mask.mean():.3f}")


class ProgDeepHand(_DeepBase):
    name = "xmipp_deep_hand"

    def defineParams(self):
        self.addUsageLine("Predict volume handedness (deep_hand role). "
                          "Chirality is a 3D property (a mirrored 2D slice "
                          "is just another in-plane pose), so the classifier "
                          "is a 3D CNN on the whole volume, trained on "
                          "correct volumes vs their mirrors with z-rotation "
                          "augmentation.")
        self.addParamsLine("   -i <vol>       : Input volume")
        self.addParamsLine("  [-o <txt=hand.txt>] : Output (probability the hand is correct)")
        self.addParamsLine("  [--trainVols <md=\"\">] : Metadata listing correctly-handed volumes for training")
        self._common_params()

    @staticmethod
    def _augment(vol):
        """4 z-rotations (k*90 deg) of the volume: chirality-preserving."""
        return [np.rot90(vol, k, axes=(1, 2)) for k in range(4)]

    def run(self):
        from xmipp3_tpu.models.deep import (ConvNet3D, load_params, predict,
                                            save_params, train_model)
        model = ConvNet3D(n_out=2)
        mpath = self.getParam("--model") if self.checkParam("--model") \
            else "model.pkl"
        if self.checkParam("--train"):
            X, y = [], []
            for r in MetaData(self.getParam("--trainVols")).iterRows():
                v = np.squeeze(Image(r["image"]).data).astype(np.float32)
                for a in self._augment(v):
                    X.append(a)
                    y.append(1)
                for a in self._augment(v[:, :, ::-1]):  # mirror = wrong hand
                    X.append(a)
                    y.append(0)
            X = _norm(np.stack(X))
            params, hist = train_model(model, X, np.asarray(y, np.int32),
                                       "xent", **self._train_args())
            save_params(mpath, "ConvNet3D", params)
            if self.verbose:
                print(f"trained: loss {hist[0]:.3f} -> {hist[-1]:.3f}")
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        X = _norm(np.stack(self._augment(vol)))
        params, _ = load_params(mpath, model, X[:1])
        logits = predict(model, params, X)
        p = float(np.mean(np.exp(logits[:, 1])
                          / np.exp(logits).sum(axis=1)))
        out = self.getParam("-o") if self.checkParam("-o") else "hand.txt"
        open(out, "w").write(f"{p:.6f}\n")
        self.hand_prob = p
        if self.verbose:
            print(f"P(correct hand) = {p:.3f}")


class ProgDeepResResolution(_DeepBase):
    name = "xmipp_deepRes_resolution"

    def defineParams(self):
        self.addUsageLine("Local resolution by regression on volume patches "
                          "(deepRes role).")
        self.addParamsLine("   -i <vol>       : Input volume")
        self.addParamsLine("  [-o <vol=deepres.mrc>] : Local resolution map")
        self.addParamsLine("  [--sampling <s=1>] : Sampling (A/px)")
        self.addParamsLine("  [--trainVols <md=\"\">] : Training metadata: image + resolution columns")
        self.addParamsLine("  [--patch <p=16>] : Patch size")
        self._common_params()

    def run(self):
        from xmipp3_tpu.models.deep import (ConvNet3D, load_params, predict,
                                            save_params, train_model)
        model = ConvNet3D(n_out=1)
        mpath = self.getParam("--model") if self.checkParam("--model") \
            else "model.pkl"
        p_sz = self.getIntParam("--patch") if self.checkParam("--patch") \
            else 16
        if self.checkParam("--train"):
            X, y = [], []
            for r in MetaData(self.getParam("--trainVols")).iterRows():
                v = np.squeeze(Image(r["image"]).data).astype(np.float32)
                res = float(r["resolution"])
                rng = np.random.default_rng(len(X))
                for _ in range(16):
                    z, yy, xx = (rng.integers(0, s - p_sz + 1)
                                 for s in v.shape)
                    X.append(v[z:z + p_sz, yy:yy + p_sz, xx:xx + p_sz])
                    y.append([res])
            X = _norm(np.stack(X))
            params, hist = train_model(model, X,
                                       np.asarray(y, np.float32), "mse",
                                       **self._train_args())
            save_params(mpath, "ConvNet3D", params)
            if self.verbose:
                print(f"trained: loss {hist[0]:.3f} -> {hist[-1]:.3f}")
        vol = np.squeeze(Image(self.getParam("-i")).data).astype(np.float32)
        Z, Y, X_ = vol.shape
        step = p_sz // 2
        out = np.zeros_like(vol)
        wsum = np.zeros_like(vol)
        patches, spots = [], []
        for z in range(0, Z - p_sz + 1, step):
            for yy in range(0, Y - p_sz + 1, step):
                for xx in range(0, X_ - p_sz + 1, step):
                    patches.append(vol[z:z + p_sz, yy:yy + p_sz,
                                       xx:xx + p_sz])
                    spots.append((z, yy, xx))
        patches = _norm(np.stack(patches))
        params, _ = load_params(mpath, model, patches[:1])
        vals = predict(model, params, patches)[:, 0]
        for (z, yy, xx), v in zip(spots, vals):
            out[z:z + p_sz, yy:yy + p_sz, xx:xx + p_sz] += v
            wsum[z:z + p_sz, yy:yy + p_sz, xx:xx + p_sz] += 1
        out /= np.maximum(wsum, 1)
        save_image(self.getParam("-o") if self.checkParam("-o")
                   else "deepres.mrc", out.astype(np.float32))
        self.resmap = out
        if self.verbose:
            print(f"local resolution {out.mean():.2f} "
                  f"({out.min():.2f}..{out.max():.2f})")


def _dir_to_s2(rot_deg, tilt_deg):
    r = np.deg2rad(np.asarray(rot_deg, np.float64))
    t = np.deg2rad(np.asarray(tilt_deg, np.float64))
    return np.stack([np.sin(t) * np.cos(r), np.sin(t) * np.sin(r),
                     np.cos(t)], axis=-1).astype(np.float32)


class ProgDeepGlobalAssignment(_DeepBase):
    name = "xmipp_deep_global_assignment"

    def defineParams(self):
        self.addUsageLine("Train a CNN that regresses the projection "
                          "direction of a particle image "
                          "(deep_global_assignment role).")
        self.addParamsLine("   -i <md>         : Training particles with angleRot/angleTilt")
        self.addParamsLine("  [--model <path=model.pkl>] : Output model")
        self.addParamsLine("  [--epochs <e=30>] : Training epochs")
        self.addParamsLine("  [--lr <l=0.001>]  : Learning rate")

    def run(self):
        from xmipp3_tpu.models.deep import (ConvNet2D, save_params,
                                            train_model)
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        X = _norm(load_image_rows(rows))
        y = _dir_to_s2([float(r.get("angleRot", 0)) for r in rows],
                       [float(r.get("angleTilt", 0)) for r in rows])
        model = ConvNet2D(n_out=3)
        params, hist = train_model(
            model, X, y, "mse",
            n_epochs=self.getIntParam("--epochs")
            if self.checkParam("--epochs") else 30,
            lr=self.getDoubleParam("--lr")
            if self.checkParam("--lr") else 1e-3, verbose=self.verbose)
        save_params(self.getParam("--model") if self.checkParam("--model")
                    else "model.pkl", "ConvNet2D", params)
        self.loss_history = hist
        if self.verbose:
            print(f"trained: loss {hist[0]:.4f} -> {hist[-1]:.4f}")


class ProgDeepGlobalAssignmentPredict(_DeepBase):
    name = "xmipp_deep_global_assignment_predict"

    def defineParams(self):
        self.addUsageLine("Predict projection directions with a trained "
                          "deep_global_assignment model.")
        self.addParamsLine("   -i <md>          : Particles")
        self.addParamsLine("   -o <md>          : Output with predicted angles")
        self.addParamsLine("  [--model <path=model.pkl>] : Trained model")

    def run(self):
        from xmipp3_tpu.models.deep import (ConvNet2D, load_params, predict)
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        X = _norm(load_image_rows(rows))
        model = ConvNet2D(n_out=3)
        params, _ = load_params(self.getParam("--model")
                                if self.checkParam("--model")
                                else "model.pkl", model, X[:1])
        v = predict(model, params, X)
        v /= np.maximum(np.linalg.norm(v, axis=1, keepdims=True), 1e-8)
        tilt = np.rad2deg(np.arccos(np.clip(v[:, 2], -1, 1)))
        rot = np.rad2deg(np.arctan2(v[:, 1], v[:, 0]))
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["angleRot"] = float(rot[i])
            d["angleTilt"] = float(tilt[i])
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o"))
        self.directions = v
        if self.verbose:
            print(f"predicted {len(v)} directions")


class ProgDeepMisalignmentDetection(_DeepBase):
    name = "xmipp_deep_misalignment_detection"

    def defineParams(self):
        self.addUsageLine("Classify subtomograms as aligned/misaligned "
                          "(deep_misalignment_detection role).")
        self.addParamsLine("   -i <md>          : Subtomograms to score")
        self.addParamsLine("  [-o <md=scored.xmd>] : Output")
        self.addParamsLine("  [--goodTrain <md=\"\">] : Aligned training subtomos")
        self.addParamsLine("  [--badTrain <md=\"\">]  : Misaligned training subtomos")
        self._common_params()

    def run(self):
        from xmipp3_tpu.models.deep import (ConvNet3D, load_params, predict,
                                            save_params, train_model)
        model = ConvNet3D(n_out=2)
        mpath = self.getParam("--model") if self.checkParam("--model") \
            else "model.pkl"

        def load_vols(fn):
            return _norm(np.stack([np.squeeze(Image(r["image"]).data)
                                   for r in MetaData(fn).iterRows()]))

        if self.checkParam("--train"):
            good = load_vols(self.getParam("--goodTrain"))
            bad = load_vols(self.getParam("--badTrain"))
            X = np.concatenate([good, bad])
            y = np.concatenate([np.ones(len(good), np.int32),
                                np.zeros(len(bad), np.int32)])
            params, hist = train_model(model, X, y, "xent",
                                       **self._train_args())
            save_params(mpath, "ConvNet3D", params)
            if self.verbose:
                print(f"trained: loss {hist[0]:.3f} -> {hist[-1]:.3f}")
        md = MetaData(self.getParam("-i"))
        rows = list(md.iterRows())
        X = load_vols(self.getParam("-i"))
        params, _ = load_params(mpath, model, X[:1])
        logits = predict(model, params, X)
        p = np.exp(logits[:, 1]) / np.exp(logits).sum(axis=1)
        out = []
        for i, r in enumerate(rows):
            d = dict(r)
            d["cost"] = float(p[i])
            d["enabled"] = 1 if p[i] > 0.5 else -1
            out.append(d)
        MetaData.fromRows(out).write(self.getParam("-o")
                                     if self.checkParam("-o")
                                     else "scored.xmd")
        self.scores = p
        if self.verbose:
            print(f"{int((p > .5).sum())}/{len(p)} classified as aligned")


class ProgDeepVolumePostprocessing(_DeepBase):
    name = "xmipp_deep_volume_postprocessing"

    def defineParams(self):
        self.addUsageLine("Volume-to-volume postprocessing (denoise/"
                          "sharpen) with a residual U-net "
                          "(deep_volume_postprocessing role).")
        self.addParamsLine("   -i <vol>        : Input volume")
        self.addParamsLine("  [-o <vol=post.mrc>] : Output volume")
        self.addParamsLine("  [--trainPairs <md=\"\">] : Metadata with image (input) + imageRef (target) volume pairs")
        self._common_params()

    def run(self):
        import jax.numpy as jnp
        from xmipp3_tpu.models.deep import (UNet3DLite, load_params,
                                            save_params)
        import jax
        import optax
        model = UNet3DLite()
        mpath = self.getParam("--model") if self.checkParam("--model") \
            else "model.pkl"
        if self.checkParam("--train"):
            pairs = [(np.squeeze(Image(r["image"]).data),
                      np.squeeze(Image(r["imageRef"]).data))
                     for r in MetaData(self.getParam("--trainPairs")
                                       ).iterRows()]
            X = _norm(np.stack([p[0] for p in pairs]))[..., None]
            Y = _norm(np.stack([p[1] for p in pairs]))[..., None]
            key = jax.random.PRNGKey(0)
            params = model.init(key, jnp.asarray(X[:1]))
            args = self._train_args()
            tx = optax.adam(args["lr"])
            st = tx.init(params)

            @jax.jit
            def step(p, s, xb, yb):
                def loss(p):
                    return jnp.mean((model.apply(p, xb) - yb) ** 2)
                l, g = jax.value_and_grad(loss)(p)
                up, s = tx.update(g, s, p)
                return optax.apply_updates(p, up), s, l

            hist = []
            for _ in range(args["n_epochs"]):
                params, st, l = step(params, st, jnp.asarray(X),
                                     jnp.asarray(Y))
                hist.append(float(l))
            save_params(mpath, "UNet3DLite", params)
            if self.verbose:
                print(f"trained: loss {hist[0]:.4f} -> {hist[-1]:.4f}")
        vol = _norm(np.squeeze(Image(self.getParam("-i")).data)[None])
        params, _ = load_params(mpath, model, vol)
        import jax.numpy as jnp2
        out = np.asarray(model.apply(params,
                                     jnp2.asarray(vol[..., None])))[0, ..., 0]
        save_image(self.getParam("-o") if self.checkParam("-o")
                   else "post.mrc", out.astype(np.float32))
        self.output = out
        if self.verbose:
            print("postprocessed volume written")
