"""Branch-and-bound 2-D alignment/classification core (reference
py_xmipp/classifyPcaFuntion/bnb_gpu.py API). The torch band machinery
becomes rfft ring bands + the framework's batched gallery match:

- setRotAndShift: the (angle, shift) trial grid
- selectFourierBands / create_batchExp: per-image band coefficient
  vectors (rfft2 coefficients grouped by frequency ring)
- precalculate_projection: band vectors of every rotated/shifted
  reference
- match_batch: min band-distance assignment over the trial grid
- init_ramdon_classes: random class seeds
"""
from __future__ import annotations

import numpy as np


class BnBgpu:
    def __init__(self, nBand):
        self.nBand = int(nBand)

    # -- trial grid ---------------------------------------------------------
    def setRotAndShift(self, angle, shift):
        """angle = (start, stop, step); shift = (max_shift, step).
        Returns the (T, 3) trial table (psi, sx, sy)."""
        a0, a1, astep = angle
        angs = np.arange(a0, a1, astep, dtype=np.float32)
        smax, sstep = shift
        ss = np.arange(-smax, smax + 1e-6, sstep, dtype=np.float32)
        trials = [(a, x, y) for a in angs for x in ss for y in ss]
        self.trials = np.asarray(trials, np.float32)
        return self.trials

    # -- frequency bands ----------------------------------------------------
    def _band_masks(self, n):
        fy = np.fft.fftfreq(n)[:, None]
        fx = np.fft.rfftfreq(n)[None, :]
        r = np.sqrt(fy * fy + fx * fx)
        edges = np.linspace(0.02, 0.45, self.nBand + 1)
        return [(r >= edges[i]) & (r < edges[i + 1])
                for i in range(self.nBand)]

    def selectFourierBands(self, images):
        """Band coefficient vectors of a stack: list over bands of
        (B, n_coef*2) real arrays."""
        images = np.asarray(images, np.float32)
        F = np.fft.rfft2(images)
        masks = self._band_masks(images.shape[-1])
        out = []
        for m in masks:
            c = F[..., m]
            out.append(np.concatenate([c.real, c.imag], axis=-1)
                       .astype(np.float32))
        return out

    def create_batchExp(self, images):
        """Experimental band matrix: (B, sum_coeffs) concatenated bands."""
        return np.concatenate(self.selectFourierBands(images), axis=-1)

    def precalculate_projection(self, refs, trials=None):
        """Band matrix of every (reference, trial) pair:
        (R, T, sum_coeffs)."""
        from xmipp3_tpu.ops.geo import apply_alignment_2d
        refs = np.asarray(refs, np.float32)
        trials = self.trials if trials is None else trials
        R, T = len(refs), len(trials)
        out = []
        for t in trials:
            warped = np.asarray(apply_alignment_2d(
                refs, np.full(R, t[0], np.float32),
                np.full(R, t[1], np.float32),
                np.full(R, t[2], np.float32)))
            out.append(self.create_batchExp(warped))
        return np.stack(out, axis=1)        # (R, T, C)

    def match_batch(self, batchExp, batchRef):
        """Min L2 band distance over (ref, trial): returns
        (labels (B,), best_trial (B,), distances (B,))."""
        B = len(batchExp)
        Rr, T, C = batchRef.shape
        flat = batchRef.reshape(Rr * T, C)
        x2 = (batchExp ** 2).sum(1, keepdims=True)
        r2 = (flat ** 2).sum(1)[None, :]
        d2 = x2 + r2 - 2.0 * batchExp @ flat.T
        k = d2.argmin(axis=1)
        return k // T, k % T, d2[np.arange(B), k]

    def init_ramdon_classes(self, n_classes, images, seed=0):
        """Random-subset class averages (the reference's spelling kept)."""
        rng = np.random.default_rng(seed)
        images = np.asarray(images, np.float32)
        order = rng.permutation(len(images))
        return np.stack([images[c].mean(axis=0)
                         for c in np.array_split(order, n_classes)])
