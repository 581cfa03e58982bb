"""Linear SVM (hinge loss + L2, jitted full-batch Adam).

The reference's automatic picker trains a C-SVM over rotation-invariant
particle features as its second classification stage
(micrograph_automatic_picking_main / classification lib, SURVEY §2.3);
this is the device-native equivalent."""
from __future__ import annotations

import numpy as np


class LinearSVM:
    def __init__(self, C: float = 1.0, n_steps: int = 300, lr: float = 0.05):
        self.C = C
        self.n_steps = n_steps
        self.lr = lr
        self.w = None
        self.b = 0.0
        self._mu = None
        self._sd = None

    def fit(self, X, y):
        """X (N, D); y in {0, 1} (mapped to ±1)."""
        import jax
        import jax.numpy as jnp
        X = np.asarray(X, np.float32)
        self._mu = X.mean(axis=0)
        self._sd = np.maximum(X.std(axis=0), 1e-8)
        Xn = jnp.asarray((X - self._mu) / self._sd)
        yy = jnp.asarray(np.where(np.asarray(y) > 0, 1.0, -1.0), jnp.float32)

        def loss(params):
            w, b = params
            margins = yy * (Xn @ w + b)
            hinge = jnp.maximum(0.0, 1.0 - margins).mean()
            return 0.5 * (w @ w) / self.C / len(yy) + hinge

        gfn = jax.jit(jax.value_and_grad(loss))
        w = jnp.zeros(X.shape[1], jnp.float32)
        b = jnp.asarray(0.0, jnp.float32)
        m = [jnp.zeros_like(w), jnp.zeros_like(b)]
        v = [jnp.zeros_like(w), jnp.zeros_like(b)]
        for step in range(self.n_steps):
            _, g = gfn((w, b))
            new = []
            for k, (p, gk) in enumerate(zip((w, b), g)):
                m[k] = 0.9 * m[k] + 0.1 * gk
                v[k] = 0.999 * v[k] + 0.001 * gk * gk
                mh = m[k] / (1 - 0.9 ** (step + 1))
                vh = v[k] / (1 - 0.999 ** (step + 1))
                new.append(p - self.lr * mh / (jnp.sqrt(vh) + 1e-8))
            w, b = new
        self.w = np.asarray(w)
        self.b = float(b)
        return self

    def decision(self, X):
        Xn = (np.asarray(X, np.float32) - self._mu) / self._sd
        return Xn @ self.w + self.b

    def predict(self, X):
        return (self.decision(X) > 0).astype(int)

    def save(self, path):
        np.savez(path, w=self.w, b=self.b, mu=self._mu, sd=self._sd,
                 C=self.C)

    @classmethod
    def load(cls, path):
        d = np.load(path if str(path).endswith(".npz") else path + ".npz")
        svm = cls(C=float(d["C"]))
        svm.w = d["w"]
        svm.b = float(d["b"])
        svm._mu = d["mu"]
        svm._sd = d["sd"]
        return svm


def particle_features(boxes, radius_min: int = 2):
    """Rotation-invariant features of particle boxes: ring-FFT magnitude
    spectrum + intensity moments (the picker's feature vector)."""
    import jax.numpy as jnp
    from xmipp3_tpu.ops.polar import cartesian_to_polar
    boxes = np.asarray(boxes, np.float32)
    B = len(boxes)
    mu = boxes.mean(axis=(1, 2), keepdims=True)
    sd = np.maximum(boxes.std(axis=(1, 2), keepdims=True), 1e-8)
    norm = (boxes - mu) / sd
    pol = np.asarray(cartesian_to_polar(jnp.asarray(norm), radius_min))
    spec = np.abs(np.fft.rfft(pol, axis=-1))[..., :8]
    feats = [spec.reshape(B, -1),
             pol.mean(axis=-1),                     # radial profile
             boxes.mean(axis=(1, 2))[:, None],
             boxes.std(axis=(1, 2))[:, None]]
    return np.concatenate(feats, axis=1)
