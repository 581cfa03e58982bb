"""Small flax CNN toolkit backing the deep_* script programs.

The reference ships TF/Keras and PyTorch models dispatched into pinned
conda envs (SURVEY.md L7: applications/scripts/deep_*, envs_DLTK). Here the
models are JAX/flax — trained and served on the same device mesh as the
rest of the framework, no env dispatch. Architectures are compact conv
stacks (the reference's are similarly small: 4-6 conv blocks).
"""
from __future__ import annotations

import pickle

import jax
import jax.numpy as jnp
import numpy as np

try:
    import flax.linen as nn
    import optax
    from flax.serialization import from_bytes, to_bytes
    HAVE_FLAX = True
except Exception:                                     # pragma: no cover
    HAVE_FLAX = False


if HAVE_FLAX:
    class ConvNet2D(nn.Module):
        """Conv stack -> global pool -> MLP head. Classification (n_out
        logits) or regression (n_out values)."""
        n_out: int = 2
        widths: tuple = (16, 32, 64)

        @nn.compact
        def __call__(self, x):                        # (B, H, W, 1)
            for w in self.widths:
                x = nn.Conv(w, (3, 3))(x)
                x = nn.GroupNorm(num_groups=min(8, w))(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (2, 2), strides=(2, 2))
            x = x.mean(axis=(1, 2))                   # global average pool
            x = nn.relu(nn.Dense(64)(x))
            return nn.Dense(self.n_out)(x)

    class ConvNet3D(nn.Module):
        n_out: int = 2
        widths: tuple = (8, 16, 32)

        @nn.compact
        def __call__(self, x):                        # (B, Z, Y, X, 1)
            for w in self.widths:
                x = nn.Conv(w, (3, 3, 3))(x)
                x = nn.GroupNorm(num_groups=min(4, w))(x)
                x = nn.relu(x)
                x = nn.max_pool(x, (2, 2, 2), strides=(2, 2, 2))
            x = x.mean(axis=(1, 2, 3))
            x = nn.relu(nn.Dense(64)(x))
            return nn.Dense(self.n_out)(x)

    class UNet3DLite(nn.Module):
        """Two-scale residual conv net for volume-to-volume mappings
        (postprocessing/denoising)."""
        width: int = 16

        @nn.compact
        def __call__(self, x):                        # (B, Z, Y, X, 1)
            w = self.width
            h1 = nn.relu(nn.Conv(w, (3, 3, 3))(x))
            h1 = nn.relu(nn.Conv(w, (3, 3, 3))(h1))
            d = nn.max_pool(h1, (2, 2, 2), strides=(2, 2, 2))
            d = nn.relu(nn.Conv(2 * w, (3, 3, 3))(d))
            d = nn.relu(nn.Conv(2 * w, (3, 3, 3))(d))
            B, Z, Y, X, C = d.shape
            u = jax.image.resize(d, (B, 2 * Z, 2 * Y, 2 * X, C), "nearest")
            h = jnp.concatenate([h1, u], axis=-1)
            h = nn.relu(nn.Conv(w, (3, 3, 3))(h))
            return x + nn.Conv(1, (3, 3, 3))(h)       # residual output


def train_model(model, X, y, loss_kind="xent", n_epochs=20, batch=32,
                lr=1e-3, seed=0, verbose=0):
    """Generic training loop. X: (N, ...) float32 (channel dim appended),
    y: (N,) int labels or (N, d) regression targets. Returns params and the
    loss history."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float32)[..., None]
    key = jax.random.PRNGKey(seed)
    params = model.init(key, jnp.asarray(X[:1]))
    tx = optax.adam(lr)
    opt_state = tx.init(params)

    def loss_fn(p, xb, yb):
        out = model.apply(p, xb)
        if loss_kind == "xent":
            logp = jax.nn.log_softmax(out)
            return -jnp.take_along_axis(logp, yb[:, None], 1).mean()
        return jnp.mean((out - yb) ** 2)

    @jax.jit
    def step(p, s, xb, yb):
        l, g = jax.value_and_grad(loss_fn)(p, xb, yb)
        up, s = tx.update(g, s, p)
        return optax.apply_updates(p, up), s, l

    y = jnp.asarray(y)
    hist = []
    N = len(X)
    for ep in range(n_epochs):
        order = rng.permutation(N)
        tot = 0.0
        nb = 0
        for i in range(0, N, batch):
            sl = order[i:i + batch]
            params, opt_state, l = step(params, opt_state,
                                        jnp.asarray(X[sl]), y[sl])
            tot += float(l)
            nb += 1
        hist.append(tot / max(nb, 1))
        if verbose:
            print(f"epoch {ep + 1}: loss {hist[-1]:.4f}")
    return params, hist


def predict(model, params, X, batch=64):
    X = np.asarray(X, np.float32)[..., None]
    outs = []
    apply = jax.jit(model.apply)
    for i in range(0, len(X), batch):
        outs.append(np.asarray(apply(params, jnp.asarray(X[i:i + batch]))))
    return np.concatenate(outs)


def save_params(path, model_kind, params, meta=None):
    with open(path, "wb") as f:
        pickle.dump({"kind": model_kind, "params": to_bytes(params),
                     "meta": meta or {}}, f)


def load_params(path, model, template_x):
    with open(path, "rb") as f:
        blob = pickle.load(f)
    init = model.init(jax.random.PRNGKey(0),
                      jnp.asarray(np.asarray(template_x, np.float32)[..., None]))
    return from_bytes(init, blob["params"]), blob["meta"]
