"""Device-side optimizers.

The CONDOR/Powell role of the reference (external/condor, SURVEY §2.6)
is filled by two shapes of device program, both single-dispatch:

- compass/pattern searches as lax.scan rounds over vmapped objective
  batches (models/ctf_estimation._compass_opt, ops/frm);
- first-order refinement as an Adam lax.scan (here): the whole step
  loop runs on device — a host loop pays several link round-trips per
  step for the eager moment updates, which dominates wall-clock through
  the axon relay.
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np


def adam_scan(loss_fn, x0, n_steps: int, lr, b1: float = 0.9,
              b2: float = 0.999, eps: float = 1e-8):
    """Minimize `loss_fn(x) -> scalar` with n_steps of Adam in ONE jitted
    lax.scan. `lr` may be a scalar or a per-leading-axis vector. Returns
    (x, final_loss) as device arrays.

    loss_fn must be jax-traceable; it is traced once per call site (the
    callers run once per program invocation, so the compile replaces the
    per-call jit they previously created anyway)."""
    x0 = jnp.asarray(x0, jnp.float32)
    lr = jnp.asarray(lr, jnp.float32)
    lr_b = lr.reshape(lr.shape + (1,) * (x0.ndim - lr.ndim)) \
        if lr.ndim else lr

    @jax.jit
    def run(x0):
        def step(carry, t):
            x, m, v = carry
            l, g = jax.value_and_grad(loss_fn)(x)
            m = b1 * m + (1 - b1) * g
            v = b2 * v + (1 - b2) * g * g
            mh = m / (1 - jnp.power(b1, t))
            vh = v / (1 - jnp.power(b2, t))
            x = x - lr_b * mh / (jnp.sqrt(vh) + eps)
            return (x, m, v), l

        ts = jnp.arange(1, n_steps + 1, dtype=jnp.float32)
        (x, _, _), losses = jax.lax.scan(
            step, (x0, jnp.zeros_like(x0), jnp.zeros_like(x0)), ts)
        return x, losses[-1]

    return run(x0)


def trust_region_dfo(loss_fn, x0, max_nfev: int = 300, rhobeg=None,
                     bounds=None):
    """Derivative-free trust-region minimizer (the CONDOR role —
    reference external/condor/ UOBYQA-family optimizer used by
    nma_alignment.h:40): scipy's COBYQA drives the jitted objective from
    the host.  For small parameter counts (NMA amplitudes are <=20) the
    quadratic-model trust region is robust on the non-smooth
    image-matching objectives where first-order methods can stall.

    Returns (x, f)."""
    import numpy as np
    import scipy.optimize

    x0 = np.asarray(x0, np.float64)

    def f(x):
        return float(loss_fn(x.astype(np.float32)))

    options = {"maxfev": int(max_nfev)}
    if rhobeg is not None:
        options["initial_tr_radius"] = float(rhobeg)
    try:
        res = scipy.optimize.minimize(f, x0, method="COBYQA",
                                      bounds=bounds, options=options)
    except Exception:
        res = scipy.optimize.minimize(
            f, x0, method="Powell",
            options={"maxfev": int(max_nfev), "xtol": 1e-3})
    return np.asarray(res.x, np.float32), float(res.fun)
