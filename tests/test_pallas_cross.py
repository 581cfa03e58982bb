"""Pallas cross-spectrum kernel (ops/pallas_cross.py): interpret-mode parity
on CPU; the compiled path is exercised on real TPU (verified there at
5.6e-3 relative error, MXU rounding)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xmipp3_tpu.ops.pallas_cross import (HAVE_PALLAS, cross_spectrum,
                                         cross_spectrum_pallas,
                                         cross_spectrum_xla)


@pytest.mark.skipif(not HAVE_PALLAS, reason="pallas unavailable")
def test_cross_spectrum_parity_interpret():
    rng = np.random.default_rng(0)
    B, R, nr, K = 32, 8, 13, 16
    mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    fi = jax.lax.complex(mk((B, nr, K)), mk((B, nr, K)))
    fr = jax.lax.complex(mk((R, nr, K)), mk((R, nr, K)))
    w = jnp.asarray(np.linspace(0.5, 1.5, nr).astype(np.float32))
    a = cross_spectrum_pallas(fi, fr, w, tile_b=32, interpret=True)
    b = cross_spectrum_xla(fi, fr, w)
    err = float(jnp.max(jnp.abs(a - b)) / jnp.max(jnp.abs(b)))
    assert err < 1e-4


def test_cross_spectrum_dispatch():
    rng = np.random.default_rng(1)
    B, R, nr, K = 8, 4, 5, 8
    mk = lambda s: jnp.asarray(rng.normal(size=s).astype(np.float32))
    fi = jax.lax.complex(mk((B, nr, K)), mk((B, nr, K)))
    fr = jax.lax.complex(mk((R, nr, K)), mk((R, nr, K)))
    w = jnp.ones(nr, jnp.float32)
    out = cross_spectrum(fi, fr, w)            # auto backend (CPU -> XLA)
    np.testing.assert_allclose(np.asarray(out),
                               np.asarray(cross_spectrum_xla(fi, fr, w)),
                               rtol=1e-5, atol=1e-5)
