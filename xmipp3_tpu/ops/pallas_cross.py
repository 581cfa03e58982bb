"""Pallas TPU kernel: batched weighted complex cross-spectrum.

The projection-matching scan's core contraction is
cross[b, R, k] = sum_r fi[b, r, k] * w[r] * conj(fr[R, r, k])
(ops/match.py rotational_corr_matrix). Per angular frequency k this is a
complex matmul (B, nr) @ (nr, R); the kernel decomposes it into four real
MXU matmuls per (k, B-tile) grid cell with f32 accumulation, rings padded
to the 128-lane tile.

This kernel compiles on real TPU hardware; `cross_spectrum` transparently
falls back to the XLA einsum elsewhere. (A polar-gather kernel was
prototyped and dropped — Mosaic has no gather lowering for the 4-tap
pattern, and XLA's constant-index gather path already sustains ~12 G
samples/s on the polar grids, measured in the config-4 stage ablation.)
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

try:
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    HAVE_PALLAS = True
except Exception:                                   # pragma: no cover
    HAVE_PALLAS = False


def _kernel(fiR_ref, fiI_ref, frR_ref, frI_ref, outR_ref, outI_ref):
    fiR = fiR_ref[0]
    fiI = fiI_ref[0]
    frR = frR_ref[0]
    frI = frI_ref[0]
    dot = partial(jnp.dot, preferred_element_type=jnp.float32)
    # fi * conj(fr): Re = fiR frR + fiI frI ; Im = fiI frR - fiR frI
    outR_ref[0] = dot(fiR, frR) + dot(fiI, frI)
    outI_ref[0] = dot(fiI, frR) - dot(fiR, frI)


@partial(jax.jit, static_argnames=("tile_b", "interpret"))
def cross_spectrum_pallas(f_imgs, f_refs, w, tile_b: int = 256,
                          interpret: bool = False):
    """cross[b, R, k] = sum_r f_imgs[b,r,k] * w[r] * conj(f_refs[R,r,k]).

    f_imgs (B, nr, k) complex64, f_refs (R, nr, k) complex64, w (nr,).
    Returns (B, R, k) complex64."""
    B, nr, K = f_imgs.shape
    R = f_refs.shape[0]
    # fold the ring weights into the references once
    frw = f_refs * w[None, :, None]
    # layout (k, B, nr) / (k, nr, R); pad all matmul dims to MXU tiles
    nr_p = int(np.ceil(nr / 128.0)) * 128
    B_p = int(np.ceil(B / float(tile_b))) * tile_b
    R_p = int(np.ceil(R / 128.0)) * 128
    fi = jnp.transpose(f_imgs, (2, 0, 1))           # (K, B, nr)
    fr = jnp.transpose(frw, (2, 1, 0))              # (K, nr, R)
    fi = jnp.pad(fi, ((0, 0), (0, B_p - B), (0, nr_p - nr)))
    fr = jnp.pad(fr, ((0, 0), (0, nr_p - nr), (0, R_p - R)))

    grid = (K, B_p // tile_b)
    in_spec_i = pl.BlockSpec((1, tile_b, nr_p), lambda k, i: (k, i, 0))
    in_spec_r = pl.BlockSpec((1, nr_p, R_p), lambda k, i: (k, 0, 0))
    out_spec = pl.BlockSpec((1, tile_b, R_p), lambda k, i: (k, i, 0))
    outR, outI = pl.pallas_call(
        _kernel,
        grid=grid,
        in_specs=[in_spec_i, in_spec_i, in_spec_r, in_spec_r],
        out_specs=[out_spec, out_spec],
        out_shape=[jax.ShapeDtypeStruct((K, B_p, R_p), jnp.float32)] * 2,
        interpret=interpret,
    )(jnp.real(fi), jnp.imag(fi), jnp.real(fr), jnp.imag(fr))
    cross = (outR + 1j * outI)[:, :B, :R]
    return jnp.transpose(cross, (1, 2, 0))          # (B, R, K)


def cross_spectrum_xla(f_imgs, f_refs, w):
    """Reference XLA einsum (the rotational_corr_matrix formulation)."""
    return jnp.einsum("brk,Rrk->bRk", f_imgs * w[None, :, None],
                      jnp.conj(f_refs))


def cross_spectrum(f_imgs, f_refs, w, prefer_pallas: bool | None = None):
    """Weighted complex cross-spectrum with transparent backend selection:
    the Pallas kernel on TPU (or when forced), the XLA einsum elsewhere."""
    if prefer_pallas is None:
        prefer_pallas = HAVE_PALLAS and \
            jax.devices()[0].platform not in ("cpu",)
    if prefer_pallas and HAVE_PALLAS:
        try:
            return cross_spectrum_pallas(f_imgs, f_refs, w)
        except Exception:                           # pragma: no cover
            pass
    return cross_spectrum_xla(f_imgs, f_refs, w)
