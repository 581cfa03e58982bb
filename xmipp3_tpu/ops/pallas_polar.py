"""Pallas TPU kernel: batched polar resampling.

The polar ring gather is the profiled hot spot of gallery matching
(docs/ARCHITECTURE.md): XLA lowers the (B, R, A, 4-tap) gather to slow
scalarized loads. This kernel keeps each image in VMEM and materializes the
polar samples with an on-chip gather over the flattened image — one grid
step per image, double-buffered by the pipeline.

Falls back transparently to the jnp implementation when Pallas/TPU is
unavailable (`polar_resample` dispatcher below); parity is tested in
interpret mode on CPU.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.ops.polar import polar_grid


def _build_tables(H, W, radius_min, radius_max, n_angles, stride):
    yy, xx, _ = polar_grid(H, W, radius_min, radius_max, n_angles)
    if stride > 1:
        yy = yy[::stride]
        xx = xx[::stride]
    y0 = np.floor(yy).astype(np.int32)
    x0 = np.floor(xx).astype(np.int32)
    fy = (yy - y0).astype(np.float32)
    fx = (xx - x0).astype(np.float32)
    y0 = np.clip(y0, 0, H - 2)
    x0 = np.clip(x0, 0, W - 2)
    # row/col index planes of the 4 taps, interleaved (row0,col0,row1,col1,..)
    idx = np.stack([y0, x0, y0, x0 + 1, y0 + 1, x0, y0 + 1, x0 + 1])
    w = np.stack([(1 - fy) * (1 - fx), (1 - fy) * fx,
                  fy * (1 - fx), fy * fx])                     # (4,R,A)
    return idx.astype(np.int32), w.astype(np.float32)


def _polar_kernel(idx_ref, w_ref, img_ref, out_ref):
    """One image per grid step; static loop over rings.

    Mosaic's gather support wants full-rank take_along_axis: per ring the
    row gather uses an (A, W) index block, the column gather an (A, 1)
    block — both VMEM-sized."""
    img = img_ref[0]                      # (H, W)
    H, W = img.shape
    R = out_ref.shape[1]
    A = out_ref.shape[2]
    for r in range(R):
        acc = None
        for t in range(4):
            rows = idx_ref[2 * t, r]              # (A,)
            cols = idx_ref[2 * t + 1, r]          # (A,)
            row_idx = jnp.broadcast_to(rows[:, None], (A, W))
            rowsel = jnp.take_along_axis(img, row_idx, axis=0)   # (A, W)
            tap = jnp.take_along_axis(rowsel, cols[:, None], axis=1)[:, 0]
            term = tap * w_ref[t, r]
            acc = term if acc is None else acc + term
        out_ref[0, r, :] = acc


@partial(jax.jit, static_argnames=("radius_min", "radius_max", "n_angles",
                                   "stride", "interpret"))
def polar_resample_pallas(imgs, radius_min: int = 2,
                          radius_max: int | None = None,
                          n_angles: int | None = None, stride: int = 1,
                          interpret: bool = False):
    """Pallas polar resample: imgs (B,H,W) -> (B,R,A) float32."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    imgs = jnp.asarray(imgs, jnp.float32)
    B, H, W = imgs.shape
    if radius_max is None:
        radius_max = H // 2 - 2
    idx, w = _build_tables(H, W, radius_min, radius_max, n_angles, stride)
    R, A = idx.shape[1:]

    grid_spec = pl.GridSpec(
        grid=(B,),
        in_specs=[
            pl.BlockSpec((8, R, A), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((4, R, A), lambda b: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, H, W), lambda b: (b, 0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, R, A), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
    )
    return pl.pallas_call(
        _polar_kernel,
        out_shape=jax.ShapeDtypeStruct((B, R, A), jnp.float32),
        grid_spec=grid_spec,
        interpret=interpret,
    )(jnp.asarray(idx), jnp.asarray(w), imgs)


_PALLAS_OK: bool | None = None


def polar_resample(imgs, radius_min: int = 2, radius_max: int | None = None,
                   n_angles: int | None = None, stride: int = 1):
    """Dispatcher: Pallas kernel on TPU, jnp gather elsewhere."""
    global _PALLAS_OK
    import jax

    if _PALLAS_OK is None:
        if jax.devices()[0].platform != "tpu":
            _PALLAS_OK = False
        else:
            try:
                test = jnp.zeros((1, 32, 32), jnp.float32)
                np.asarray(polar_resample_pallas(test, 2, 14))
                _PALLAS_OK = True
            except Exception:
                _PALLAS_OK = False
    if _PALLAS_OK:
        return polar_resample_pallas(imgs, radius_min, radius_max, n_angles,
                                     stride)
    from xmipp3_tpu.ops.polar import cartesian_to_polar
    return cartesian_to_polar(imgs, radius_min, radius_max, n_angles,
                              stride=stride)
