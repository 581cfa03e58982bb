"""Fused Kaiser-Bessel gridding scatter (direct-KB fast path).

The XLA kb path in ops/reconstruct.py expands the 64-tap blob footprint
into 64x-long index/value streams and feeds the generic sorted scatter —
the sort then processes 64x the samples. This kernel instead sorts the
raw samples ONCE by base voxel and expands the footprint **in-kernel**:

- grid = (ntiles, 4 dz-passes); pass d handles taps at dz = d-1, so a
  tile's contributing samples stay a contiguous run of the sorted stream
  (searchsorted start/end per (d, tile), scalar-prefetched);
- per 1024-sample block (double-buffered DMA of one packed (7, 8, 128)
  stripe: bitcast base index + fz/fy/fx fracs + 3 value channels), the
  16 (dy, dx) taps are expanded with a polynomial fit of the KB window
  (exactly representable to ~3e-4 by a degree-7 poly in d^2), and
  accumulated into the tile via one-hot MXU contractions — the same
  sorted one-hot trick as ops/pallas_scatter.py, in groups of 4 taps to
  bound VMEM stack liveness (Mosaic does not reuse stack slots across
  the unrolled tap loop; 16-tap concats blow the 16 MB scoped limit);
- out-of-cube taps are masked by a zero window weight: a zero B-row
  contributes nothing, so the A one-hot needs no mask.

Replaces the gridding hot loop of the reference's Fourier reconstructor
(reconstruct_fourier.cpp:474-531 processWeights/place blob loop) for the
interp="kb" mode. Measured (v5e, P=256, 1.6 M samples x 64 taps x 3
channels): 410 ms/chunk vs ~950 ms for sort-64x-streams + generic
scatter — and the sort shrinks from 100 M to 1.6 M rows.

Requires: TPU backend, blob radius <= 2 (the 4^3 footprint), P^3
divisible by TILE (any even P >= 32 power-of-two-ish size works; P=2N
with N a multiple of 16 does). Callers gate with `kb_fastpath_ok`.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO2 = 128            # one-hot rows (A width)
HI2 = 64             # one-hot cols (B width)
TILE = LO2 * HI2     # voxels per tile = 8192
BLK = 1024           # samples per DMA'd block
ROWS = BLK // 128
NCH = 3
GRP = 4              # taps per MXU dot (VMEM stack bound)
POLY_DEG = 7

TAPS_YX = [(dy, dx) for dy in range(-1, 3) for dx in range(-1, 3)]


@lru_cache(maxsize=8)
def _window_poly(radius: float, alpha: float, order: int):
    """Least-squares polynomial in d^2 matching the KB window on
    [0, radius^2]; max abs error ~3e-4 at degree 7 for (1.9, 15, 0)."""
    from scipy import special as ss
    d2 = np.linspace(0, radius * radius, 1024)
    t2 = np.maximum(1 - d2 / (radius * radius), 0.0)
    arg = alpha * np.sqrt(t2)
    if order == 0:
        w = ss.iv(0, arg) / ss.iv(0, alpha)
    elif order == 2:
        safe = np.maximum(arg, 1e-6)
        i2 = np.where(arg < 1e-6, 0.0, ss.iv(2, safe))
        w = t2 * i2 / ss.iv(2, alpha)
    else:
        raise NotImplementedError("blob order must be 0 or 2")
    return tuple(float(c) for c in np.polyfit(d2, w, POLY_DEG))


def kb_fastpath_ok(P: int, radius: float, slab: bool,
                   slab_p: int | None = None) -> bool:
    """slab mode is supported when the z-slab tiles evenly: the kernel
    offsets its tile grid by the (traced) slab origin and masks taps to
    the slab (round-3, VERDICT #7 — reconstruct_fourier.cpp:300-306
    row-band analog)."""
    if radius > 2.0 or P < 32:
        return False
    if slab:
        if slab_p is None or (slab_p * P * P) % TILE:
            return False
    elif (P ** 3) % TILE:
        return False
    return jax.default_backend() == "tpu"


def _mk_kernel(P: int, poly, r2: float, zdim: int):
    def kernel(zlo_ref, starts_ref, ends_ref, u7_hbm, cube_ref, out_ref,
               acc_ref, buf, sem):
        t = pl.program_id(0)
        d = pl.program_id(1)
        dz = d - 1
        zlo = zlo_ref[0]
        base_t = t * TILE + zlo * (P * P)

        @pl.when(d == 0)
        def _():
            acc_ref[:] = cube_ref[:, :, :]

        s = starts_ref[d, t]
        e = ends_ref[d, t]
        b0 = jax.lax.div(s, BLK)
        nblk = pl.cdiv(e, BLK) - b0

        def start_copy(slot, b):
            row0 = (b0 + b) * ROWS
            pltpu.make_async_copy(u7_hbm.at[:, pl.ds(row0, ROWS), :],
                                  buf.at[slot], sem.at[slot]).start()

        @pl.when(nblk > 0)
        def _():
            start_copy(0, 0)

            def body(b, _):
                slot = jax.lax.rem(b, 2)

                @pl.when(b + 1 < nblk)
                def _():
                    start_copy(1 - slot, b + 1)

                pltpu.make_async_copy(
                    u7_hbm.at[:, pl.ds((b0 + b) * ROWS, ROWS), :],
                    buf.at[slot], sem.at[slot]).wait()
                # 32-bit transposes to sample-major (128, ROWS)
                tb = [jnp.transpose(buf[slot, k], (1, 0)) for k in range(7)]
                base = pltpu.bitcast(tb[0], jnp.int32)
                fz, fy, fx = tb[1], tb[2], tb[3]
                vals = tb[4:7]
                z0 = jax.lax.div(base, P * P)
                rem = jax.lax.rem(base, P * P)
                y0 = jax.lax.div(rem, P)
                x0 = jax.lax.rem(rem, P)
                zin = (z0 + dz >= zlo) & (z0 + dz < zlo + zdim)
                for c in range(ROWS):
                    bcol = base[:, c:c + 1]
                    fzc = fz[:, c:c + 1]
                    fyc = fy[:, c:c + 1]
                    fxc = fx[:, c:c + 1]
                    y0c = y0[:, c:c + 1]
                    x0c = x0[:, c:c + 1]
                    zinc = zin[:, c:c + 1]
                    dzw = (dz - fzc) ** 2
                    for g in range(0, len(TAPS_YX), GRP):
                        A_parts = []
                        B_parts = [[] for _ in range(NCH)]
                        for dy, dx in TAPS_YX[g:g + GRP]:
                            flat = (bcol + (dz * P * P + dy * P + dx)
                                    ) - base_t
                            ok = (zinc
                                  & (y0c + dy >= 0) & (y0c + dy < P)
                                  & (x0c + dx >= 0) & (x0c + dx < P)
                                  & (flat >= 0) & (flat < TILE))
                            d2 = dzw + (dy - fyc) ** 2 + (dx - fxc) ** 2
                            w = jnp.zeros_like(d2)
                            for coef in poly:
                                w = w * d2 + coef
                            w = jnp.where(ok & (d2 <= r2),
                                          jnp.maximum(w, 0.0), 0.0)
                            okf = jnp.where(ok, 1.0, 0.0)
                            fl = jnp.clip(flat, 0, TILE - 1)
                            lo2 = jax.lax.div(fl, HI2)
                            hi2 = jax.lax.rem(fl, HI2)
                            A_parts.append(jnp.where(
                                lo2 == jax.lax.broadcasted_iota(
                                    jnp.int32, (128, LO2), 1), okf, 0.0))
                            ohhi = jnp.where(
                                hi2 == jax.lax.broadcasted_iota(
                                    jnp.int32, (128, HI2), 1), w, 0.0)
                            for ch in range(NCH):
                                B_parts[ch].append(
                                    ohhi * vals[ch][:, c:c + 1])
                        A = jnp.concatenate(A_parts, axis=0)
                        for ch in range(NCH):
                            Bc = jnp.concatenate(B_parts[ch], axis=0)
                            acc_ref[ch, :, :] += jax.lax.dot_general(
                                A, Bc, (((0,), (0,)), ((), ())),
                                preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, nblk, body, 0, unroll=False)

        @pl.when(d == 3)
        def _():
            for ch in range(NCH):
                out_ref[ch, :, :] = acc_ref[ch]

    return kernel


@partial(jax.jit, static_argnames=("P", "radius", "alpha", "order",
                                   "zdim"))
def kb_scatter_3ch(c0, c1, c2, zi, yi, xi, v0, v1, v2,
                   P: int, radius: float, alpha: float, order: int,
                   zdim: int | None = None, z_lo=0):
    """Scatter-add the 4^3 KB footprint of every sample into three flat
    (P^3,) cubes. zi/yi/xi are float voxel coordinates (any shape,
    flattened); v0/v1/v2 the per-sample channel values. Samples whose
    floor() lands outside [0, P) on any axis are dropped (only the
    measure-zero |k| = Nyquist edge at max_freq = 0.5).

    kz-slab mode: with zdim set, the cubes are flat (zdim*P*P,) z-slabs
    whose first plane is the (traced) absolute index z_lo; taps outside
    [z_lo, z_lo+zdim) are masked in-kernel and the tile grid is offset
    by z_lo — each mesh device grids only its own slab with NO stream
    expansion (VERDICT r2 #7)."""
    zi, yi, xi = (a.reshape(-1) for a in (zi, yi, xi))
    v0, v1, v2 = (a.reshape(-1).astype(jnp.float32) for a in (v0, v1, v2))
    z0 = jnp.floor(zi).astype(jnp.int32)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x0 = jnp.floor(xi).astype(jnp.int32)
    valid = ((z0 >= 0) & (z0 < P) & (y0 >= 0) & (y0 < P)
             & (x0 >= 0) & (x0 < P))
    z0c = jnp.clip(z0, 0, P - 1)
    y0c = jnp.clip(y0, 0, P - 1)
    x0c = jnp.clip(x0, 0, P - 1)
    base = (z0c * P + y0c) * P + x0c
    fz = (zi - z0c).astype(jnp.float32)
    fy = (yi - y0c).astype(jnp.float32)
    fx = (xi - x0c).astype(jnp.float32)
    vm = jnp.where(valid, 1.0, 0.0)

    M = base.shape[0]
    # Six stable 2-operand sorts sharing the key instead of argsort + six
    # data-dependent gathers: on the real (near-sorted) gridding streams the
    # gathers cost 144.8 ms/batch vs 12.7 ms for the sorts (measured r5,
    # tools/ablate_config3.py on v5e) — stability keeps every stream aligned
    # to the same tie-break order.
    bs, s_fz = jax.lax.sort([base, fz], num_keys=1)
    _, s_fy = jax.lax.sort([base, fy], num_keys=1)
    _, s_fx = jax.lax.sort([base, fx], num_keys=1)
    _, s_v0 = jax.lax.sort([base, v0 * vm], num_keys=1)
    _, s_v1 = jax.lax.sort([base, v1 * vm], num_keys=1)
    _, s_v2 = jax.lax.sort([base, v2 * vm], num_keys=1)
    streams = [jax.lax.bitcast_convert_type(bs, jnp.float32)] + \
        [s_fz, s_fy, s_fx, s_v0, s_v1, s_v2]
    pad = (-M) % BLK + BLK
    u7 = jnp.stack([jnp.concatenate([st, jnp.zeros((pad,), jnp.float32)])
                    for st in streams])
    u7 = u7.reshape(7, (M + pad) // 128, 128)
    if zdim is None:
        zdim = P
    slab_size = zdim * P * P
    ntiles = slab_size // TILE
    zlo = jnp.asarray(z_lo, jnp.int32).reshape(1)
    tt = jnp.arange(ntiles, dtype=jnp.int32) * TILE + zlo[0] * (P * P)
    # pass d handles dz = d-1; tile t's samples satisfy
    # base + (d-1)P^2 + dy*P + dx in [tT, (t+1)T) for some dy,dx in [-1,2]
    starts = jnp.stack([
        jnp.searchsorted(bs, tt - (d - 1) * P * P - (2 * P + 2))
        for d in range(4)]).astype(jnp.int32)
    ends = jnp.stack([
        jnp.searchsorted(bs, tt + TILE - (d - 1) * P * P + (P + 2))
        for d in range(4)]).astype(jnp.int32)

    poly = _window_poly(radius, alpha, order)
    out = pl.pallas_call(
        _mk_kernel(P, poly, radius * radius, zdim),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=3,
            grid=(ntiles, 4),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((NCH, LO2, HI2),
                                   lambda i, j, *_: (0, i, 0))],
            out_specs=pl.BlockSpec((NCH, LO2, HI2),
                                   lambda i, j, *_: (0, i, 0)),
            scratch_shapes=[pltpu.VMEM((NCH, LO2, HI2), jnp.float32),
                            pltpu.VMEM((2, 7, ROWS, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((NCH, slab_size // HI2, HI2),
                                       jnp.float32),
        input_output_aliases={4: 0},
    )(zlo, starts, ends, u7,
      jnp.stack([c0, c1, c2]).reshape(NCH, slab_size // HI2, HI2))
    out = out.reshape(NCH, slab_size)
    return out[0], out[1], out[2]
