"""Packed-channel trilinear scatter kernel — round-3 redesign of the
gridding-backprojection hot sink (the tri/tri+kb path of
ops/reconstruct.py; the reference solves the same problem with CUDA
atomicAdd, cuda_gpu_reconstruct_fourier.cpp:500-660).

Design (what profiling on v5e dictated):

1. Sort only the RAW samples (1/8 of the update stream; 7-operand stable
   sort ~14 ms/batch vs ~70 ms for the expanded stream). The 4 in-plane
   (dy, dx) taps expand AFTER the sort, sample-major, so the row stream
   stays sorted up to a +-(P+1)-cell window.
2. The two dz taps do NOT get their own streams or passes: with
   TILE = 4096 dividing P^2, a row whose dz=0 tap lands in tile t has its
   dz=1 tap in exactly tile t + LAG (LAG = P^2/TILE) at the SAME local
   cell offset. Each grid step t streams its rows ONCE, accumulates the
   (1-fz)-weighted dot into tile t and the fz-weighted dot into a pending
   ring slot consumed by step t + LAG. Rows are streamed exactly once —
   the per-(tile,pass) chain-restart latency that dominated the 2-pass
   variant (6.6k chains x ~7 us/batch) is gone.
3. ONE MXU dot per (block, z-side): the 3 channels pack into 96 of the
   128 B lanes (HI2 = 32 cells x 3 channels) — kernel cost ~
   2 x raw-rows instead of the old 3 dots x 8-expanded rows.
4. Cross-step prefetch: each step issues the next step's first block
   after its own loop (conditionally on the next step being non-empty,
   keeping semaphore pairing exact), so chain restarts overlap the
   accumulator writeback.

The accumulator cube lives in the packed (ntiles, 128, 96) layout across
ALL batches (packed_cube_alloc/pack/unpack); out-of-volume taps keep
their monotone unclipped index with value 0 or land in the cube's
padding tiles, so no clipping is needed anywhere.

Precision: the one-hot dots run at the MXU's native mixed precision
(bf16-grade mantissas, f32 accumulate) — same as the round-2 kernels;
parity with the XLA scatter path is ~2e-3 max-rel on random data, inside
the 1e-3-of-max gold tolerance used by the reconstruction tests.

Mosaic notes honored (round-2 lessons): one-hot factors contracted with
lhsT dot_general; B built by lane concatenation (offset scratch writes
hit a slow shuffle path); updates kept sublane-major via 32-bit
transposes; HBM row slices block-aligned with foreign rows masked by the
in-tile range check.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO2 = 128
HI2 = 32
TILE = LO2 * HI2          # 4096 cells per tile; must divide P^2
BLK = 1024
ROWS = BLK // 128
NCH = 3


def _tri_kernel(lo_ref, hi_ref, idx_hbm, val_hbm, cube_ref, out_ref,
                acc_ref, acc2_ref, pend_ref, idx_buf, val_buf, sem_i, sem_v,
                *, lag: int, ntiles: int):
    t = pl.program_id(0)
    base = t * TILE
    lo = lo_ref[t]
    hi = hi_ref[t]
    b0 = jax.lax.div(lo, BLK)
    nblk = jnp.where(hi > lo, pl.cdiv(hi, BLK) - b0, 0)
    pslot = jax.lax.rem(t, lag)

    def issue(slot, row0):
        pltpu.make_async_copy(idx_hbm.at[pl.ds(row0, ROWS), :],
                              idx_buf.at[slot], sem_i.at[slot]).start()
        pltpu.make_async_copy(val_hbm.at[pl.ds(row0, ROWS), :, :],
                              val_buf.at[slot], sem_v.at[slot]).start()

    @pl.when((t == 0) & (nblk > 0))
    def _():
        issue(0, b0 * ROWS)

    # consume this tile's pending dz=1 partial (ring not yet written for
    # the first lag steps), then hand the slot to tile t + lag
    pend_t = pend_ref[pl.ds(pslot, 1), :, :][0]
    acc_ref[:] = cube_ref[0] + jnp.where(t >= lag, pend_t, 0.0)
    acc2_ref[:] = jnp.zeros((LO2, NCH * HI2), jnp.float32)

    def body(b, _):
        slot = jax.lax.rem(b, 2)

        @pl.when(b + 1 < nblk)
        def _():
            issue(1 - slot, (b0 + b + 1) * ROWS)

        pltpu.make_async_copy(idx_hbm.at[pl.ds((b0 + b) * ROWS, ROWS), :],
                              idx_buf.at[slot], sem_i.at[slot]).wait()
        pltpu.make_async_copy(val_hbm.at[pl.ds((b0 + b) * ROWS, ROWS), :, :],
                              val_buf.at[slot], sem_v.at[slot]).wait()
        ti = jnp.transpose(idx_buf[slot], (1, 0))            # (128, ROWS)
        local = ti - base
        validf = jnp.where((local >= 0) & (local < TILE), 1.0, 0.0)
        lo2 = jax.lax.div(local, HI2)
        hi2 = jax.lax.rem(local, HI2)
        zf = jnp.transpose(val_buf[slot, :, 0, :], (1, 0))
        tv = [jnp.transpose(val_buf[slot, :, 1 + c, :], (1, 0)) * validf
              for c in range(NCH)]
        A_parts = []
        OHV_parts = []
        B0_parts = []
        for r in range(ROWS):
            A_parts.append(jnp.where(
                lo2[:, r:r + 1] == jax.lax.broadcasted_iota(
                    jnp.int32, (128, LO2), 1), validf[:, r:r + 1], 0.0))
            oh = jnp.where(
                hi2[:, r:r + 1] == jax.lax.broadcasted_iota(
                    jnp.int32, (128, HI2), 1), 1.0, 0.0)
            ohv = jnp.concatenate(
                [oh * tv[c][:, r:r + 1] for c in range(NCH)], axis=1)
            OHV_parts.append(ohv)
            B0_parts.append(ohv * (1.0 - zf[:, r:r + 1]))
        A = jnp.concatenate(A_parts, axis=0)                 # (BLK, LO2)
        OHV = jnp.concatenate(OHV_parts, axis=0)             # (BLK, 96)
        B0 = jnp.concatenate(B0_parts, axis=0)
        acc_ref[:, :] += jax.lax.dot_general(
            A, B0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        acc2_ref[:, :] += jax.lax.dot_general(
            A, OHV - B0, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        return 0

    jax.lax.fori_loop(0, nblk, body, 0, unroll=False)
    # hand this step's dz=1 partial to tile t+lag (ONE dynamic-slice
    # update per step — keeping it out of the block loop mattered)
    pend_ref[pl.ds(pslot, 1), :, :] = acc2_ref[:][None]

    # cross-step prefetch: next step's first block (iff it will run a loop
    # — conditional issue keeps every semaphore signal paired with a wait)
    @pl.when(t + 1 < ntiles)
    def _():
        nlo = lo_ref[t + 1]
        nhi = hi_ref[t + 1]

        @pl.when(nhi > nlo)
        def _():
            issue(0, jax.lax.div(nlo, BLK) * ROWS)

    out_ref[0] = acc_ref[:]


def tri_fastpath_ok(P: int) -> bool:
    """The packed kernel requires TILE | P^2 (whole-tile dz lag)."""
    return P * P % TILE == 0 and P * P // TILE >= 1


def packed_cube_alloc(P: int):
    """Packed accumulator for a P^3 cube + one dz-lag of overflow padding:
    (ntiles, LO2, NCH*HI2) zeros. Cell (c, flat) lives at
    [flat // TILE, (flat % TILE) // HI2, c*HI2 + flat % HI2]."""
    S = P * P * P + 2 * P * P
    ntiles = -(-S // TILE)
    return jnp.zeros((ntiles, LO2, NCH * HI2), jnp.float32)


def packed_cube_pack(cubes3, P: int):
    """(3, P, P, P) -> the packed accumulator layout."""
    ntiles = packed_cube_alloc(P).shape[0]
    flat = jnp.asarray(cubes3, jnp.float32).reshape(NCH, -1)
    pad = ntiles * TILE - flat.shape[1]
    flat = jnp.concatenate(
        [flat, jnp.zeros((NCH, pad), jnp.float32)], axis=1)
    return flat.reshape(NCH, ntiles, LO2, HI2).transpose(1, 2, 0, 3) \
        .reshape(ntiles, LO2, NCH * HI2)


def packed_cube_unpack(packed, P: int):
    """Packed accumulator -> (3, P, P, P)."""
    ntiles = packed.shape[0]
    chans = packed.reshape(ntiles, LO2, NCH, HI2).transpose(2, 0, 1, 3)
    flat = chans.reshape(NCH, ntiles * TILE)
    return flat[:, :P * P * P].reshape(NCH, P, P, P)


@partial(jax.jit, static_argnames=("P",))
def tri_scatter_packed(packed, base_sorted, fz, fy, fx, vr, vi, vw, P: int):
    """Accumulate one sorted sample batch into the packed cube.

    base_sorted: (M,) int32 SORTED flat indices ((z*P + y)*P + x, floor
    corners, no clipping); fz/fy/fx: fractional offsets; vr/vi/vw: sample
    values (real, imag, weight), all permuted by the same stable sort."""
    M = base_sorted.shape[0]
    p2 = P * P
    assert p2 % TILE == 0, "tri fast path needs P^2 % 4096 == 0"
    lag = p2 // TILE
    ntiles = packed.shape[0]

    # 4 in-plane taps, sample-major interleave (stream sorted to +-(P+1))
    wy0 = 1.0 - fy
    wx0 = 1.0 - fx
    y_ok1 = ((base_sorted // P) % P) < P - 1
    x_ok1 = (base_sorted % P) < P - 1
    w4 = jnp.stack([wy0 * wx0,
                    jnp.where(x_ok1, wy0 * fx, 0.0),
                    jnp.where(y_ok1, fy * wx0, 0.0),
                    jnp.where(y_ok1 & x_ok1, fy * fx, 0.0)], axis=1)
    off4 = jnp.asarray(np.array([0, 1, P, P + 1], np.int32))
    idx4 = (base_sorted[:, None] + off4[None, :]).reshape(-1)
    fz4 = jnp.repeat(fz, 4)
    v3 = jnp.stack([(w4 * vr[:, None]).reshape(-1),
                    (w4 * vi[:, None]).reshape(-1),
                    (w4 * vw[:, None]).reshape(-1)], axis=0)

    M4 = 4 * M
    pad = (-M4) % BLK + 2 * BLK
    sentinel = jnp.int32(ntiles * TILE + TILE)
    idx4 = jnp.concatenate([idx4, jnp.full((pad,), sentinel, jnp.int32)])
    fz4 = jnp.concatenate([fz4, jnp.zeros((pad,), jnp.float32)])
    v3 = jnp.concatenate([v3, jnp.zeros((NCH, pad), jnp.float32)], axis=1)
    Mp = M4 + pad
    vals = jnp.stack([fz4.reshape(Mp // 128, 128),
                      v3[0].reshape(Mp // 128, 128),
                      v3[1].reshape(Mp // 128, 128),
                      v3[2].reshape(Mp // 128, 128)], axis=1)

    # tile t streams rows [lo[t], hi[t]): samples whose dz=0 taps can land
    # in [t*TILE, (t+1)*TILE) — base in [t*TILE - (P+1), (t+1)*TILE)
    tb = jnp.arange(ntiles + 1, dtype=jnp.int32) * TILE
    lo = (4 * jnp.searchsorted(base_sorted, tb - (P + 1))).astype(jnp.int32)
    hi = (4 * jnp.searchsorted(base_sorted, tb[1:])).astype(jnp.int32)
    lo_arr = lo[:ntiles + 1]
    hi_arr = jnp.concatenate([hi, jnp.zeros((1,), jnp.int32)])[:ntiles + 1]

    out = pl.pallas_call(
        partial(_tri_kernel, lag=lag, ntiles=ntiles),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=2,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((1, LO2, NCH * HI2),
                                   lambda i, *_: (i, 0, 0))],
            out_specs=pl.BlockSpec((1, LO2, NCH * HI2),
                                   lambda i, *_: (i, 0, 0)),
            scratch_shapes=[pltpu.VMEM((LO2, NCH * HI2), jnp.float32),
                            pltpu.VMEM((LO2, NCH * HI2), jnp.float32),
                            pltpu.VMEM((lag, LO2, NCH * HI2), jnp.float32),
                            pltpu.VMEM((2, ROWS, 128), jnp.int32),
                            pltpu.VMEM((2, ROWS, 4, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((ntiles, LO2, NCH * HI2),
                                       jnp.float32),
        input_output_aliases={4: 0},
    )(lo_arr, hi_arr, idx4.reshape(Mp // 128, 128), vals, packed)
    return out
