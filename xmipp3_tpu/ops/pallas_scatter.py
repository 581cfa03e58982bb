"""Sorted scatter-add Pallas kernel — the gridding-backprojection hot sink.

XLA's scatter-add on TPU processes ~90 M updates/s regardless of input
order (measured; it serializes random read-modify-writes). This kernel
replaces it for the 3-channel cube accumulation of ops.reconstruct
(real, imag, weight share one index stream — reference
cuda_gpu_reconstruct_fourier.cpp:500-660 solves the same problem with
atomicAdd):

1. lax.sort the update stream by flat target index (XLA radix-ish sort,
   ~140 M updates/s — now the dominant cost).
2. searchsorted the tile boundaries -> per-tile contiguous segments.
3. One grid step per output tile of TILE = LO2*HI2 cells. Each step
   double-buffer-DMAs its (block-aligned) segment, transposes updates to
   sublane-major, builds two one-hot factors (local // HI2 over LO2
   lanes, local % HI2 over HI2 lanes) and accumulates with MXU
   lhsT-matmuls: acc(LO2,HI2) += onehot_lo^T . (onehot_hi * value).
   Updates pulled in by block alignment that belong to neighboring tiles
   fail the 0 <= local < TILE check and contribute zero.

Measured on v5e: 13 M updates x 3 channels in ~116 ms end-to-end
(sort included) vs ~430 ms for sort+XLA-scatter and ~450 ms for plain
XLA scatter -> ~3.9x. Kernel alone ~23 ms (~560 M updates/s/channel).

Falls back to jnp .at[].add on non-TPU platforms (CPU tests, interpret).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

LO2 = 128
HI2 = 64
TILE = LO2 * HI2          # output cells per grid step; local = lo2*HI2 + hi2
BLK = 1024                # updates per DMA block (8 sublane-rows of 128)
ROWS = BLK // 128
NCH = 3


def _seg_kernel(starts_ref, idx_hbm, v3_hbm, cube_ref, out_ref,
                acc_ref, idx_buf, v3_buf, sem_i, sem_v):
    t = pl.program_id(0)
    base = t * TILE
    s = starts_ref[t]
    e = starts_ref[t + 1]
    acc_ref[:] = cube_ref[:, :, :]          # accumulate into the prior cube
    b0 = jax.lax.div(s, BLK)
    nblk = pl.cdiv(e, BLK) - b0

    def start_copy(slot, b):
        row0 = (b0 + b) * ROWS
        pltpu.make_async_copy(idx_hbm.at[pl.ds(row0, ROWS), :],
                              idx_buf.at[slot], sem_i.at[slot]).start()
        pltpu.make_async_copy(v3_hbm.at[:, pl.ds(row0, ROWS), :],
                              v3_buf.at[slot], sem_v.at[slot]).start()

    @pl.when(nblk > 0)
    def _():
        start_copy(0, 0)

        def body(b, _):
            slot = jax.lax.rem(b, 2)
            row0 = (b0 + b) * ROWS

            @pl.when(b + 1 < nblk)
            def _():
                start_copy(1 - slot, b + 1)

            pltpu.make_async_copy(idx_hbm.at[pl.ds(row0, ROWS), :],
                                  idx_buf.at[slot], sem_i.at[slot]).wait()
            pltpu.make_async_copy(v3_hbm.at[:, pl.ds(row0, ROWS), :],
                                  v3_buf.at[slot], sem_v.at[slot]).wait()
            ti = jnp.transpose(idx_buf[slot], (1, 0))        # (128, ROWS)
            local = ti - base
            validf = jnp.where((local >= 0) & (local < TILE), 1.0, 0.0)
            lo2 = jax.lax.div(local, HI2)
            hi2 = jax.lax.rem(local, HI2)
            tv = [jnp.transpose(v3_buf[slot, c], (1, 0)) * validf
                  for c in range(NCH)]
            A_parts = []
            B_parts = [[] for _ in range(NCH)]
            for r in range(ROWS):
                A_parts.append(jnp.where(
                    lo2[:, r:r + 1] == jax.lax.broadcasted_iota(
                        jnp.int32, (128, LO2), 1), validf[:, r:r + 1], 0.0))
                ohhi = jnp.where(
                    hi2[:, r:r + 1] == jax.lax.broadcasted_iota(
                        jnp.int32, (128, HI2), 1), 1.0, 0.0)
                for c in range(NCH):
                    B_parts[c].append(ohhi * tv[c][:, r:r + 1])
            A = jnp.concatenate(A_parts, axis=0)             # (BLK, LO2)
            for c in range(NCH):
                Bc = jnp.concatenate(B_parts[c], axis=0)     # (BLK, HI2)
                acc_ref[c, :, :] += jax.lax.dot_general(
                    A, Bc, (((0,), (0,)), ((), ())),
                    preferred_element_type=jnp.float32)
            return 0

        jax.lax.fori_loop(0, nblk, body, 0, unroll=False)

    for c in range(NCH):
        out_ref[c, :, :] = acc_ref[c]


def _pallas_scatter3(cube3, idx, v0, v1, v2, size_padded: int):
    """cube3: (NCH, size_padded) f32; returns cube3 with updates added."""
    M = idx.shape[0]
    # Three stable 2-operand sorts sharing the key instead of one
    # 4-operand sort: stability makes the tie-break order identical, so
    # the channels stay aligned — and 2-op sorts hit a fast path
    # (measured 318 M rows/s vs a pathological multi-operand comparator
    # path; /tmp-bench r3, 13M near-sorted rows: 41 ms vs 77 s).
    i2, a = jax.lax.sort([idx, v0], num_keys=1)
    _, b = jax.lax.sort([idx, v1], num_keys=1)
    _, c = jax.lax.sort([idx, v2], num_keys=1)
    pad = (-M) % BLK + BLK
    i2p = jnp.concatenate([i2, jnp.full((pad,), size_padded + TILE,
                                        jnp.int32)])
    v3 = jnp.stack([a, b, c], axis=0)
    v3 = jnp.concatenate([v3, jnp.zeros((NCH, pad), jnp.float32)], axis=1)
    Mp = M + pad
    i2m = i2p.reshape(Mp // 128, 128)
    v3m = v3.reshape(NCH, Mp // 128, 128)
    ntiles = size_padded // TILE
    bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * TILE
    starts = jnp.searchsorted(i2, bounds).astype(jnp.int32)
    out = pl.pallas_call(
        _seg_kernel,
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((NCH, LO2, HI2), lambda i, *_: (0, i, 0))],
            out_specs=pl.BlockSpec((NCH, LO2, HI2), lambda i, *_: (0, i, 0)),
            scratch_shapes=[pltpu.VMEM((NCH, LO2, HI2), jnp.float32),
                            pltpu.VMEM((2, ROWS, 128), jnp.int32),
                            pltpu.VMEM((2, NCH, ROWS, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((NCH, size_padded // HI2, HI2),
                                       jnp.float32),
        input_output_aliases={3: 0},
    )(starts, i2m, v3m, cube3.reshape(NCH, size_padded // HI2, HI2))
    return out.reshape(NCH, size_padded)


def scatter_add_3ch(c0, c1, c2, idx, v0, v1, v2, use_pallas: bool | None
                    = None):
    """3-channel shared-index scatter-add: c*_flat[idx] += v*.

    c0/c1/c2: flat (S,) float32 accumulators (same shape); idx int32 with
    out-of-range values allowed for the pallas path only if < padded
    sentinel — callers clip and zero-weight instead (same contract as the
    XLA path). Returns the three updated accumulators.

    use_pallas: None = auto (TPU only). The pallas path sorts the stream
    and runs the tiled one-hot MXU kernel (module docstring); ~4x the XLA
    scatter throughput at 13 M updates."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    S = c0.shape[0]
    if use_pallas and S >= TILE and S % HI2 == 0:
        pad_s = (-S) % TILE
        cube3 = jnp.stack([c0, c1, c2], axis=0)
        if pad_s:
            cube3 = jnp.concatenate(
                [cube3, jnp.zeros((NCH, pad_s), jnp.float32)], axis=1)
        out = _pallas_scatter3(cube3, idx, v0, v1, v2, S + pad_s)
        return out[0, :S], out[1, :S], out[2, :S]
    c0 = c0.at[idx].add(v0)
    c1 = c1.at[idx].add(v1)
    c2 = c2.at[idx].add(v2)
    return c0, c1, c2


# ---------------------------------------------------------------------------
# Multi-stream variant: N pre-sorted update streams per tile (the round-3
# sort-bound fix). The backprojection sorts only the RAW samples (1/8 of
# the stream) and expands the 8 trilinear taps AFTER the sort — each tap
# stream is the sorted base plus a constant offset, hence itself sorted.
# The kernel walks 8 (stream, segment) chains per tile with the same
# double-buffered one-hot MXU accumulation. Out-of-volume taps keep their
# unclipped (monotone) index but carry value 0, so mis-binned adds are
# exact no-ops. Measured v5e: batch sort 70 ms -> 10 ms; see BENCH_r03.
# ---------------------------------------------------------------------------

def _seg_kernel_multi(starts_ref, idx_hbm, v3_hbm, cube_ref, out_ref,
                      acc_ref, idx_buf, v3_buf, sem_i, sem_v,
                      *, nstreams: int):
    t = pl.program_id(0)
    base = t * TILE
    acc_ref[:] = cube_ref[:, :, :]

    for s in range(nstreams):
        st = starts_ref[s, t]
        e = starts_ref[s, t + 1]
        b0 = jax.lax.div(st, BLK)
        nblk = pl.cdiv(e, BLK) - b0

        def start_copy(slot, b, b0=b0, s=s):
            row0 = (b0 + b) * ROWS
            pltpu.make_async_copy(idx_hbm.at[s, pl.ds(row0, ROWS), :],
                                  idx_buf.at[slot], sem_i.at[slot]).start()
            pltpu.make_async_copy(v3_hbm.at[s, :, pl.ds(row0, ROWS), :],
                                  v3_buf.at[slot], sem_v.at[slot]).start()

        @pl.when(nblk > 0)
        def _(nblk=nblk, b0=b0, s=s, start_copy=start_copy):
            start_copy(0, 0)

            def body(b, _):
                slot = jax.lax.rem(b, 2)

                @pl.when(b + 1 < nblk)
                def _():
                    start_copy(1 - slot, b + 1)

                pltpu.make_async_copy(
                    idx_hbm.at[s, pl.ds((b0 + b) * ROWS, ROWS), :],
                    idx_buf.at[slot], sem_i.at[slot]).wait()
                pltpu.make_async_copy(
                    v3_hbm.at[s, :, pl.ds((b0 + b) * ROWS, ROWS), :],
                    v3_buf.at[slot], sem_v.at[slot]).wait()
                ti = jnp.transpose(idx_buf[slot], (1, 0))
                local = ti - base
                validf = jnp.where((local >= 0) & (local < TILE), 1.0, 0.0)
                lo2 = jax.lax.div(local, HI2)
                hi2 = jax.lax.rem(local, HI2)
                tv = [jnp.transpose(v3_buf[slot, c], (1, 0)) * validf
                      for c in range(NCH)]
                A_parts = []
                B_parts = [[] for _ in range(NCH)]
                for r in range(ROWS):
                    A_parts.append(jnp.where(
                        lo2[:, r:r + 1] == jax.lax.broadcasted_iota(
                            jnp.int32, (128, LO2), 1),
                        validf[:, r:r + 1], 0.0))
                    ohhi = jnp.where(
                        hi2[:, r:r + 1] == jax.lax.broadcasted_iota(
                            jnp.int32, (128, HI2), 1), 1.0, 0.0)
                    for c in range(NCH):
                        B_parts[c].append(ohhi * tv[c][:, r:r + 1])
                A = jnp.concatenate(A_parts, axis=0)
                for c in range(NCH):
                    Bc = jnp.concatenate(B_parts[c], axis=0)
                    acc_ref[c, :, :] += jax.lax.dot_general(
                        A, Bc, (((0,), (0,)), ((), ())),
                        preferred_element_type=jnp.float32)
                return 0

            jax.lax.fori_loop(0, nblk, body, 0, unroll=False)

    for c in range(NCH):
        out_ref[c, :, :] = acc_ref[c]


def scatter_add_3ch_streams(c0, c1, c2, idx_streams, v_streams,
                            use_pallas: bool | None = None):
    """Multi-stream scatter-add: each stream s has SORTED int32 indices
    idx_streams[s] (same length) and NCH value arrays v_streams[s]
    (tuple of 3). Out-of-range indices must carry zero values (they may
    be binned into padding cells, whose content is discarded).

    Falls back to per-stream jnp scatter-adds off-TPU."""
    if use_pallas is None:
        use_pallas = jax.default_backend() == "tpu"
    S = c0.shape[0]
    nstreams = len(idx_streams)
    if not use_pallas:
        for s in range(nstreams):
            v0, v1, v2 = v_streams[s]
            i = jnp.clip(idx_streams[s], 0, S - 1)
            c0 = c0.at[i].add(v0)
            c1 = c1.at[i].add(v1)
            c2 = c2.at[i].add(v2)
        return c0, c1, c2

    # pad cube so every (possibly mis-binned) index lands inside
    max_extra = TILE
    pad_s = (-(S + max_extra)) % TILE + max_extra
    size_padded = S + pad_s
    cube3 = jnp.stack([c0, c1, c2], axis=0)
    cube3 = jnp.concatenate(
        [cube3, jnp.zeros((NCH, pad_s), jnp.float32)], axis=1)

    M = idx_streams[0].shape[0]
    pad = (-M) % BLK + BLK
    sentinel = size_padded + TILE
    idx8 = jnp.stack([
        jnp.concatenate([i, jnp.full((pad,), sentinel, jnp.int32)])
        for i in idx_streams])                        # (ns, Mp)
    v8 = jnp.stack([
        jnp.concatenate([jnp.stack(v, axis=0),
                         jnp.zeros((NCH, pad), jnp.float32)], axis=1)
        for v in v_streams])                          # (ns, NCH, Mp)
    Mp = M + pad
    ntiles = size_padded // TILE
    bounds = jnp.arange(ntiles + 1, dtype=jnp.int32) * TILE
    starts = jax.vmap(lambda i: jnp.searchsorted(i, bounds).astype(
        jnp.int32))(idx8)                             # (ns, ntiles+1)

    out = pl.pallas_call(
        partial(_seg_kernel_multi, nstreams=nstreams),
        grid_spec=pltpu.PrefetchScalarGridSpec(
            num_scalar_prefetch=1,
            grid=(ntiles,),
            in_specs=[pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec(memory_space=pl.ANY),
                      pl.BlockSpec((NCH, LO2, HI2), lambda i, *_: (0, i, 0))],
            out_specs=pl.BlockSpec((NCH, LO2, HI2), lambda i, *_: (0, i, 0)),
            scratch_shapes=[pltpu.VMEM((NCH, LO2, HI2), jnp.float32),
                            pltpu.VMEM((2, ROWS, 128), jnp.int32),
                            pltpu.VMEM((2, NCH, ROWS, 128), jnp.float32),
                            pltpu.SemaphoreType.DMA((2,)),
                            pltpu.SemaphoreType.DMA((2,))],
        ),
        out_shape=jax.ShapeDtypeStruct((NCH, size_padded // HI2, HI2),
                                       jnp.float32),
        input_output_aliases={3: 0},
    )(starts, idx8.reshape(nstreams, Mp // 128, 128),
      v8.reshape(nstreams, NCH, Mp // 128, 128),
      cube3.reshape(NCH, size_padded // HI2, HI2))
    out = out.reshape(NCH, size_padded)
    return out[0, :S], out[1, :S], out[2, :S]
