"""Data-parallel Fourier reconstruction over a device mesh.

The TPU replacement for mpi_reconstruct_fourier (SURVEY.md §2.4: per-node
partial Fourier volumes + chunked MPI_Reduce at master,
parallel/mpi_reconstruct_fourier.cpp:325-420): every device backprojects its
particle shard into a local cube, then ONE psum over the ICI mesh axis fuses
them. Deterministic regardless of mesh size (addition order inside a shard is
fixed; cross-shard combination is a tree-reduce of identical partials).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from xmipp3_tpu.core.geometry import euler_matrix
from xmipp3_tpu.ops.reconstruct import backproject_chunk, finalize_volume
from xmipp3_tpu.parallel.mesh import pad_to_multiple, shard_particles


def _ctf_tables(ctfp, sampling, min_ctf, N, max_freq, phase_flipped, B):
    """(B, S) CTF data/weight gridding multipliers, or broadcastable
    (B, 1) ones when --useCTF is off (keeps one shard_map signature)."""
    if ctfp is None:
        one = np.ones((B, 1), np.float32)
        return one, one
    from xmipp3_tpu.ops.reconstruct import ctf_gridding_multipliers
    d, w = ctf_gridding_multipliers(ctfp, sampling, min_ctf, N, max_freq,
                                    phase_flipped)
    return np.asarray(d), np.asarray(w)


def parallel_reconstruct(mesh, imgs, rot, tilt, psi, sx=None, sy=None,
                         weights=None, pad_factor: float = 2.0,
                         sym: str = "c1", max_freq: float = 0.5,
                         axis_name: str = "data", flip=None,
                         interp: str = "kb", niter_weight: int = 1,
                         ctfp=None, sampling: float = 1.0,
                         min_ctf: float = 0.01, phase_flipped: bool = False):
    """Reconstruct a volume with the particle axis sharded over `mesh`.

    imgs: (B, N, N) float32 (padded to a mesh multiple internally).
    ctfp: optional dict of (B,) CTF parameter arrays — enables the
    --useCTF per-frequency gridding inversion (the CTF factor table is
    per-image, so it shards exactly like the images).
    Returns the (N,N,N) volume (replicated)."""
    from xmipp3_tpu.core.sym import SymList

    imgs = np.asarray(imgs, np.float32)
    if flip is not None and np.any(flip):
        # stored flip: shift(img, s) = M_x proj(pose) — backproject the
        # x-mirrored image with negated shiftX (same as the serial
        # FourierReconstructor.add_batch)
        f = np.asarray(flip).astype(bool)
        imgs = np.where(f[:, None, None], imgs[:, :, ::-1], imgs)
        sx = np.zeros(len(imgs), np.float32) if sx is None \
            else np.asarray(sx, np.float32).copy()
        sx[f] = -sx[f]
    B, N, _ = imgs.shape
    n_dev = mesh.shape[axis_name]
    P_ = int(round(N * pad_factor))
    P_ += P_ % 2

    imgs_p, n_valid = pad_to_multiple(imgs, n_dev)
    z = np.zeros(B, np.float32)
    def prep(v, fill=0.0):
        v = z if v is None else np.asarray(v, np.float32)
        return pad_to_multiple(v, n_dev)[0]
    rot_p, tilt_p, psi_p = prep(rot), prep(tilt), prep(psi)
    sx_p, sy_p = prep(sx), prep(sy)
    w = np.ones(B, np.float32) if weights is None else np.asarray(weights,
                                                                  np.float32)
    w_p = pad_to_multiple(w, n_dev)[0]
    w_p[n_valid:] = 0.0          # padded rows contribute nothing

    mats = np.asarray(euler_matrix(rot_p, tilt_p, psi_p), np.float32)
    sym_mats = SymList(sym).sym_matrices()
    cd, cw = _ctf_tables(ctfp, sampling, min_ctf, N, max_freq,
                         phase_flipped, B)
    cd_p = pad_to_multiple(cd, n_dev)[0]
    cw_p = pad_to_multiple(cw, n_dev)[0]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(axis_name), P(axis_name), P(axis_name),
                       P(axis_name), P(axis_name), P(axis_name),
                       P(axis_name)),
             out_specs=(P(), P(), P()))
    def shard_backproject(imgs_l, mats_l, sx_l, sy_l, w_l, cd_l, cw_l):
        dr = jnp.zeros((P_, P_, P_), jnp.float32)
        di = jnp.zeros((P_, P_, P_), jnp.float32)
        dw = jnp.zeros((P_, P_, P_), jnp.float32)
        for S in sym_mats:
            m = jnp.einsum("cij,jk->cik", mats_l,
                           jnp.asarray(S, jnp.float32))
            dr, di, dw = backproject_chunk(dr, di, dw, imgs_l, m, sx_l, sy_l,
                                           w_l, P_, max_freq, interp=interp,
                                           ctf_data=cd_l, ctf_w=cw_l)
        # the MPI_Reduce replacement: one psum over the ICI axis
        dr = jax.lax.psum(dr, axis_name)
        di = jax.lax.psum(di, axis_name)
        dw = jax.lax.psum(dw, axis_name)
        return dr, di, dw

    sh = lambda a: shard_particles(a, mesh, axis_name)
    dr, di, dw = shard_backproject(sh(jnp.asarray(imgs_p)),
                                   sh(jnp.asarray(mats)),
                                   sh(jnp.asarray(sx_p)),
                                   sh(jnp.asarray(sy_p)),
                                   sh(jnp.asarray(w_p)),
                                   sh(jnp.asarray(cd_p)),
                                   sh(jnp.asarray(cw_p)))
    return finalize_volume(dr, di, dw, N, P_, interp=interp,
                           niter_weight=niter_weight)


def parallel_art_correction(mesh, vol, imgs, rot, tilt, psi,
                            pad_factor: float = 2.0, max_freq: float = 0.5,
                            axis_name: str = "data", interp: str = "tri"):
    """One ART block update, data-parallel: project the current volume at
    the block's poses, form residuals, backproject them — all with the
    projection axis sharded over the mesh and ONE psum fusing the partial
    accumulator cubes (the reference distributes ART blocks across MPI
    workers the same way, basic_art.h:92-116 parallel modes).

    Returns (correction volume (N,N,N) np.float32, residual sum of squares,
    max |residual|) — everything art_reconstruct's mode family needs."""
    from xmipp3_tpu.ops.project import (extract_central_slices,
                                        prepare_fourier_volume,
                                        slices_to_projections)

    imgs = np.asarray(imgs, np.float32)
    B, N, _ = imgs.shape
    n_dev = mesh.shape[axis_name]
    P_ = int(round(N * pad_factor))
    P_ += P_ % 2
    imgs_p, n_valid = pad_to_multiple(imgs, n_dev)
    prep = lambda v: pad_to_multiple(np.asarray(v, np.float32), n_dev)[0]
    mats = np.asarray(euler_matrix(prep(rot), prep(tilt), prep(psi)),
                      np.float32)
    w = np.zeros(len(imgs_p), np.float32)
    w[:n_valid] = 1.0

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(axis_name), P(axis_name), P(axis_name)),
             out_specs=(P(), P(), P(), P(), P()))
    def block_step(vol_r, imgs_l, mats_l, w_l):
        vf, _ = prepare_fourier_volume(vol_r, pad_factor)
        proj = slices_to_projections(
            extract_central_slices(vf, mats_l, N), N)
        resid = (imgs_l - proj) * w_l[:, None, None]
        ss = jax.lax.psum((resid ** 2).sum(), axis_name)
        rmax = jax.lax.pmax(jnp.abs(resid).max(), axis_name)
        z = jnp.zeros(imgs_l.shape[0], jnp.float32)
        dr = jnp.zeros((P_, P_, P_), jnp.float32)
        di = jnp.zeros_like(dr)
        dw = jnp.zeros_like(dr)
        dr, di, dw = backproject_chunk(dr, di, dw, resid, mats_l, z, z,
                                       w_l, P_, max_freq, interp=interp)
        return (jax.lax.psum(dr, axis_name), jax.lax.psum(di, axis_name),
                jax.lax.psum(dw, axis_name), ss, rmax)

    sh = lambda a: shard_particles(a, mesh, axis_name)
    dr, di, dw, ss, rmax = block_step(jnp.asarray(vol, jnp.float32),
                                      sh(jnp.asarray(imgs_p)),
                                      sh(jnp.asarray(mats)),
                                      sh(jnp.asarray(w)))
    corr = finalize_volume(dr, di, dw, N, P_, interp=interp)
    return np.asarray(corr), float(ss), float(rmax)


def slab_reconstruct(mesh, imgs, rot, tilt, psi, sx=None, sy=None,
                     weights=None, pad_factor: float = 2.0,
                     max_freq: float = 0.5, axis_name: str = "data",
                     interp: str = "kb", niter_weight: int = 1,
                     ctfp=None, sampling: float = 1.0,
                     min_ctf: float = 0.01, phase_flipped: bool = False):
    """Volume-sharded (kz-slab) reconstruction: each device owns one z-slab
    of the Fourier cube (SURVEY §7 phase 4 — for volumes whose padded cube
    cannot be replicated per chip). Images are replicated; every device
    computes the full tap stream and keeps only the updates that land in
    its slab, so no inter-device communication happens during
    backprojection — the slab boundary mask replaces the reference's
    kz-slab MPI routing. The accumulators come back sharded over z; the
    finalize step (Hermitian symmetrization + inverse FFT) runs under the
    normal jit partitioner, which inserts the needed collectives."""
    imgs = np.asarray(imgs, np.float32)
    B, N, _ = imgs.shape
    n_dev = mesh.shape[axis_name]
    P_ = int(round(N * pad_factor))
    P_ += P_ % 2
    P_ += (-P_) % n_dev                      # slabs must tile the cube
    slab_p = P_ // n_dev
    z = np.zeros(B, np.float32)
    get = lambda v: z if v is None else np.asarray(v, np.float32)
    mats = jnp.asarray(np.asarray(
        euler_matrix(get(rot), get(tilt), get(psi)), np.float32))
    w = jnp.asarray(np.ones(B, np.float32) if weights is None
                    else np.asarray(weights, np.float32))
    sx_a, sy_a = jnp.asarray(get(sx)), jnp.asarray(get(sy))
    imgs_a = jnp.asarray(imgs)
    cd, cw_t = _ctf_tables(ctfp, sampling, min_ctf, N, max_freq,
                           phase_flipped, B)

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(), P(), P(), P(), P(), P(), P()),
             out_specs=(P(axis_name), P(axis_name), P(axis_name)))
    def slab_backproject(imgs_r, mats_r, sx_r, sy_r, w_r, cd_r, cw_r):
        dev = jax.lax.axis_index(axis_name)
        z0 = dev * slab_p
        dr = jnp.zeros((slab_p, P_, P_), jnp.float32)
        di = jnp.zeros((slab_p, P_, P_), jnp.float32)
        dw = jnp.zeros((slab_p, P_, P_), jnp.float32)
        return backproject_chunk(dr, di, dw, imgs_r, mats_r, sx_r, sy_r,
                                 w_r, P_, max_freq, slab_p=slab_p,
                                 slab_z0=z0, interp=interp,
                                 ctf_data=cd_r, ctf_w=cw_r)

    dr, di, dw = slab_backproject(imgs_a, mats, sx_a, sy_a, w,
                                  jnp.asarray(cd), jnp.asarray(cw_t))
    # dr/di/dw are (P,P,P) arrays sharded over z; finalize under jit
    # (the tri+kb dense convolution and Hermitian mirror cross slab
    # boundaries; the jit partitioner inserts the needed collectives)
    return finalize_volume(dr, di, dw, N, P_, interp=interp,
                           niter_weight=niter_weight)


def slab_reconstruct_2d(mesh, imgs, rot, tilt, psi, sx=None, sy=None,
                        weights=None, pad_factor: float = 2.0,
                        max_freq: float = 0.5, data_axis: str = "data",
                        z_axis: str = "z", interp: str = "kb",
                        niter_weight: int = 1,
                        ctfp=None, sampling: float = 1.0,
                        min_ctf: float = 0.01, phase_flipped: bool = False):
    """dp x slab 2-D-mesh reconstruction: the particle axis is sharded
    over `data_axis` AND the Fourier cube over `z_axis` (VERDICT r3 #4 /
    reference mpi_reconstruct_fourier.cpp:325-420 semantics — nodes shard
    images and reduce kz-slabs).  Each device backprojects only ITS image
    shard into ITS z-slab; ONE psum along the data axis fuses the image
    shards, so per-device compute shrinks with the data-axis size at
    fixed slab memory (plain slab_reconstruct replicates the image work
    on every device).

    mesh must carry both axes (e.g. Mesh(devices.reshape(4, 2),
    ("data", "z")))."""
    imgs = np.asarray(imgs, np.float32)
    B, N, _ = imgs.shape
    n_data = mesh.shape[data_axis]
    n_z = mesh.shape[z_axis]
    P_ = int(round(N * pad_factor))
    P_ += P_ % 2
    P_ += (-P_) % n_z                        # slabs must tile the cube
    slab_p = P_ // n_z

    imgs_p, n_valid = pad_to_multiple(imgs, n_data)
    z = np.zeros(B, np.float32)
    get = lambda v: z if v is None else np.asarray(v, np.float32)
    rot_p = pad_to_multiple(get(rot), n_data)[0]
    tilt_p = pad_to_multiple(get(tilt), n_data)[0]
    psi_p = pad_to_multiple(get(psi), n_data)[0]
    sx_p = pad_to_multiple(get(sx), n_data)[0]
    sy_p = pad_to_multiple(get(sy), n_data)[0]
    w = np.ones(B, np.float32) if weights is None \
        else np.asarray(weights, np.float32)
    w_p = pad_to_multiple(w, n_data)[0]
    w_p[n_valid:] = 0.0
    mats = np.asarray(euler_matrix(rot_p, tilt_p, psi_p), np.float32)
    cd, cw = _ctf_tables(ctfp, sampling, min_ctf, N, max_freq,
                         phase_flipped, B)
    cd_p = pad_to_multiple(cd, n_data)[0]
    cw_p = pad_to_multiple(cw, n_data)[0]

    @partial(jax.shard_map, mesh=mesh,
             in_specs=(P(data_axis), P(data_axis), P(data_axis),
                       P(data_axis), P(data_axis), P(data_axis),
                       P(data_axis)),
             out_specs=(P(z_axis), P(z_axis), P(z_axis)))
    def shard_backproject(imgs_l, mats_l, sx_l, sy_l, w_l, cd_l, cw_l):
        dev_z = jax.lax.axis_index(z_axis)
        z0 = dev_z * slab_p
        dr = jnp.zeros((slab_p, P_, P_), jnp.float32)
        di = jnp.zeros((slab_p, P_, P_), jnp.float32)
        dw = jnp.zeros((slab_p, P_, P_), jnp.float32)
        dr, di, dw = backproject_chunk(dr, di, dw, imgs_l, mats_l,
                                       sx_l, sy_l, w_l, P_, max_freq,
                                       slab_p=slab_p, slab_z0=z0,
                                       interp=interp,
                                       ctf_data=cd_l, ctf_w=cw_l)
        # fuse the image shards; the z axis stays sharded
        return (jax.lax.psum(dr, data_axis),
                jax.lax.psum(di, data_axis),
                jax.lax.psum(dw, data_axis))

    dr, di, dw = shard_backproject(jnp.asarray(imgs_p), jnp.asarray(mats),
                                   jnp.asarray(sx_p), jnp.asarray(sy_p),
                                   jnp.asarray(w_p), jnp.asarray(cd_p),
                                   jnp.asarray(cw_p))
    # accumulators sharded over z; finalize under jit (partitioner inserts
    # the collectives the tri+kb convolution and Hermitian mirror need)
    return finalize_volume(dr, di, dw, N, P_, interp=interp,
                           niter_weight=niter_weight)
