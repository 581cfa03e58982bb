"""Data-parallel gallery matching over a device mesh.

Replaces BasicMpiMetadataProgram work-dealing for the matching path
(SURVEY.md §2.4): particles shard over the "data" axis, the gallery is
replicated; results are fixed-shape arrays gathered implicitly by the output
sharding (the all_gather equivalent of the reference's gatherMetadatas).
"""
from __future__ import annotations

import jax
import jax.numpy as jnp
import numpy as np
from jax.sharding import NamedSharding, PartitionSpec as P

from xmipp3_tpu.ops.match import (_scan_trials, _trial_shift_grid,
                                  match_to_gallery, refine_winners)
from xmipp3_tpu.parallel.mesh import pad_to_multiple, replicate, shard_particles


def parallel_match(mesh, refs, imgs, max_shift: int = 8, radius_min: int = 2,
                   radius_max: int | None = None, check_mirror: bool = True,
                   axis_name: str = "data"):
    """match_to_gallery with the particle axis sharded over the mesh.

    Being a pure batch computation, data parallelism is expressed by input
    shardings alone — XLA partitions the whole pipeline (polar gathers, ring
    einsum, FFTs) with no collectives until results are fetched."""
    refs = np.asarray(refs, np.float32)
    imgs = np.asarray(imgs, np.float32)
    n_dev = mesh.shape[axis_name]
    imgs_p, n_valid = pad_to_multiple(imgs, n_dev)
    H = imgs.shape[-1]
    if radius_max is None:
        radius_max = H // 2 - 2

    refs_d = replicate(jnp.asarray(refs), mesh)
    imgs_d = shard_particles(jnp.asarray(imgs_p), mesh, axis_name)
    trials = tuple(map(tuple, _trial_shift_grid(max_shift)
                       .astype(float).tolist()))

    peak, psi, ref, trial, flip = _scan_trials(
        refs_d, imgs_d, trials, radius_min, radius_max, check_mirror)
    out = {k: np.asarray(v)[:n_valid] for k, v in
           dict(peak=peak, psi=psi, ref_idx=ref, trial=trial,
                flip=flip).items()}
    return out


def parallel_match_full(mesh, refs, imgs, max_shift: int = 8,
                        radius_min: int = 2, radius_max: int | None = None,
                        refine_iters: int = 2, check_mirror: bool = True,
                        axis_name: str = "data", allowed=None,
                        psi_allow=None, n_orientations: int = 1,
                        trial_step=None):
    """Full gallery match (coarse 5-D scan + winner refinement) with the
    particle axis sharded over the mesh — the dp engine behind the CLI
    `--mesh dp` flag (the reference's BasicMpiMetadataProgram work-dealing,
    parallel/xmipp_mpi.h:222-272). Data parallelism is expressed purely by
    input shardings; XLA partitions the whole jitted pipeline.

    allowed (B, R) candidate masks, psi_allow (B, A) in-plane masks and
    n_orientations top-N tracking shard along with the particle axis —
    the discrete-assign / assignment-mag / neighborhood paths run dp too
    (VERDICT r3 #8)."""
    refs = np.asarray(refs, np.float32)
    imgs = np.asarray(imgs, np.float32)
    n_dev = mesh.shape[axis_name]
    imgs_p, n_valid = pad_to_multiple(imgs, n_dev)
    H = imgs.shape[-1]
    if radius_max is None:
        radius_max = H // 2 - 2
    refs_d = replicate(jnp.asarray(refs), mesh)
    imgs_d = shard_particles(jnp.asarray(imgs_p), mesh, axis_name)
    allowed_d = None
    if allowed is not None:
        # padded rows: allow everything (their outputs are dropped)
        al_p = pad_to_multiple(np.asarray(allowed, np.float32), n_dev,
                               fill=1.0)[0]
        allowed_d = shard_particles(jnp.asarray(al_p), mesh, axis_name)
    psi_d = None
    if psi_allow is not None:
        ps_p = pad_to_multiple(np.asarray(psi_allow, np.float32), n_dev,
                               fill=1.0)[0]
        psi_d = shard_particles(jnp.asarray(ps_p), mesh, axis_name)
    out = match_to_gallery(refs_d, imgs_d, max_shift=max_shift,
                           radius_min=radius_min, radius_max=radius_max,
                           refine_iters=refine_iters,
                           check_mirror=check_mirror, allowed=allowed_d,
                           psi_allow=psi_d, n_orientations=n_orientations,
                           trial_step=trial_step)
    return {k: np.asarray(v)[:n_valid] for k, v in out.items()
            if k != "aligned"}


def parallel_match_score_matrix(mesh, refs, imgs, max_shift: int = 8,
                                axis_name: str = "data",
                                check_mirror: bool = True):
    """Full (image, reference) best-over-(psi, shift) score matrix with
    the particle axis sharded over the mesh — the dp engine behind
    `align_significant --mesh dp` (reference align_significant_gpu's
    multi-GPU split). Per-image output rows gather implicitly."""
    from xmipp3_tpu.ops.match import match_score_matrix
    refs = np.asarray(refs, np.float32)
    imgs = np.asarray(imgs, np.float32)
    n_dev = mesh.shape[axis_name]
    imgs_p, n_valid = pad_to_multiple(imgs, n_dev)
    refs_d = replicate(jnp.asarray(refs), mesh)
    imgs_d = shard_particles(jnp.asarray(imgs_p), mesh, axis_name)
    out = match_score_matrix(refs_d, imgs_d, max_shift=max_shift,
                             check_mirror=check_mirror)
    return {k: (np.asarray(v) if k == "trials"
                else np.asarray(v)[:n_valid]) for k, v in out.items()}


def parallel_match_tp(mesh, refs, imgs, max_shift: int = 8,
                      radius_min: int = 2, radius_max: int | None = None,
                      refine_iters: int = 2, check_mirror: bool = True,
                      axis_name: str = "model"):
    """Gallery-sharded coarse scan (parallel_match_refsharded) followed by
    the shared winner refinement — full tp counterpart of
    parallel_match_full, for galleries too large to replicate per chip."""
    refs = np.asarray(refs, np.float32)
    imgs = np.asarray(imgs, np.float32)
    H = imgs.shape[-1]
    if radius_max is None:
        radius_max = H // 2 - 2
    coarse = parallel_match_refsharded(mesh, refs, imgs, max_shift=max_shift,
                                       radius_min=radius_min,
                                       radius_max=radius_max,
                                       check_mirror=check_mirror,
                                       axis_name=axis_name)
    grid = _trial_shift_grid(max_shift)
    t = grid[np.clip(coarse["trial"], 0, len(grid) - 1)].astype(np.float32)
    out = refine_winners(jnp.asarray(refs), jnp.asarray(imgs),
                         jnp.asarray(coarse["ref_idx"]),
                         jnp.asarray(coarse["psi"], jnp.float32),
                         jnp.asarray(t),
                         jnp.asarray(coarse["flip"]),
                         max_shift, radius_min, radius_max, refine_iters)
    res = {k: np.asarray(v) for k, v in out.items() if k != "aligned"}
    res["peak"] = coarse["peak"]
    return res


def parallel_match_refsharded(mesh, refs, imgs, max_shift: int = 8,
                              radius_min: int = 2,
                              radius_max: int | None = None,
                              check_mirror: bool = True,
                              axis_name: str = "model"):
    """Gallery-sharded (tensor-parallel) matching: each device holds a SLICE
    of the reference gallery (the big operand when galleries outgrow one
    chip's HBM), computes correlations of ALL particles against its refs,
    and the global winner is reduced across the mesh with jax.lax collectives
    (argmax over the model axis). Complements parallel_match (dp)."""
    refs = np.asarray(refs, np.float32)
    imgs = jnp.asarray(np.asarray(imgs, np.float32))
    n_dev = mesh.shape[axis_name]
    refs_p, n_refs = pad_to_multiple(refs, n_dev)
    per_dev = refs_p.shape[0] // n_dev
    H = imgs.shape[-1]
    if radius_max is None:
        radius_max = H // 2 - 2
    trials = tuple(map(tuple, _trial_shift_grid(max_shift)
                       .astype(float).tolist()))

    def local(refs_shard, imgs_rep):
        # local best over this device's gallery slice
        peak, psi, ref, trial, flip = _scan_trials(
            refs_shard, imgs_rep, trials, radius_min, radius_max,
            check_mirror)
        # globalize the ref index, then winner-take-all across the mesh:
        # pack (peak, payload) and argmax via psum of one-hot winners
        dev = jax.lax.axis_index(axis_name)
        gref = ref + dev * per_dev
        best_peak = jax.lax.pmax(peak, axis_name)
        win = (peak == best_peak).astype(jnp.float32)
        # ties broken toward the lowest device: keep first winner only
        first = jax.lax.pmax(jnp.where(win > 0, n_dev - dev, 0), axis_name)
        mine = (win > 0) & (dev == n_dev - first)
        pick = lambda v: jax.lax.psum(
            jnp.where(mine, v.astype(jnp.float32), 0.0), axis_name)
        return (best_peak, pick(psi), pick(gref), pick(trial),
                pick(flip.astype(jnp.float32)))

    fn = jax.shard_map(local, mesh=mesh,
                       in_specs=(P(axis_name), P()),
                       out_specs=(P(), P(), P(), P(), P()),
                       check_vma=False)   # scan carries start unvarying
    refs_d = jax.device_put(jnp.asarray(refs_p),
                            NamedSharding(mesh, P(axis_name)))
    peak, psi, gref, trial, flip = fn(refs_d, imgs)
    mask = np.asarray(gref).astype(int) < len(refs)
    return dict(peak=np.asarray(peak), psi=np.asarray(psi),
                ref_idx=np.asarray(gref).astype(int),
                trial=np.asarray(trial).astype(int),
                flip=np.asarray(flip) > 0.5, valid=mask)
