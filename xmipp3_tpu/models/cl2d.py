"""CL2D-style 2-D classification: iterative multireference alignment +
class-average refinement.

Rebuilds the capability of the reference's mpi_classify_CL2D
(parallel/mpi_classify_CL2D.h:190, ~50 MPI ranks sharing assignments) as a
device-batched loop: every iteration matches ALL particles against ALL class
references in one gallery-matching call (ops.match), then recomputes the
class averages from the registered images; empty classes are reseeded by
splitting the widest class (the reference's split heuristic).
"""
from __future__ import annotations

import numpy as np

from xmipp3_tpu.ops.geo import apply_md_geometry
from xmipp3_tpu.ops.match import match_to_gallery


def initial_references(imgs: np.ndarray, n_refs: int, seed: int = 0):
    """Random-subset averages (the reference seeds similarly)."""
    rng = np.random.default_rng(seed)
    order = rng.permutation(len(imgs))
    chunks = np.array_split(order, n_refs)
    return np.stack([imgs[c].mean(axis=0) for c in chunks])


def classify_cl2d(imgs: np.ndarray, n_refs: int, n_iters: int = 10,
                  max_shift: int = 8, seed: int = 0, verbose: int = 0,
                  check_mirror: bool = True, mesh=None):
    """Hierarchical CL2D: start from one class and split the population
    level by level until n_refs classes exist (the reference's level scheme),
    refining with full multireference alignment at each level.

    Returns dict(refs, assignments, psi, sx, sy, flip, corr, history)."""
    imgs = np.asarray(imgs, np.float32)
    rng = np.random.default_rng(seed)
    refs = imgs.mean(axis=0, keepdims=True)
    while len(refs) < n_refs:
        res = _refine(imgs, refs, max(2, n_iters // 2), max_shift,
                      check_mirror, seed, verbose, mesh)
        refs = res["refs"]
        # split the widest classes (largest intra-class variance) until the
        # target count (at most doubling per level, reference behavior)
        n_new = min(2 * len(refs), n_refs)
        assign = res["assignments"]
        registered = res["registered"]
        order = np.argsort([-registered[assign == k].var() *
                            max((assign == k).sum(), 1)
                            for k in range(len(refs))])
        new_refs = list(refs)
        for k in order:
            if len(new_refs) >= n_new:
                break
            members = np.where(assign == k)[0]
            if len(members) < 2:
                continue
            half = rng.permutation(members)
            a, b = half[: len(half) // 2], half[len(half) // 2:]
            new_refs[k] = registered[a].mean(axis=0)
            new_refs.append(registered[b].mean(axis=0))
        refs = np.stack(new_refs)
    res = _refine(imgs, refs, n_iters, max_shift, check_mirror, seed,
                  verbose, mesh)
    res.pop("registered")
    return res


def _refine(imgs, refs, n_iters, max_shift, check_mirror, seed, verbose,
            mesh=None):
    n_refs = len(refs)
    history = []
    res = None
    for it in range(n_iters):
        if mesh is not None:
            # particle-sharded matching (the mpi_classify_CL2D
            # shareAssignments replacement, parallel/mpi_classify_CL2D.h:190)
            from xmipp3_tpu.parallel.match import parallel_match_full
            res = parallel_match_full(mesh, refs, imgs,
                                      max_shift=max_shift,
                                      check_mirror=check_mirror)
        else:
            res = match_to_gallery(refs, imgs, max_shift=max_shift,
                                   check_mirror=check_mirror)
        assign = np.asarray(res["ref_idx"])
        psi = np.asarray(res["psi"]).astype(np.float32)
        sx = np.asarray(res["sx"]).astype(np.float32)
        sy = np.asarray(res["sy"]).astype(np.float32)
        flip = np.asarray(res["flip"])
        corr = np.asarray(res["corr"])
        registered = np.asarray(apply_md_geometry(imgs, psi, sx, sy, flip))
        new_refs = np.empty_like(refs)
        counts = np.zeros(n_refs, np.int64)
        for k in range(n_refs):
            members = assign == k
            counts[k] = members.sum()
            if counts[k] > 0:
                w = np.maximum(corr[members], 0.0) + 1e-6
                new_refs[k] = np.average(registered[members], axis=0,
                                         weights=w)
        # reseed empty classes by perturbing the most populated one
        rng = np.random.default_rng(seed + it)
        for k in range(n_refs):
            if counts[k] == 0:
                big = int(np.argmax(counts))
                members = np.where(assign == big)[0]
                half = rng.choice(members, size=max(len(members) // 2, 1),
                                  replace=False)
                new_refs[k] = registered[half].mean(axis=0)
        changed = float((assign != history[-1][0]).mean()) if history else 1.0
        history.append((assign.copy(), float(corr.mean())))
        refs = new_refs
        if verbose:
            print(f"  CL2D[{n_refs}] iter {it + 1}: mean corr "
                  f"{corr.mean():.4f}, reassigned {changed * 100:.1f}%")
        if it > 0 and changed < 0.01:
            break
    return dict(refs=refs, assignments=np.asarray(res["ref_idx"]),
                psi=np.asarray(res["psi"]), sx=np.asarray(res["sx"]),
                sy=np.asarray(res["sy"]), flip=np.asarray(res["flip"]),
                corr=np.asarray(res["corr"]), history=history,
                registered=registered)
