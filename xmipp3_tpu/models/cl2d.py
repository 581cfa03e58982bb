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


def _correntropy_chunk_impl(Xc, R, sigma2):
    import jax.numpy as jnp
    d2 = (Xc[:, None, :] - R[None, :, :]) ** 2
    return jnp.exp(-d2 / (2 * sigma2)).mean(axis=-1)


def _correntropy_chunk(Xc, R, sigma2):
    # jit once, lazily (jax is imported lazily in this module)
    global _CORR_JIT
    try:
        fn = _CORR_JIT
    except NameError:
        import jax
        fn = _CORR_JIT = jax.jit(_correntropy_chunk_impl)
    return fn(Xc, R, sigma2)


def correntropy_assign(registered: np.ndarray, refs: np.ndarray):
    """Correntropy of each registered image vs every reference:
    mean_j exp(-(x_j - r_j)^2 / (2 sigma^2)) with ONE global noise sigma
    (the per-pixel residual scale of each image against its best-matching
    reference) — the CL2D paper's robust similarity (reference correntropy
    distance, mpi_classify_CL2D.cpp:1744-1746). Evaluated in image chunks
    so the (B, R, D) kernel tensor never materializes whole.

    Returns (B, R) similarities; assignment = argmax."""
    import jax.numpy as jnp
    X = registered.reshape(len(registered), -1).astype(np.float32)
    R = refs.reshape(len(refs), -1).astype(np.float32)
    # global sigma from the best-match residuals (noise scale, not the
    # between-class distance): use the min-distance ref per image
    x2 = (X ** 2).sum(1, keepdims=True)
    r2 = (R ** 2).sum(1)[None, :]
    d2m = np.maximum(x2 + r2 - 2.0 * X @ R.T, 0.0) / X.shape[1]
    sigma2 = max(float(np.median(d2m.min(axis=1))), 1e-12)
    Rj = jnp.asarray(R)
    D = X.shape[1]
    step = max(1, (1 << 24) // max(len(R) * D, 1))
    out = np.empty((len(X), len(R)), np.float32)
    for s in range(0, len(X), step):
        out[s:s + step] = np.asarray(_correntropy_chunk(
            jnp.asarray(X[s:s + step]), Rj, np.float32(sigma2)))
    return out


def _center_refs(refs, prev):
    """Translation-center each new representative against its previous
    version (the reference centers class representatives every iteration
    unless --dontAlign, mpi_classify_CL2D.cpp:1755)."""
    from xmipp3_tpu.ops.geo import shift_2d_real
    from xmipp3_tpu.ops.shift import best_shift
    sx, sy, _ = best_shift(np.asarray(prev), np.asarray(refs))
    return np.asarray(shift_2d_real(refs, -np.asarray(sx),
                                    -np.asarray(sy))).astype(np.float32)


def classify_cl2d(imgs: np.ndarray, n_refs: int, n_iters: int = 10,
                  max_shift: int = 8, seed: int = 0, verbose: int = 0,
                  check_mirror: bool = True, mesh=None, nref0: int = 1,
                  init_refs=None, distance: str = "correntropy",
                  classical_multiref: bool = False,
                  classical_split: bool = False,
                  max_split_trials: int = 5, min_size_pct: float = 20.0,
                  normalize: bool = True, threshold_mask=None,
                  align_refs: bool = True, neigh: int = -1):
    """Hierarchical CL2D: start from nref0 classes and split the population
    level by level until n_refs classes exist (the reference's level scheme),
    refining with full multireference alignment at each level.

    Full reference option surface (mpi_classify_CL2D.cpp:1727-1755):
    --nref0/--ref0 seeds, correntropy|correlation distance with
    --classicalMultiref/--classicalSplit gates, --minsize small-class
    collapse, --maxSplitTrials, --dontNormalizeImages,
    --useThresholdMask, --dontAlign.

    Returns dict(refs, assignments, psi, sx, sy, flip, corr, history)."""
    imgs = np.asarray(imgs, np.float32)
    if normalize:
        flat = imgs.reshape(len(imgs), -1)
        mu = flat.mean(axis=1, keepdims=True)
        sd = np.maximum(flat.std(axis=1, keepdims=True), 1e-12)
        imgs = ((flat - mu) / sd).reshape(imgs.shape)
    rng = np.random.default_rng(seed)
    if init_refs is not None:
        refs = np.asarray(init_refs, np.float32).copy()
    elif nref0 > 1:
        refs = initial_references(imgs, min(nref0, n_refs), seed)
    else:
        refs = imgs.mean(axis=0, keepdims=True)
    kw = dict(distance=distance, classical=classical_multiref,
              min_size_pct=min_size_pct, max_split_trials=max_split_trials,
              threshold_mask=threshold_mask, align_refs=align_refs,
              neigh=neigh)
    levels = []
    while len(refs) < n_refs:
        res = _refine(imgs, refs, max(2, n_iters // 2), max_shift,
                      check_mirror, seed, verbose, mesh,
                      **dict(kw, classical=classical_multiref
                             or classical_split))
        levels.append({k: res[k] for k in
                       ("refs", "assignments", "psi", "sx", "sy",
                        "flip", "corr")})
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
                  verbose, mesh, **kw)
    res.pop("registered")
    levels.append({k: res[k] for k in
                   ("refs", "assignments", "psi", "sx", "sy",
                    "flip", "corr")})
    res["levels"] = levels
    return res


def _refine(imgs, refs, n_iters, max_shift, check_mirror, seed, verbose,
            mesh=None, distance: str = "correntropy",
            classical: bool = False, min_size_pct: float = 0.0,
            max_split_trials: int = 5, threshold_mask=None,
            align_refs: bool = True, neigh: int = -1):
    n_refs = len(refs)
    history = []
    res = None
    for it in range(n_iters):
        match_refs = refs
        if threshold_mask is not None:
            # pixels at/below the threshold drop out of the comparison
            # (reference --useThresholdMask)
            match_refs = np.where(refs > threshold_mask, refs, 0.0) \
                .astype(np.float32)
        if mesh is not None:
            # particle-sharded matching (the mpi_classify_CL2D
            # shareAssignments replacement, parallel/mpi_classify_CL2D.h:190)
            from xmipp3_tpu.parallel.match import parallel_match_full
            res = parallel_match_full(mesh, match_refs, imgs,
                                      max_shift=max_shift,
                                      check_mirror=check_mirror)
        else:
            res = match_to_gallery(match_refs, imgs, max_shift=max_shift,
                                   check_mirror=check_mirror)
        assign = np.asarray(res["ref_idx"])
        psi = np.asarray(res["psi"]).astype(np.float32)
        sx = np.asarray(res["sx"]).astype(np.float32)
        sy = np.asarray(res["sy"]).astype(np.float32)
        flip = np.asarray(res["flip"])
        corr = np.asarray(res["corr"])
        registered = np.asarray(apply_md_geometry(imgs, psi, sx, sy, flip))
        if distance == "correntropy" and not classical and n_refs > 1:
            # enhanced clustering: robust correntropy similarity decides
            # the class (pose comes from the correlation match); the
            # classical gates fall back to plain max-correlation
            sim = correntropy_assign(registered, match_refs)
            if neigh > 0 and history:
                # restrict each image to the `neigh` nearest code vectors
                # of its previous class (reference --neigh economy)
                R = refs.reshape(n_refs, -1)
                Rn = R / np.maximum(np.linalg.norm(R, axis=1,
                                                   keepdims=True), 1e-12)
                ref_cc = Rn @ Rn.T
                allowed = np.argsort(-ref_cc, axis=1)[:, :neigh]
                mask = np.full((n_refs, n_refs), -np.inf, sim.dtype)
                for r in range(n_refs):
                    mask[r, allowed[r]] = 0.0
                sim = sim + mask[history[-1][0]]
            assign = np.argmax(sim, axis=1)
            res = dict(res)
            res["ref_idx"] = assign
        new_refs = np.empty_like(refs)
        counts = np.zeros(n_refs, np.int64)
        for k in range(n_refs):
            members = assign == k
            counts[k] = members.sum()
            if counts[k] > 0:
                w = np.maximum(corr[members], 0.0) + 1e-6
                new_refs[k] = np.average(registered[members], axis=0,
                                         weights=w)
        # reseed empty/too-small classes by perturbing the most populated
        # one (reference --minsize: classes under min_size_pct% of the
        # average node size are removed and re-split, at most
        # max_split_trials times, mpi_classify_CL2D.cpp:1737-1743)
        rng = np.random.default_rng(seed + it)
        min_count = min_size_pct / 100.0 * len(imgs) / max(n_refs, 1)
        trials = 0
        for k in range(n_refs):
            too_small = counts[k] == 0 or (counts[k] < min_count
                                           and trials < max_split_trials)
            if too_small:
                trials += counts[k] > 0
                big = int(np.argmax(counts))
                members = np.where(assign == big)[0]
                half = rng.choice(members, size=max(len(members) // 2, 1),
                                  replace=False)
                new_refs[k] = registered[half].mean(axis=0)
        if align_refs and it > 0:
            new_refs = _center_refs(new_refs, refs)
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
