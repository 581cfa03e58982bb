"""Self-organizing maps: SOM and kerdenSOM.

Rebuilds the capability of the reference classification/ library
(som.{h,cpp}, kerdensom.{h,cpp}, gaussian_kerdensom.{h,cpp},
fuzzy_som, code books — SURVEY.md §2.3). Vector workloads are small; the
implementation is vectorized numpy on host (device batching adds nothing at
these sizes).
"""
from __future__ import annotations

import numpy as np


def _grid_distances(shape):
    ny, nx = shape
    yy, xx = np.mgrid[0:ny, 0:nx]
    coords = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float64)
    d2 = ((coords[:, None, :] - coords[None, :, :]) ** 2).sum(-1)
    return d2  # (K, K) squared grid distances


def som(X: np.ndarray, shape=(4, 4), n_iters: int = 200,
        radius0: float | None = None, radiusF: float = 0.5,
        alpha0: float = 0.5, seed: int = 0, verbose: int = 0):
    """Classic Kohonen SOM. Returns (codebook (K,D), assignments (N,))."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N, D = X.shape
    K = shape[0] * shape[1]
    code = X[rng.choice(N, K, replace=N < K)] + \
        0.01 * rng.standard_normal((K, D))
    d2 = _grid_distances(shape)
    if radius0 is None:
        radius0 = max(shape) / 2.0
    for it in range(n_iters):
        frac = it / max(n_iters - 1, 1)
        radius = radius0 * (radiusF / radius0) ** frac
        alpha = alpha0 * (0.01 / alpha0) ** frac
        # batch update (deterministic): assign all, move neighborhoods
        dist = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1)
        bmu = dist.argmin(axis=1)
        h = np.exp(-d2 / (2 * radius ** 2))      # (K, K)
        # weighted mean of samples per unit through neighborhood function
        Hw = h[bmu]                               # (N, K)
        denom = Hw.sum(axis=0)[:, None] + 1e-12
        target = (Hw.T @ X) / denom
        code = code + alpha * (target - code)
    dist = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1)
    return code, dist.argmin(axis=1)


def kerdensom(X: np.ndarray, shape=(4, 4), n_iters: int = 100,
              reg0: float = 1000.0, regF: float = 100.0, seed: int = 0,
              verbose: int = 0):
    """Kernel-density SOM (the reference's kerdenSOM): soft responsibilities
    with annealed smoothness regularization over the map graph."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N, D = X.shape
    K = shape[0] * shape[1]
    code = X[rng.choice(N, K, replace=N < K)] + \
        0.01 * rng.standard_normal((K, D))
    d2 = _grid_distances(shape)
    # graph laplacian of the map grid (4-neighborhood)
    Wg = (np.isclose(d2, 1.0)).astype(np.float64)
    Lap = np.diag(Wg.sum(1)) - Wg
    sigma2 = np.var(X) + 1e-12
    for it in range(n_iters):
        frac = it / max(n_iters - 1, 1)
        reg = reg0 * (regF / max(reg0, 1e-12)) ** frac
        dist = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1)
        r = np.exp(-dist / (2 * sigma2))
        r /= r.sum(axis=1, keepdims=True) + 1e-300
        Nk = r.sum(axis=0)                        # (K,)
        # regularized M-step: (diag(Nk) + reg*Lap) code = r^T X
        A = np.diag(Nk) + reg * Lap + 1e-9 * np.eye(K)
        code = np.linalg.solve(A, r.T @ X)
        sigma2 = max(float((r * dist).sum() / (N * D)), 1e-12)
        if verbose and (it + 1) % 20 == 0:
            print(f"  kerdensom iter {it + 1}: sigma2={sigma2:.5f} reg={reg:.1f}")
    dist = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1)
    return code, dist.argmin(axis=1)
