"""Self-organizing maps: SOM and kerdenSOM.

Rebuilds the capability of the reference classification/ library
(som.{h,cpp}, kerdensom.{h,cpp}, gaussian_kerdensom.{h,cpp},
fuzzy_som, code books — SURVEY.md §2.3). Vector workloads are small; the
implementation is vectorized numpy on host (device batching adds nothing at
these sizes).
"""
from __future__ import annotations

import numpy as np


def _grid_distances(shape, topology: str = "RECT"):
    """Squared map-lattice distances. HEXA offsets every other row by half
    a cell and compresses rows by sqrt(3)/2 (the reference's hexagonal
    lattice, classification/map.cpp neighborhood geometry)."""
    ny, nx = shape
    yy, xx = np.mgrid[0:ny, 0:nx]
    coords = np.stack([yy.ravel(), xx.ravel()], axis=1).astype(np.float64)
    if topology.upper() == "HEXA":
        coords[:, 1] += 0.5 * (coords[:, 0] % 2)
        coords[:, 0] *= np.sqrt(3.0) / 2.0
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
              verbose: int = 0, annealing_steps: int = 0,
              eps: float = 1e-7, topology: str = "RECT"):
    """Kernel-density SOM (the reference's kerdenSOM): soft responsibilities
    with annealed smoothness regularization over the map graph.

    With ``annealing_steps`` > 0 this runs the reference's deterministic
    annealing schedule (kerdensom.cpp KerDenSOM::train): ``annealing_steps``
    regularization values geometrically spaced from reg0 to regF, each run
    to convergence (relative code change < ``eps``, capped at ``n_iters``
    inner iterations). reg0=regF=0 degenerates to kernel C-means
    (no smoothness coupling), as documented in the reference CLI."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N, D = X.shape
    K = shape[0] * shape[1]
    code = X[rng.choice(N, K, replace=N < K)] + \
        0.01 * rng.standard_normal((K, D))
    d2 = _grid_distances(shape, topology)
    # graph laplacian of the map grid (4/6-neighborhood)
    Wg = (d2 < 1.0 + 1e-6).astype(np.float64) - np.eye(K)
    Lap = np.diag(Wg.sum(1)) - Wg
    sigma2 = np.var(X) + 1e-12

    def step(code, sigma2, reg):
        dist = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1)
        r = np.exp(-dist / (2 * sigma2))
        r /= r.sum(axis=1, keepdims=True) + 1e-300
        Nk = r.sum(axis=0)                        # (K,)
        # regularized M-step: (diag(Nk) + reg*Lap) code = r^T X
        A = np.diag(Nk) + reg * Lap + 1e-9 * np.eye(K)
        code = np.linalg.solve(A, r.T @ X)
        sigma2 = max(float((r * dist).sum() / (N * D)), 1e-12)
        return code, sigma2

    if annealing_steps > 0:
        regs = (np.geomspace(max(reg0, 1e-12), max(regF, 1e-12),
                             annealing_steps)
                if reg0 > 0 and regF > 0 else np.zeros(annealing_steps))
        for si, reg in enumerate(regs):
            for it in range(n_iters):
                prev = code
                code, sigma2 = step(code, sigma2, reg)
                delta = np.linalg.norm(code - prev) / max(
                    np.linalg.norm(prev), 1e-300)
                if delta < eps:
                    break
            if verbose:
                print(f"  annealing step {si + 1}/{annealing_steps} "
                      f"reg={reg:.2f} sigma2={sigma2:.5f}")
    else:
        for it in range(n_iters):
            frac = it / max(n_iters - 1, 1)
            reg = reg0 * (regF / max(reg0, 1e-12)) ** frac
            prev = code
            code, sigma2 = step(code, sigma2, reg)
            if np.linalg.norm(code - prev) < eps * max(
                    np.linalg.norm(prev), 1e-300):
                break
            if verbose and (it + 1) % 20 == 0:
                print(f"  kerdensom iter {it + 1}: sigma2={sigma2:.5f} "
                      f"reg={reg:.1f}")
    dist = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1)
    return code, dist.argmin(axis=1)


def batch_som(X: np.ndarray, shape=(4, 4), n_epochs: int = 20,
              radius0: float | None = None, radiusF: float = 0.5,
              seed: int = 0):
    """Batch SOM (reference classification/batch_som.{h,cpp}): per epoch,
    every codevector becomes the neighborhood-weighted mean of ALL samples
    (no learning rate — the closed-form batch update)."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N, D = X.shape
    K = shape[0] * shape[1]
    code = X[rng.choice(N, K, replace=N < K)] + \
        0.01 * rng.standard_normal((K, D))
    d2 = _grid_distances(shape)
    if radius0 is None:
        radius0 = max(shape) / 2.0
    for it in range(n_epochs):
        frac = it / max(n_epochs - 1, 1)
        radius = radius0 * (radiusF / radius0) ** frac
        dist = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1)
        bmu = dist.argmin(axis=1)
        h = np.exp(-d2 / (2 * radius ** 2))
        Hw = h[bmu]                                     # (N, K)
        denom = Hw.sum(axis=0)[:, None] + 1e-12
        code = (Hw.T @ X) / denom                       # closed form
    dist = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1)
    return code, dist.argmin(axis=1)


def fcmeans(X: np.ndarray, K: int = 4, m: float = 2.0, n_iters: int = 100,
            tol: float = 1e-5, seed: int = 0):
    """Fuzzy c-means (reference classification/fcmeans.{h,cpp}).

    Returns (codebook (K,D), memberships U (N,K))."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N, D = X.shape
    U = rng.dirichlet(np.ones(K), N)                    # (N, K)
    code = None
    for _ in range(n_iters):
        Um = U ** m
        code = (Um.T @ X) / (Um.sum(axis=0)[:, None] + 1e-12)
        d2 = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1) + 1e-12
        inv = d2 ** (-1.0 / (m - 1.0))
        Unew = inv / inv.sum(axis=1, keepdims=True)
        if np.abs(Unew - U).max() < tol:
            U = Unew
            break
        U = Unew
    return code, U


def fuzzy_som(X: np.ndarray, shape=(4, 4), m0: float = 2.0,
              mF: float = 1.02, n_iters: int = 60, seed: int = 0):
    """Fuzzy SOM / FKCN (reference fuzzy_som.{h,cpp}, fkcn.{h,cpp}):
    fuzzy c-means whose fuzziness exponent anneals m0 -> mF, which shrinks
    the effective update neighborhood over time (the fuzzy-Kohonen
    equivalence). Returns (codebook, memberships)."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N, D = X.shape
    K = shape[0] * shape[1]
    U = rng.dirichlet(np.ones(K), N)
    code = None
    for it in range(n_iters):
        frac = it / max(n_iters - 1, 1)
        m = m0 * (mF / m0) ** frac
        m = max(m, 1.01)
        Um = U ** m
        code = (Um.T @ X) / (Um.sum(axis=0)[:, None] + 1e-12)
        d2 = ((X[:, None, :] - code[None, :, :]) ** 2).sum(-1) + 1e-12
        inv = d2 ** (-1.0 / (m - 1.0))
        U = inv / inv.sum(axis=1, keepdims=True)
    return code, U


class CodeBook:
    """Vector code book with per-unit assignment bookkeeping (reference
    classification/code_book.{h,cpp}; the fuzzy variant stores the
    membership matrix, fuzzy_code_book.{h,cpp})."""

    def __init__(self, vectors: np.ndarray, memberships=None):
        self.vectors = np.asarray(vectors, np.float64)
        self.memberships = None if memberships is None else \
            np.asarray(memberships, np.float64)

    def assign(self, X):
        d2 = ((np.asarray(X, np.float64)[:, None, :]
               - self.vectors[None, :, :]) ** 2).sum(-1)
        return d2.argmin(axis=1)

    def quantization_error(self, X):
        d2 = ((np.asarray(X, np.float64)[:, None, :]
               - self.vectors[None, :, :]) ** 2).sum(-1)
        return float(np.sqrt(d2.min(axis=1)).mean())

    def histogram(self, X):
        a = self.assign(X)
        return np.bincount(a, minlength=len(self.vectors))
