"""Dimensionality reduction library.

Rebuilds the reference libraries/dimred/ surface (SURVEY.md §2.3: PCA,
kernel PCA, probabilistic PCA, LPP, NPE, Laplacian eigenmaps, LLE/hessian
LLE, LTSA, diffusion maps, Sammon, SPE) as vectorized numpy/scipy — these are
small-matrix eigenproblems where the host is the right place.

All functions take X (N, D) and return Y (N, d).
"""
from __future__ import annotations

import numpy as np
import scipy.linalg
import scipy.sparse
import scipy.spatial


def pca(X, d=2, return_model=False):
    X = np.asarray(X, np.float64)
    mu = X.mean(axis=0)
    Xc = X - mu
    U, S, Vt = np.linalg.svd(Xc, full_matrices=False)
    Y = U[:, :d] * S[:d]
    if return_model:
        return Y, dict(mean=mu, components=Vt[:d],
                       explained=S[:d] ** 2 / (len(X) - 1))
    return Y


def empca(X, d=2, n_iters: int = 10, seed: int = 0, return_basis=False):
    """EM-PCA (Roweis NIPS'97) — the reference PCAMahalanobisAnalyzer::
    learnPCABasis (data/basic_pca.cpp:170): E-step solves the coefficients
    for the current basis, M-step refits the basis; converges to the top-d
    principal subspace without forming the covariance. Data stays (N, D)
    and every step is a matmul — for large image sets this runs as device
    matmuls (MXU) instead of a host eigendecomposition.

    Returns projections (N, d); with return_basis also (basis (d, D), mean).
    """
    import jax.numpy as jnp
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N, D = X.shape
    d = min(d, N)
    mu = X.mean(axis=0)
    Y = jnp.asarray((X - mu).T, jnp.float32)           # (D, N)
    C = jnp.asarray(X[rng.choice(N, d, replace=False)].T - mu[:, None],
                    jnp.float32)                       # (D, d)
    for _ in range(n_iters):
        CtC = C.T @ C                                  # (d, d)
        CtY = C.T @ Y                                  # (d, N)
        Xc = jnp.linalg.solve(CtC, CtY)                # E-step coefficients
        C = (Y @ Xc.T) @ jnp.linalg.inv(Xc @ Xc.T)     # M-step basis
    # orthonormalize for a clean projection
    Q, _ = jnp.linalg.qr(C)
    proj = np.asarray((Q.T @ Y).T, np.float64)
    if return_basis:
        return proj, np.asarray(Q.T, np.float64), mu
    return proj


def pca_zscores(X, d=3, n_iters: int = 10, seed: int = 0):
    """Mahalanobis z-scores in the EM-PCA subspace — the reference
    PCAMahalanobisAnalyzer::evaluateZScore (basic_pca.cpp:384): project on
    the learned basis, estimate the (d, d) covariance of the projections,
    z = sqrt(p^T cov^-1 p). The particle-screening outlier score."""
    proj = empca(X, d=d, n_iters=n_iters, seed=seed)
    cov = proj.T @ proj / len(proj)
    covinv = np.linalg.inv(cov + 1e-12 * np.eye(proj.shape[1]))
    z = np.sqrt(np.abs(np.einsum("ni,ij,nj->n", proj, covinv, proj)))
    return z


class IncrementalPCA:
    """Streaming PCA (the reference PCAonline role, basic_pca.cpp:518):
    accumulates mean and a d-rank sketch batch by batch so arbitrarily large
    sets never need to be resident; each update is two matmuls."""

    # exact streaming second moments up to this many features; beyond it a
    # low-rank sketch bounds memory (images can be 10^4-10^5 dims)
    EXACT_DIM_LIMIT = 4096

    def __init__(self, d: int = 2, sketch_rank: int | None = None):
        self.d = d
        self._k = sketch_rank or max(4 * d + 16, 32)  # oversampled rank
        self.n = 0
        self._sum = None             # running sum(x)
        self._moment = None          # running sum(x x^T) when D small
        self._sketch = None          # (k, D) sketch when D large

    def partial_fit(self, X):
        X = np.asarray(X, np.float64)
        D = X.shape[1]
        if self._sum is None:
            self._sum = X.sum(axis=0)
        else:
            self._sum = self._sum + X.sum(axis=0)
        self.n += len(X)
        if D <= self.EXACT_DIM_LIMIT:
            m = X.T @ X
            self._moment = m if self._moment is None else self._moment + m
        else:
            stack = X if self._sketch is None else np.vstack([self._sketch, X])
            U, S, Vt = np.linalg.svd(stack, full_matrices=False)
            k = min(self._k, len(S))
            self._sketch = S[:k, None] * Vt[:k]
        return self

    @property
    def mean(self):
        return self._sum / self.n

    @property
    def components(self):
        mu = self.mean
        if self._moment is not None:
            cov = self._moment / self.n - np.outer(mu, mu)
            w, V = np.linalg.eigh(cov)
            return V[:, ::-1][:, : self.d].T
        # sketch path: remove the mean from the sketch rows
        sk = self._sketch - (self._sketch @ mu)[:, None] \
            * mu[None, :] / max(mu @ mu, 1e-300)
        U, S, Vt = np.linalg.svd(sk, full_matrices=False)
        return Vt[: self.d]

    def transform(self, X):
        return (np.asarray(X, np.float64) - self.mean) @ self.components.T


def probabilistic_pca(X, d=2, n_iters: int = 50, seed: int = 0):
    """EM for pPCA (Tipping & Bishop)."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N, D = X.shape
    mu = X.mean(axis=0)
    Xc = X - mu
    W = rng.standard_normal((D, d))
    sigma2 = 1.0
    for _ in range(n_iters):
        M = W.T @ W + sigma2 * np.eye(d)
        Minv = np.linalg.inv(M)
        Ez = Xc @ W @ Minv                       # (N,d)
        Ezz = N * sigma2 * Minv + Ez.T @ Ez      # (d,d)
        W = Xc.T @ Ez @ np.linalg.inv(Ezz)
        sigma2 = float(((Xc ** 2).sum() - 2 * np.einsum(
            "nd,dk,nk->", Xc, W, Ez) + np.trace(Ezz @ W.T @ W)) / (N * D))
        sigma2 = max(sigma2, 1e-9)
    M = W.T @ W + sigma2 * np.eye(d)
    return Xc @ W @ np.linalg.inv(M)


def kernel_pca(X, d=2, gamma=None):
    X = np.asarray(X, np.float64)
    sq = scipy.spatial.distance.squareform(
        scipy.spatial.distance.pdist(X, "sqeuclidean"))
    if gamma is None:
        gamma = 1.0 / np.median(sq[sq > 0])
    K = np.exp(-gamma * sq)
    N = len(X)
    one = np.ones((N, N)) / N
    Kc = K - one @ K - K @ one + one @ K @ one
    w, v = np.linalg.eigh(Kc)
    idx = np.argsort(w)[::-1][:d]
    return v[:, idx] * np.sqrt(np.maximum(w[idx], 1e-12))


def _knn_graph(X, k):
    D = scipy.spatial.distance.squareform(scipy.spatial.distance.pdist(X))
    np.fill_diagonal(D, np.inf)
    nn = np.argsort(D, axis=1)[:, :k]
    return D, nn


def laplacian_eigenmap(X, d=2, k=8, sigma=None):
    X = np.asarray(X, np.float64)
    D, nn = _knn_graph(X, k)
    N = len(X)
    if sigma is None:
        sigma = np.median(D[np.arange(N)[:, None], nn])
    W = np.zeros((N, N))
    for i in range(N):
        W[i, nn[i]] = np.exp(-D[i, nn[i]] ** 2 / (2 * sigma ** 2))
    W = np.maximum(W, W.T)
    deg = W.sum(axis=1)
    L = np.diag(deg) - W
    # generalized eigenproblem L v = w Deg v
    w, v = scipy.linalg.eigh(L, np.diag(deg + 1e-12))
    return v[:, 1:d + 1]


def lpp(X, d=2, k=8):
    """Locality Preserving Projections (linear Laplacian eigenmap)."""
    X = np.asarray(X, np.float64)
    Xc = X - X.mean(axis=0)
    D, nn = _knn_graph(Xc, k)
    N = len(X)
    sigma = np.median(D[np.arange(N)[:, None], nn])
    W = np.zeros((N, N))
    for i in range(N):
        W[i, nn[i]] = np.exp(-D[i, nn[i]] ** 2 / (2 * sigma ** 2))
    W = np.maximum(W, W.T)
    deg = W.sum(axis=1)
    L = np.diag(deg) - W
    A = Xc.T @ L @ Xc
    B = Xc.T @ np.diag(deg) @ Xc + 1e-9 * np.eye(X.shape[1])
    w, v = scipy.linalg.eigh(A, B)
    return Xc @ v[:, :d]


def lle(X, d=2, k=8, reg=1e-3):
    """Locally Linear Embedding."""
    X = np.asarray(X, np.float64)
    N = len(X)
    _, nn = _knn_graph(X, k)
    W = np.zeros((N, N))
    for i in range(N):
        Z = X[nn[i]] - X[i]
        C = Z @ Z.T
        C += reg * np.trace(C) * np.eye(k) if np.trace(C) > 0 else \
            reg * np.eye(k)
        w = np.linalg.solve(C, np.ones(k))
        W[i, nn[i]] = w / w.sum()
    M = np.eye(N) - W
    MtM = M.T @ M
    w, v = np.linalg.eigh(MtM)
    return v[:, 1:d + 1]


def ltsa(X, d=2, k=8):
    """Local Tangent Space Alignment."""
    X = np.asarray(X, np.float64)
    N = len(X)
    _, nn = _knn_graph(X, k)
    B = np.zeros((N, N))
    for i in range(N):
        idx = np.concatenate([[i], nn[i]])
        Xi = X[idx] - X[idx].mean(axis=0)
        U, S, _ = np.linalg.svd(Xi, full_matrices=False)
        G = np.hstack([np.ones((len(idx), 1)) / np.sqrt(len(idx)), U[:, :d]])
        Wi = np.eye(len(idx)) - G @ G.T
        B[np.ix_(idx, idx)] += Wi
    w, v = np.linalg.eigh(B)
    return v[:, 1:d + 1]


def diffusion_map(X, d=2, sigma=None, t=1):
    X = np.asarray(X, np.float64)
    sq = scipy.spatial.distance.squareform(
        scipy.spatial.distance.pdist(X, "sqeuclidean"))
    if sigma is None:
        sigma = np.sqrt(np.median(sq[sq > 0]))
    K = np.exp(-sq / (2 * sigma ** 2))
    q = K.sum(axis=1)
    Knorm = K / np.outer(q, q)
    dsum = Knorm.sum(axis=1)
    P = Knorm / dsum[:, None]
    w, v = np.linalg.eig(P)
    order = np.argsort(-w.real)[1:d + 1]
    return (v[:, order].real * (w[order].real ** t))


def sammon(X, d=2, n_iters=100, lr=0.3, seed=0):
    """Sammon mapping by gradient descent."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    Dx = scipy.spatial.distance.squareform(scipy.spatial.distance.pdist(X))
    np.fill_diagonal(Dx, 1.0)
    Y = pca(X, d) + 1e-4 * rng.standard_normal((len(X), d))
    c = Dx.sum()
    for _ in range(n_iters):
        Dy = scipy.spatial.distance.squareform(scipy.spatial.distance.pdist(Y))
        np.fill_diagonal(Dy, 1.0)
        diff = Dx - Dy
        ratio = diff / (Dx * Dy)
        np.fill_diagonal(ratio, 0.0)
        grad = -2.0 / c * ((ratio[:, :, None] *
                            (Y[:, None, :] - Y[None, :, :])).sum(axis=1))
        Y = Y - lr * grad
    return Y


METHODS = {
    "PCA": pca, "pPCA": probabilistic_pca, "kPCA": kernel_pca,
    "LE": laplacian_eigenmap, "LPP": lpp, "LLE": lle, "LTSA": ltsa,
    "DM": diffusion_map, "Sammon": sammon,
}


def reduce_dimensionality(X, method: str = "PCA", d: int = 2, **kw):
    if method not in METHODS:
        raise ValueError(f"unknown dimred method {method} "
                         f"(available: {', '.join(METHODS)})")
    return METHODS[method](X, d=d, **kw)


def npe(X, d=2, k=8, reg=1e-3):
    """Neighborhood Preserving Embedding — the linear variant of LLE
    (reference libraries/dimred/npe.cpp): solve the generalized
    eigenproblem X^T M X v = w X^T X v with M = (I-W)^T (I-W)."""
    X = np.asarray(X, np.float64)
    Xc = X - X.mean(axis=0)
    N = len(X)
    _, nn = _knn_graph(Xc, k)
    W = np.zeros((N, N))
    for i in range(N):
        Z = Xc[nn[i]] - Xc[i]
        C = Z @ Z.T
        C += reg * np.trace(C) * np.eye(k) if np.trace(C) > 0 else \
            reg * np.eye(k)
        w = np.linalg.solve(C, np.ones(k))
        W[i, nn[i]] = w / w.sum()
    M = np.eye(N) - W
    A = Xc.T @ (M.T @ M) @ Xc
    B = Xc.T @ Xc + 1e-9 * np.eye(X.shape[1])
    w, v = scipy.linalg.eigh(A, B)
    return Xc @ v[:, :d]


def lltsa(X, d=2, k=8):
    """Linear Local Tangent Space Alignment (reference dimred/lltsa.cpp):
    the LTSA alignment matrix constrained to a linear projection."""
    X = np.asarray(X, np.float64)
    Xc = X - X.mean(axis=0)
    N = len(X)
    _, nn = _knn_graph(Xc, k)
    B = np.zeros((N, N))
    for i in range(N):
        idx = np.concatenate([[i], nn[i]])
        Xi = Xc[idx] - Xc[idx].mean(axis=0)
        U, S, _ = np.linalg.svd(Xi, full_matrices=False)
        G = np.hstack([np.ones((len(idx), 1)) / np.sqrt(len(idx)), U[:, :d]])
        Wi = np.eye(len(idx)) - G @ G.T
        B[np.ix_(idx, idx)] += Wi
    A = Xc.T @ B @ Xc
    Bm = Xc.T @ Xc + 1e-9 * np.eye(X.shape[1])
    w, v = scipy.linalg.eigh(A, Bm)
    return Xc @ v[:, :d]


def hlle(X, d=2, k=None):
    """Hessian Locally Linear Embedding (reference dimred/hessianLLE.cpp):
    null space of the accumulated local Hessian estimators."""
    X = np.asarray(X, np.float64)
    N = len(X)
    dp = d * (d + 1) // 2
    if k is None:
        k = max(d + dp + 2, 8)
    _, nn = _knn_graph(X, k)
    Hacc = np.zeros((N, N))
    for i in range(N):
        idx = nn[i]
        Xi = X[idx] - X[idx].mean(axis=0)
        U, S, _ = np.linalg.svd(Xi, full_matrices=False)
        tang = U[:, :d]                       # local tangent coordinates
        # design matrix: [1, tangent coords, symmetric quadratic terms]
        cols = [np.ones(k)] + [tang[:, a] for a in range(d)]
        for a in range(d):
            for b in range(a, d):
                cols.append(tang[:, a] * tang[:, b])
        Yi = np.stack(cols, axis=1)
        Q, _ = np.linalg.qr(Yi)
        H = Q[:, 1 + d:1 + d + dp]            # Hessian estimator columns
        # normalize columns so each quadratic form integrates to 1
        s = H.sum(axis=0)
        s[np.abs(s) < 1e-12] = 1.0
        Hacc[np.ix_(idx, idx)] += (H / s) @ (H / s).T
    w, v = np.linalg.eigh(Hacc)
    emb = v[:, 1:d + 1]
    # scale to unit covariance (standard HLLE post-normalization)
    C = emb.T @ emb / N
    ww, vv = np.linalg.eigh(C)
    return emb @ vv @ np.diag(1.0 / np.sqrt(np.maximum(ww, 1e-12))) @ vv.T


def spe(X, d=2, n_iters=20000, lam=1.0, rcut=None, seed=0):
    """Stochastic Proximity Embedding (Agrafiotis; reference
    dimred/spe.cpp): random pair updates matching input distances within
    a neighborhood cutoff."""
    rng = np.random.default_rng(seed)
    X = np.asarray(X, np.float64)
    N = len(X)
    Dx = scipy.spatial.distance.squareform(scipy.spatial.distance.pdist(X))
    if rcut is None:
        rcut = np.percentile(Dx[Dx > 0], 25)
    Y = pca(X, d) * 0.1 + 0.01 * rng.standard_normal((N, d))
    lam0, lam1 = lam, 0.01
    for it in range(n_iters):
        l = lam0 + (lam1 - lam0) * it / max(n_iters - 1, 1)
        i, j = rng.integers(0, N, 2)
        if i == j:
            continue
        dy = np.linalg.norm(Y[i] - Y[j]) + 1e-10
        dx = Dx[i, j]
        if dx <= rcut or dy < dx:
            corr = l * 0.5 * (dx - dy) / dy
            delta = corr * (Y[i] - Y[j])
            Y[i] += delta
            Y[j] -= delta
    return Y


def nca(X, d=2, labels=None, n_iters=60, lr=0.2, seed=0):
    """Neighborhood Component Analysis (reference dimred/nca.cpp).
    Supervised: maximizes softmax leave-one-out classification of
    `labels` under a linear map. Without labels, k-means pseudo-labels
    are used (the reference CLI always receives labels)."""
    X = np.asarray(X, np.float64)
    N, D = X.shape
    if labels is None:
        from scipy.cluster.vq import kmeans2
        _, labels = kmeans2(X, max(2, d + 1), seed=seed, minit="++")
    labels = np.asarray(labels)
    import jax
    import jax.numpy as jnp
    same = jnp.asarray((labels[:, None] == labels[None, :])
                       & ~np.eye(N, dtype=bool))
    Xj = jnp.asarray(X)

    def objective(A):
        Y = Xj @ A.T                              # (N, d)
        sq = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
        sq = sq + 1e10 * jnp.eye(N)
        P = jax.nn.softmax(-sq, axis=1)
        return -(P * same).sum()

    grad = jax.jit(jax.grad(objective))
    A = jnp.asarray(np.linalg.svd(X - X.mean(0),
                                  full_matrices=False)[2][:d])
    for _ in range(n_iters):
        A = A - lr * grad(A) / N
    return np.asarray(Xj @ A.T)


def gplvm(X, d=2, n_iters=100, lr=0.05, seed=0):
    """Gaussian Process Latent Variable Model (reference dimred/gplvm.cpp):
    latent positions maximizing the GP marginal likelihood with an RBF
    kernel (Adam on the jax-autodiffed objective)."""
    import jax
    import jax.numpy as jnp
    X = np.asarray(X, np.float64)
    N, D = X.shape
    Xc = X - X.mean(axis=0)
    S = jnp.asarray(Xc @ Xc.T)

    def neg_ll(params):
        Y, log_g, log_s = params
        sq = ((Y[:, None, :] - Y[None, :, :]) ** 2).sum(-1)
        K = jnp.exp(-0.5 * jnp.exp(log_g) * sq) + \
            jnp.exp(log_s) * jnp.eye(N)
        L = jnp.linalg.cholesky(K)
        Kinv_S = jax.scipy.linalg.cho_solve((L, True), S)
        logdet = 2.0 * jnp.log(jnp.diag(L)).sum()
        return 0.5 * (D * logdet + jnp.trace(Kinv_S))

    grad = jax.jit(jax.grad(neg_ll))
    Y0 = pca(Xc, d)
    Y0 = Y0 / max(np.abs(Y0).max(), 1e-9)
    params = [jnp.asarray(Y0), jnp.asarray(0.0), jnp.asarray(-2.0)]
    m = [jnp.zeros_like(p) for p in params]
    v = [jnp.zeros_like(p) for p in params]
    b1, b2, eps = 0.9, 0.999, 1e-8
    for t in range(1, n_iters + 1):
        g = grad(params)
        for i in range(3):
            m[i] = b1 * m[i] + (1 - b1) * g[i]
            v[i] = b2 * v[i] + (1 - b2) * g[i] ** 2
            mh = m[i] / (1 - b1 ** t)
            vh = v[i] / (1 - b2 ** t)
            params[i] = params[i] - lr * mh / (jnp.sqrt(vh) + eps)
    return np.asarray(params[0])


METHODS.update({
    "NPE": npe, "LLTSA": lltsa, "HLLE": hlle, "SPE": spe, "NCA": nca,
    "GPLVM": gplvm,
})


def intrinsic_dimensionality(X, method: str = "CorrDim",
                             normalize: bool = True) -> float:
    """Intrinsic dimensionality estimate (reference dimred_tools.cpp:341-448
    intrinsicDimensionality): 'MLE' = Levina-Bickel k-NN MLE averaged over
    k in [5, 12]; 'CorrDim' = correlation dimension from the pairwise
    distance CDF between the median and maximum 3-NN distance."""
    X = np.asarray(X, np.float64)
    if normalize:
        mu = X.mean(axis=0)
        sd = np.maximum(X.std(axis=0), 1e-300)
        X = (X - mu) / sd
    N = len(X)
    d2 = ((X[:, None, :] - X[None, :, :]) ** 2).sum(-1)
    np.fill_diagonal(d2, np.inf)
    if method == "MLE":
        k1, k2 = 5, 12
        if k2 > N:
            k2 = N - 1
            k1 = k2 // 2
        knn = np.sqrt(np.sort(d2, axis=1)[:, :k2])   # (N, k2) distances
        logd = np.log(np.maximum(knn, 1e-300))
        S = np.cumsum(logd, axis=1)                  # S_k = sum_{j<=k} log T_j
        dsum = 0.0
        for k in range(k1, k2):
            dk = (k - 1) / (S[:, k] - logd[:, k] * (k + 1))
            dsum += dk.sum()
        return -dsum / ((k2 - k1) * N)
    if method == "CorrDim":
        K = min(3, N - 1)
        knn = np.sqrt(np.sort(d2, axis=1)[:, :K])
        flat = np.sort(knn.ravel())
        median = flat[len(flat) // 2] ** 2
        max_val = flat[-1] ** 2
        if max_val == 0:
            return 0.0
        iu = np.triu_indices(N, k=1)
        pair = d2[iu]
        p_max = float((pair <= max_val).mean())
        p_med = float((pair <= median).mean())
        if p_med <= 0 or p_max <= 0 or max_val <= median:
            return 0.0
        return 2.0 * np.log(p_max / p_med) / np.log(max_val / median)
    raise ValueError(f"unknown dimensionality estimate method {method}")
