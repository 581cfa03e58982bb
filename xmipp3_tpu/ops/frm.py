"""Fast Rotational Matching (FRM) over SO(3) via spherical harmonics.

Replaces the reference interface/frm.{h,cpp} + external/sh_alignment (the
Situs-derived embedded-Python FRM, ~12 k LoC, interface/frm.h:35-52) with a
TPU-first spherical-harmonic correlation:

1. both volumes are sampled on concentric spherical shells (one shared
   constant-index gather);
2. per-shell SH analysis is ONE matmul against a precomputed conj(Y)
   quadrature matrix (scipy sph_harm_y, cached per (L, grid));
3. the SO(3) correlation C(alpha, beta, gamma) =
      sum_l sum_mm' conj(D^l_mm'(R)) T^l_mm',
   T^l_mm' = sum_r r^2 f_lm(r) conj(g_lm'(r)), factorizes per beta into a
   2-D FFT over (m, m') — the whole rotation grid in a handful of
   batched matmuls + FFTs;
4. Wigner-d matrices d^l(beta) = exp(-i beta J_y) come from one cached
   eigendecomposition of J_y per l (exact, stable — no recursions);
5. the grid peak is polished by Powell on the real-space correlation of
   the warped volumes (same objective the caller scores with).

Conventions: the returned matrix M maximizes corr(v1, rot) where
rot = ops.geo.apply_affine_3d(v2, M)[0], i.e. rot(x) = v2(M^-1 x) on
(x, y, z) coordinates about the volume center.
"""
from __future__ import annotations

from functools import lru_cache, partial

import jax
import jax.numpy as jnp
import numpy as np


# ---------------------------------------------------------------------------
# cached geometry/basis tables
# ---------------------------------------------------------------------------

@lru_cache(maxsize=8)
def _sphere_grid(L: int):
    """Equiangular (theta, phi) grid + quadrature weights for degree L."""
    nt = 2 * L + 2
    nph = 2 * L + 2
    theta = (np.arange(nt) + 0.5) * np.pi / nt
    phi = np.arange(nph) * 2 * np.pi / nph
    w = np.sin(theta) * (np.pi / nt) * (2 * np.pi / nph)   # (nt,)
    return theta, phi, w


@lru_cache(maxsize=8)
def _sh_matrix(L: int):
    """conj(Y_lm) * quadrature weight, flattened: ((L+1)^2, nt*nph)."""
    from scipy.special import sph_harm_y
    theta, phi, w = _sphere_grid(L)
    T, P = np.meshgrid(theta, phi, indexing="ij")
    rows = []
    for l in range(L + 1):
        for m in range(-l, l + 1):
            Y = sph_harm_y(l, m, T, P)
            rows.append((np.conj(Y) * w[:, None]).ravel())
    return np.stack(rows).astype(np.complex64)


@lru_cache(maxsize=8)
def _wigner_d_tables(L: int, n_beta: int):
    """d^l_{mm'}(beta_j) for all l<=L on a beta grid, via one
    eigendecomposition of J_y per l: d^l(beta) = V e^{-i beta Lam} V^H.

    Returns list of arrays d[l] with shape (n_beta, 2l+1, 2l+1) float64,
    and the beta grid. beta in (0, pi)."""
    betas = (np.arange(n_beta) + 0.5) * np.pi / n_beta
    out = []
    for l in range(L + 1):
        m = np.arange(-l, l + 1)
        dim = 2 * l + 1
        Jy = np.zeros((dim, dim), complex)
        for i, mm in enumerate(m[:-1]):
            cp = np.sqrt(l * (l + 1) - mm * (mm + 1))
            Jy[i + 1, i] = cp / 2j        # <m+1|J_y|m>
            Jy[i, i + 1] = -cp / 2j       # Hermitian conjugate
        lam, V = np.linalg.eigh(Jy)
        ph = np.exp(-1j * betas[:, None] * lam[None, :])   # (nb, dim)
        d = np.einsum("ik,bk,jk->bij", V, ph, np.conj(V))
        out.append(np.real(d))
    return out, betas


# ---------------------------------------------------------------------------
# shell sampling + SH coefficients
# ---------------------------------------------------------------------------

def _shell_coeffs(vol, L: int, radii: np.ndarray):
    """SH coefficients f_lm(r) for each shell radius: (nR, (L+1)^2)."""
    theta, phi, _ = _sphere_grid(L)
    T, P = np.meshgrid(theta, phi, indexing="ij")
    st, ct = np.sin(T), np.cos(T)
    # unit directions (x, y, z)
    ux = (st * np.cos(P)).ravel()
    uy = (st * np.sin(P)).ravel()
    uz = ct.ravel()
    D, H, W = vol.shape
    cz, cy, cx = D // 2, H // 2, W // 2
    xs = radii[:, None] * ux[None, :] + cx
    ys = radii[:, None] * uy[None, :] + cy
    zs = radii[:, None] * uz[None, :] + cz

    volj = jnp.asarray(vol, jnp.float32)
    z0 = jnp.floor(jnp.asarray(zs)).astype(jnp.int32)
    y0 = jnp.floor(jnp.asarray(ys)).astype(jnp.int32)
    x0 = jnp.floor(jnp.asarray(xs)).astype(jnp.int32)
    fz = jnp.asarray(zs) - z0
    fy = jnp.asarray(ys) - y0
    fx = jnp.asarray(xs) - x0
    vals = jnp.zeros(z0.shape, jnp.float32)
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                w = (jnp.where(dz, fz, 1 - fz) * jnp.where(dy, fy, 1 - fy)
                     * jnp.where(dx, fx, 1 - fx))
                vals = vals + w * volj[jnp.clip(z0 + dz, 0, D - 1),
                                       jnp.clip(y0 + dy, 0, H - 1),
                                       jnp.clip(x0 + dx, 0, W - 1)]
    Y = jnp.asarray(_sh_matrix(L))                      # (nlm, npts)
    return np.asarray(jnp.einsum("rp,lp->rl", vals.astype(jnp.complex64), Y))


# ---------------------------------------------------------------------------
# SO(3) correlation
# ---------------------------------------------------------------------------

def so3_correlation(flm, glm, L: int, n_beta: int = 64, n_ang: int = 128,
                    shell_w=None):
    """C(alpha, beta, gamma) grid from per-shell SH coefficients.

    flm/glm: (nR, (L+1)^2). Returns (C (n_beta, n_ang, n_ang) float64,
    betas): C[b, a, g] = correlation at alpha_a = 2 pi a / n_ang etc."""
    nR = flm.shape[0]
    if shell_w is None:
        shell_w = np.ones(nR)
    # T^l_{mm'} = sum_r w_r f_lm(r) conj(g_lm'(r))
    dtab, betas = _wigner_d_tables(L, n_beta)
    C = np.zeros((n_beta, n_ang, n_ang), np.complex128)
    M = np.zeros((n_beta, 2 * L + 1, 2 * L + 1), np.complex128)
    for l in range(L + 1):
        sl = slice(l * l, (l + 1) * (l + 1))
        F = flm[:, sl]                    # (nR, 2l+1) m = -l..l
        G = glm[:, sl]
        T = np.einsum("r,rm,rn->mn", shell_w, F, np.conj(G))
        # sum over l of d^l(beta) * T^l into the (m, m') accumulator
        lo = L - l
        M[:, lo:lo + 2 * l + 1, lo:lo + 2 * l + 1] += dtab[l] * T[None]
    # C(alpha,gamma | beta) = sum_mm' M_{mm'} e^{i m alpha} e^{i m' gamma}
    big = np.zeros((n_beta, n_ang, n_ang), np.complex128)
    idx = (np.arange(-L, L + 1)) % n_ang
    big[:, idx[:, None], idx[None, :]] = M
    C = np.fft.ifft2(big, axes=(1, 2)) * (n_ang * n_ang)
    return np.real(C), betas


def frm_align_volumes(v1, v2, L: int = 24, n_beta: int = 64,
                      n_ang: int = 128, refine: bool = True,
                      radii=None):
    """Best rotation matrix M (and ZYZ angles) aligning v2 onto v1:
    maximizes corr(v1, apply_affine_3d(v2, M)).

    Reference: interface/frm.h:35-52 (frm_align via sh_alignment); the
    translation part of the reference pipeline is handled by the caller
    (volume_align shift refinement)."""
    v1 = np.asarray(v1, np.float32)
    v2 = np.asarray(v2, np.float32)
    D = v1.shape[0]
    if radii is None:
        radii = np.arange(2.0, D // 2 - 1, 1.0)
    radii = np.asarray(radii, np.float64)
    flm = _shell_coeffs(v1 - v1.mean(), L, radii)
    glm = _shell_coeffs(v2 - v2.mean(), L, radii)
    C, betas = so3_correlation(flm, glm, L, n_beta, n_ang,
                               shell_w=radii ** 2)
    b, a, g = np.unravel_index(np.argmax(C), C.shape)
    alpha = 2 * np.pi * a / n_ang
    beta = betas[b]
    gamma = 2 * np.pi * g / n_ang
    M = _zyz_active(alpha, beta, gamma)

    if refine:
        M = _refine_rotation(v1, v2, M)
    return M


def _zyz_active(alpha, beta, gamma):
    """Active rotation R_z(alpha) R_y(beta) R_z(gamma) on (x, y, z)."""
    ca, sa = np.cos(alpha), np.sin(alpha)
    cb, sb = np.cos(beta), np.sin(beta)
    cg, sg = np.cos(gamma), np.sin(gamma)
    Rza = np.array([[ca, -sa, 0], [sa, ca, 0], [0, 0, 1.0]])
    Ryb = np.array([[cb, 0, sb], [0, 1.0, 0], [-sb, 0, cb]])
    Rzg = np.array([[cg, -sg, 0], [sg, cg, 0], [0, 0, 1.0]])
    return (Rza @ Ryb @ Rzg).astype(np.float32)


def _rotvec_mat(w):
    """Rodrigues rotation matrix from a rotation vector (numpy)."""
    th = np.linalg.norm(w)
    if th < 1e-12:
        return np.eye(3)
    k = w / th
    K = np.array([[0, -k[2], k[1]], [k[2], 0, -k[0]], [-k[1], k[0], 0]])
    return np.eye(3) + np.sin(th) * K + (1 - np.cos(th)) * (K @ K)


@partial(jax.jit, static_argnames=("n_rounds",))
def _refine_rotation_jit(v1, v2, M0, step0: float = 0.02,
                         n_rounds: int = 18):
    """Rotation polish as one device program: a compass search over the
    rotation-vector perturbation w (apply exp(w^) on the left of M0),
    all +/- candidates scored in a single vmapped correlation per round
    (a host scipy Powell pays one dispatch per evaluation)."""
    from xmipp3_tpu.ops.geo import apply_affine_3d
    v1c = v1 - v1.mean()
    n1 = jnp.linalg.norm(v1c)

    def rotvec(w):
        th = jnp.linalg.norm(w) + 1e-12
        k = w / th
        K = jnp.stack([
            jnp.stack([jnp.zeros(()), -k[2], k[1]]),
            jnp.stack([k[2], jnp.zeros(()), -k[0]]),
            jnp.stack([-k[1], k[0], jnp.zeros(())])])
        return (jnp.eye(3) + jnp.sin(th) * K
                + (1 - jnp.cos(th)) * (K @ K)).astype(jnp.float32)

    def cost(w):
        M = rotvec(w) @ M0
        r = apply_affine_3d(v2, M[None])[0]
        r = r - r.mean()
        return -(r * v1c).sum() / jnp.maximum(jnp.linalg.norm(r) * n1,
                                              1e-12)

    E = jnp.concatenate([jnp.zeros((1, 3), jnp.float32),
                         jnp.eye(3, dtype=jnp.float32),
                         -jnp.eye(3, dtype=jnp.float32)])

    def round_fn(carry, _):
        w, step, best = carry
        cands = w[None, :] + E * step
        costs = jax.vmap(cost)(cands)
        k = jnp.argmin(costs)
        improved = (k != 0) & (costs[k] < best - 1e-9)
        w = jnp.where(improved, cands[k], w)
        step = jnp.where(improved, step, step * 0.5)
        best = jnp.where(improved, costs[k], best)
        return (w, step, best), None

    w0 = jnp.zeros((3,), jnp.float32)
    (w, _, _), _ = jax.lax.scan(
        round_fn, (w0, jnp.float32(step0), cost(w0)), None,
        length=n_rounds)
    return rotvec(w) @ M0


def _refine_rotation(v1, v2, M0, iters: int = 40):
    """Polish of the rotation on the real-space correlation (device
    compass scan; see _refine_rotation_jit)."""
    return np.array(_refine_rotation_jit(
        jnp.asarray(v1, jnp.float32), jnp.asarray(v2, jnp.float32),
        jnp.asarray(M0, jnp.float32)), np.float32)
