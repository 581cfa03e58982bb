"""Normal Mode Analysis: elastic-network modes + mode-based deformation.

Rebuilds the capability of the reference NMA stack (nma_alignment.{h,cpp},
nma_alignment_vol, pdb_nma_deform — which consume externally computed mode
files and fit amplitudes with the CONDOR optimizer): here the modes
themselves are computed (Tirion anisotropic elastic network over
pseudoatoms), deformation fields are interpolated from atom displacements,
and amplitude fitting is batched Adam on the correlation objective
(replacing CONDOR, SURVEY.md §2.6).

Mode file format: text, one row per atom with 3 columns (x y z displacement),
concatenated per mode — compatible with the reference's `.mod` usage where a
metadata lists one file per mode (nmaModefile column).
"""
from __future__ import annotations

import numpy as np

import jax
import jax.numpy as jnp


def elastic_network_modes(coords: np.ndarray, n_modes: int = 6,
                          cutoff: float | None = None):
    """Tirion ENM normal modes of a point model.

    coords (N,3); returns (n_modes, N, 3) mass-normalized modes (lowest
    nonrigid frequencies first) and their eigenvalues."""
    coords = np.asarray(coords, np.float64)
    N = len(coords)
    if cutoff is None:
        # typical: ~1.5x the mean nearest-neighbor distance x 2
        from scipy.spatial import cKDTree
        d, _ = cKDTree(coords).query(coords, k=2)
        cutoff = 3.0 * np.median(d[:, 1])
    H = np.zeros((3 * N, 3 * N))
    for i in range(N):
        for j in range(i + 1, N):
            dv = coords[j] - coords[i]
            r2 = float(dv @ dv)
            if r2 > cutoff * cutoff or r2 == 0:
                continue
            k = np.outer(dv, dv) / r2
            H[3 * i:3 * i + 3, 3 * j:3 * j + 3] -= k
            H[3 * j:3 * j + 3, 3 * i:3 * i + 3] -= k
            H[3 * i:3 * i + 3, 3 * i:3 * i + 3] += k
            H[3 * j:3 * j + 3, 3 * j:3 * j + 3] += k
    w, v = np.linalg.eigh(H)
    # skip the 6 rigid-body zero modes
    idx = np.argsort(w)[6:6 + n_modes]
    modes = v[:, idx].T.reshape(n_modes, N, 3)
    # normalize to unit max displacement
    norms = np.linalg.norm(modes, axis=2).max(axis=1, keepdims=True)
    modes = modes / np.maximum(norms[:, :, None], 1e-12)
    return modes.astype(np.float32), w[idx].astype(np.float32)


def write_modes(path_root: str, modes: np.ndarray) -> list[str]:
    files = []
    for m in range(len(modes)):
        fn = f"{path_root}_mode{m + 1:03d}.mod"
        np.savetxt(fn, modes[m], fmt="%.6f")
        files.append(fn)
    return files


def read_mode(path: str) -> np.ndarray:
    return np.loadtxt(path).astype(np.float32)


def displacement_field(coords, modes, amplitudes, size: int,
                       sampling: float = 1.0, sigma: float = 3.0):
    """Dense (3, D, D, D) displacement field from per-atom mode displacements
    (gaussian-kernel scattered-data interpolation, normalized)."""
    coords = np.asarray(coords, np.float64) / sampling + size // 2
    disp = np.einsum("m,mnk->nk", np.asarray(amplitudes, np.float64),
                     np.asarray(modes, np.float64)) / sampling
    field = np.zeros((3, size, size, size), np.float32)
    weight = np.zeros((size, size, size), np.float32)
    r = max(int(2 * sigma), 1)
    offs = np.arange(-r, r + 1)
    dz, dy, dx = np.meshgrid(offs, offs, offs, indexing="ij")
    kern0 = np.exp(-(dz ** 2 + dy ** 2 + dx ** 2) / (2 * sigma ** 2))
    for n in range(len(coords)):
        x, y, z = coords[n]
        iz, iy, ix = int(round(z)), int(round(y)), int(round(x))
        if not (r <= ix < size - r and r <= iy < size - r and
                r <= iz < size - r):
            continue
        for c in range(3):
            field[c, iz - r:iz + r + 1, iy - r:iy + r + 1,
                  ix - r:ix + r + 1] += disp[n, c] * kern0
        weight[iz - r:iz + r + 1, iy - r:iy + r + 1,
               ix - r:ix + r + 1] += kern0
    w = np.maximum(weight, 1e-6)
    return field / w[None]


@jax.jit
def warp_volume_field(vol, field):
    """Backward warp of a volume by a dense (3,D,D,D) displacement field
    (x,y,z components)."""
    vol = jnp.asarray(vol, jnp.float32)
    D = vol.shape[0]
    z, y, x = jnp.mgrid[0:D, 0:D, 0:D].astype(jnp.float32)
    zi = z - field[2]
    yi = y - field[1]
    xi = x - field[0]
    z0 = jnp.floor(zi).astype(jnp.int32)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x0 = jnp.floor(xi).astype(jnp.int32)
    fz, fy, fx = zi - z0, yi - y0, xi - x0
    out = jnp.zeros_like(vol)
    for dz in range(2):
        for dy in range(2):
            for dx in range(2):
                w = (jnp.where(dz, fz, 1 - fz) * jnp.where(dy, fy, 1 - fy)
                     * jnp.where(dx, fx, 1 - fx))
                out = out + w * vol[jnp.clip(z0 + dz, 0, D - 1),
                                    jnp.clip(y0 + dy, 0, D - 1),
                                    jnp.clip(x0 + dx, 0, D - 1)]
    return out


def fit_mode_amplitudes(vol_ref, vol_target, coords, modes, sampling=1.0,
                        n_steps: int = 60, lr: float = 0.5, verbose: int = 0,
                        optimizer: str = "adam"):
    """Fit NMA amplitudes deforming vol_ref onto vol_target.

    Differentiable chain: amplitudes -> per-mode dense fields (precomputed
    per unit amplitude, linear) -> warp -> NCC. Returns (amplitudes, ncc).

    optimizer: 'adam' (device lax.scan gradient descent, default — A/B
    measured equal-or-better amplitude recovery on the
    tests/test_nma_validation.py fixtures) or 'trust' (host COBYQA
    trust-region DFO, the CONDOR role — reference external/condor used
    by nma_alignment.h:40; derivative-free, for non-smooth objectives
    where gradient methods stall)."""
    D = vol_ref.shape[0]
    M = len(modes)
    unit_fields = np.stack([
        displacement_field(coords, modes[m:m + 1], [1.0], D, sampling)
        for m in range(M)])                        # (M,3,D,D,D)
    uf = jnp.asarray(unit_fields)
    vr = jnp.asarray(vol_ref, jnp.float32)
    vt = jnp.asarray(vol_target, jnp.float32)

    def loss(amp):
        field = jnp.einsum("m,mczyx->czyx", amp, uf)
        warped = warp_volume_field(vr, field)
        am = warped - warped.mean()
        bm = vt - vt.mean()
        return -(am * bm).sum() / jnp.maximum(
            jnp.sqrt((am ** 2).sum() * (bm ** 2).sum()), 1e-12)

    if optimizer == "trust":
        import jax as _jax

        from xmipp3_tpu.ops.optim import trust_region_dfo
        loss_j = _jax.jit(loss)
        amp, best = trust_region_dfo(
            lambda a: loss_j(jnp.asarray(a, jnp.float32)),
            np.zeros(M, np.float32), max_nfev=max(8 * n_steps, 120),
            rhobeg=2.0 * lr)
        if verbose:
            print(f"  nma refine (trust-region DFO): NCC {-best:.4f}")
        return np.asarray(amp), -best
    from xmipp3_tpu.ops.optim import adam_scan
    amp, last = adam_scan(loss, jnp.zeros(M, jnp.float32), n_steps, lr)
    if verbose:
        print(f"  nma refine ({n_steps} steps): NCC {-float(last):.4f}")
    return np.asarray(amp), -float(loss(amp))
