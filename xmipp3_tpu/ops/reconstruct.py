"""Direct Fourier 3-D reconstruction (gridding backprojection).

Replaces the reference reconstruct_fourier family (reconstruction/
reconstruct_fourier.{h,cpp} pthread pipeline, reconstruct_fourier_accel,
cuda_gpu_reconstruct_fourier.cpp atomicAdd scatter kernels :500-660) with a
TPU-native design: per chunk of particles, the 2-D FFTs, shift phases and
trilinear footprint coordinates are computed batched, flattened into ONE
scatter-add per chunk into the padded Fourier cube (XLA scatter replaces CUDA
atomics), with the weight cube accumulated the same way. Hermitian symmetry
is enforced once at the end (V(k) += conj(V(-k))), then weight-normalized,
inverse-FFT'd and compensated for the trilinear gridding kernel (sinc²).

The forward operator (ops.project.extract_central_slices) and this adjoint
share coordinate conventions, so project->backproject round-trips are
consistent (the basis of iterative schemes: ART/SIRT in ops, later).
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.core.geometry import euler_matrix


def _disk_mask(out_n: int, max_freq: float):
    """STATIC boolean mask of rfft2 samples inside the resolution cutoff —
    samples outside contribute nothing, and scatter updates are the whole
    cost of backprojection (measured ~90 M updates/s hard ceiling on TPU),
    so they are compacted away at trace time."""
    fy = np.fft.fftfreq(out_n).astype(np.float32)
    fx = np.fft.rfftfreq(out_n).astype(np.float32)
    r = np.sqrt(fy[:, None] ** 2 + fx[None, :] ** 2)
    return r <= max_freq


def _slice_tap_coords(mats, out_n: int, P: int, keep=None):
    """Frequency coords of each kept slice sample in cube index space.

    mats (C,3,3) -> zi, yi, xi each (C, S) float32 where S = kept samples
    (static mask `keep`, or all out_n*(out_n//2+1))."""
    c = P // 2
    fy = np.fft.fftfreq(out_n).astype(np.float32)
    fx = np.fft.rfftfreq(out_n).astype(np.float32)
    KX = (np.broadcast_to(fx[None, :], (out_n, fx.shape[0])) * P)
    KY = (np.broadcast_to(fy[:, None], (out_n, fx.shape[0])) * P)
    if keep is not None:
        KX, KY = KX[keep], KY[keep]
    KX = jnp.asarray(KX.ravel())
    KY = jnp.asarray(KY.ravel())

    def one(M):
        gx = KX * M[0, 0] + KY * M[1, 0]
        gy = KX * M[0, 1] + KY * M[1, 1]
        gz = KX * M[0, 2] + KY * M[1, 2]
        return gz + c, gy + c, gx + c

    return jax.vmap(one)(mats)


@partial(jax.jit, static_argnames=("P", "max_freq", "slab_p"))
def backproject_chunk(data_r, data_i, weights, imgs, mats, sx, sy, img_w,
                      P: int, max_freq: float = 0.5, slab_p: int | None = None,
                      slab_z0=0):
    """Accumulate a chunk of particles into the Fourier cube.

    data_r/data_i/weights: (P,P,P) float32 accumulators (fftshift layout).
    imgs: (C,N,N) float32 particles; mats: (C,3,3); sx/sy: (C,) alignment
    shifts (metadata shiftX/shiftY convention); img_w: (C,) weights.
    Returns updated accumulators.

    kz-slab sharding: with slab_p set, the accumulators are a
    (slab_p, P, P) z-slab starting at (traced) slab_z0 — updates outside
    the slab are masked, so each mesh device can own one slab of a volume
    too large to replicate (SURVEY §7 phase 4)."""
    C, N, _ = imgs.shape
    # 2-D FFT with centered-origin phase convention + shift correction
    spec = jnp.fft.rfft2(jnp.fft.ifftshift(imgs, axes=(-2, -1)))
    fy = jnp.fft.fftfreq(N).astype(jnp.float32)[None, :, None]
    fx = jnp.fft.rfftfreq(N).astype(jnp.float32)[None, None, :]
    phase = jnp.exp(-2j * jnp.pi * (fx * sx[:, None, None] +
                                    fy * sy[:, None, None]))
    spec = spec * phase

    # resolution cutoff: samples outside the disk are dropped STATICALLY
    # (compile-time index set) — scatter updates dominate the whole cost
    keep = _disk_mask(N, max_freq)
    flat_keep = np.flatnonzero(keep.ravel())              # static indices
    spec = spec.reshape(C, -1)[:, flat_keep]              # (C, S)
    wimg = jnp.broadcast_to(img_w[:, None], spec.shape)

    zi, yi, xi = _slice_tap_coords(mats, N, P, keep=keep)
    z0 = jnp.floor(zi).astype(jnp.int32)
    y0 = jnp.floor(yi).astype(jnp.int32)
    x0 = jnp.floor(xi).astype(jnp.int32)
    fz, fyw, fxw = zi - z0, yi - y0, xi - x0

    sr = jnp.real(spec) * wimg
    si = jnp.imag(spec) * wimg

    zdim = P if slab_p is None else slab_p
    zoff = 0 if slab_p is None else jnp.asarray(slab_z0, jnp.int32)

    idx_list = []
    val_r = []
    val_i = []
    val_w = []
    for dz in range(2):
        wz = jnp.where(dz, fz, 1 - fz)
        for dy in range(2):
            wy = jnp.where(dy, fyw, 1 - fyw)
            for dx in range(2):
                wx = jnp.where(dx, fxw, 1 - fxw)
                w = wz * wy * wx
                zj = z0 + dz - zoff
                yj = y0 + dy
                xj = x0 + dx
                inside = ((zj >= 0) & (zj < zdim) & (yj >= 0) & (yj < P)
                          & (xj >= 0) & (xj < P))
                w = jnp.where(inside, w, 0.0)
                flat = ((jnp.clip(zj, 0, zdim - 1) * P +
                         jnp.clip(yj, 0, P - 1)) * P +
                        jnp.clip(xj, 0, P - 1)).reshape(-1)
                idx_list.append(flat)
                val_r.append((w * sr).reshape(-1))
                val_i.append((w * si).reshape(-1))
                val_w.append((w * wimg).reshape(-1))

    idx = jnp.concatenate(idx_list)
    vr = jnp.concatenate(val_r)
    vi = jnp.concatenate(val_i)
    vw = jnp.concatenate(val_w)

    data_r = data_r.reshape(-1).at[idx].add(vr).reshape(zdim, P, P)
    data_i = data_i.reshape(-1).at[idx].add(vi).reshape(zdim, P, P)
    weights = weights.reshape(-1).at[idx].add(vw).reshape(zdim, P, P)
    return data_r, data_i, weights


def _conj_mirror(a):
    """x(k) -> x(-k) in fftshift layout (even sizes)."""
    return jnp.roll(a[::-1, ::-1, ::-1], (1, 1, 1), axis=(0, 1, 2))


@partial(jax.jit, static_argnames=("N", "P"))
def finalize_volume(data_r, data_i, weights, N: int, P: int,
                    min_weight: float = 1e-3):
    """Hermitian-symmetrize, normalize by weights, inverse FFT, crop,
    compensate the trilinear kernel (reference finishComputations,
    reconstruct_fourier.cpp:1103-1180)."""
    dr = data_r + _conj_mirror(data_r)
    di = data_i - _conj_mirror(data_i)
    w = weights + _conj_mirror(weights)
    V = (dr + 1j * di) / jnp.maximum(w, min_weight)
    V = jnp.where(w > min_weight, V, 0.0)
    vol = jnp.real(jnp.fft.fftshift(jnp.fft.ifftn(jnp.fft.ifftshift(V))))
    # crop padding (centered)
    lo = (P - N) // 2 + (P - N) % 2
    vol = vol[lo:lo + N, lo:lo + N, lo:lo + N]
    # compensate trilinear interpolation kernel: divide by sinc^2 per axis
    x = (jnp.arange(N, dtype=jnp.float32) - N // 2) / P
    s = jnp.sinc(x) ** 2
    comp = s[:, None, None] * s[None, :, None] * s[None, None, :]
    return vol / jnp.maximum(comp, 1e-3)


class FourierReconstructor:
    """Streaming direct-Fourier reconstructor.

    Usage: r = FourierReconstructor(N, pad=2); r.add_batch(imgs, rot, tilt,
    psi, sx, sy, w); vol = r.finish(). Symmetry is applied by adding each
    batch once per symmetry rotation (reference R_repository loop)."""

    def __init__(self, N: int, pad_factor: float = 2.0, sym: str = "c1",
                 max_freq: float = 0.5):
        self.N = N
        P = int(round(N * pad_factor))
        P += P % 2
        self.P = P
        self.max_freq = max_freq
        self.data_r = jnp.zeros((P, P, P), jnp.float32)
        self.data_i = jnp.zeros((P, P, P), jnp.float32)
        self.weights = jnp.zeros((P, P, P), jnp.float32)
        from xmipp3_tpu.core.sym import SymList
        self.sym = SymList(sym)

    def add_batch(self, imgs, rot, tilt, psi, sx=None, sy=None, weights=None,
                  flip=None):
        imgs = jnp.asarray(imgs, jnp.float32)
        if imgs.ndim == 2:
            imgs = imgs[None]
        C = imgs.shape[0]
        z = np.zeros(C, np.float32)
        sx = z if sx is None else np.asarray(sx, np.float32)
        sy = z if sy is None else np.asarray(sy, np.float32)
        if flip is not None and np.any(flip):
            # stored flip: shift(img, s) = M_x proj(pose). Backproject the
            # x-mirrored image with negated shiftX instead.
            f = np.asarray(flip).astype(bool)
            fj = jnp.asarray(f)
            imgs = jnp.where(fj[:, None, None], imgs[:, :, ::-1], imgs)
            sx = np.where(f, -sx, sx)
        w = np.ones(C, np.float32) if weights is None else \
            np.asarray(weights, np.float32)
        A = np.asarray(euler_matrix(np.asarray(rot, np.float32),
                                    np.asarray(tilt, np.float32),
                                    np.asarray(psi, np.float32)), np.float32)
        if A.ndim == 2:
            A = np.broadcast_to(A[None], (C, 3, 3))
        for S in self.sym.sym_matrices():
            # symmetry-equivalent pose: volume rotated by S ~ slice at A·S
            Asym = np.einsum("cij,jk->cik", A, S.astype(np.float32))
            self.data_r, self.data_i, self.weights = backproject_chunk(
                self.data_r, self.data_i, self.weights, imgs,
                jnp.asarray(Asym), jnp.asarray(sx), jnp.asarray(sy),
                jnp.asarray(w), self.P, self.max_freq)

    def finish(self):
        return finalize_volume(self.data_r, self.data_i, self.weights,
                               self.N, self.P)


def reconstruct_fourier(imgs, rot, tilt, psi, sx=None, sy=None, weights=None,
                        pad_factor: float = 2.0, sym: str = "c1",
                        batch: int = 256, max_freq: float = 0.5, flip=None):
    """One-call reconstruction of a full stack."""
    imgs = np.asarray(imgs, np.float32)
    N = imgs.shape[-1]
    rec = FourierReconstructor(N, pad_factor, sym, max_freq)
    B = imgs.shape[0]
    for s in range(0, B, batch):
        sl = slice(s, min(s + batch, B))
        rec.add_batch(imgs[sl], np.asarray(rot)[sl], np.asarray(tilt)[sl],
                      np.asarray(psi)[sl],
                      None if sx is None else np.asarray(sx)[sl],
                      None if sy is None else np.asarray(sy)[sl],
                      None if weights is None else np.asarray(weights)[sl],
                      None if flip is None else np.asarray(flip)[sl])
    return rec.finish()
