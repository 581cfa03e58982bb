"""Projection operators: Fourier central-slice and real-space ray casting.

Replaces the reference FourierProjector (data/fourier_projection.h:111,
projectVolume :177; GPU twin cuda_fourier_projection.cu:17) and the
real-space projectVolume (data/projection.h:196).

TPU design: the padded volume is 3-D FFT'd ONCE; each projection is a batched
trilinear gather of a rotated central slice from the complex cube, followed by
a batched irfft2 — thousands of projections become one vmapped gather + one
batched FFT, no per-image host logic. The adjoint of the same gather (via
jax.vjp) IS the gridding backprojection used by ops.reconstruct.

Conventions: Euler ZYZ (core.geometry.euler_matrix); the projection of the
volume along direction A[2] has its 2D FFT equal to the central slice spanned
by rows A[0], A[1] of the volume FFT. Projections are (B, N, N) float32 for an
(N,N,N) volume.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from xmipp3_tpu.core.geometry import euler_matrix


def prepare_fourier_volume(vol, pad_factor: float = 2.0):
    """Pad (centered), FFT, fftshift -> complex cube ready for slicing.

    Returns (vf, pad_n): vf is the centered full FFT of the padded volume,
    with fftshift applied on all axes and the phase convention arranged so
    that gathered slices invert directly to centered projections."""
    vol = jnp.asarray(vol, jnp.float32)
    N = vol.shape[-1]
    pad_n = int(round(N * pad_factor))
    pad_n += pad_n % 2
    from xmipp3_tpu.ops.geo import window_2d  # noqa  (2D only; pad manually)
    p = (pad_n - N)
    lo = p // 2 + (p % 2)
    hi = p - lo
    volp = jnp.pad(vol, ((lo, hi), (lo, hi), (lo, hi)))
    # center the volume origin at array origin for FFT phase: ifftshift
    vf = jnp.fft.fftshift(jnp.fft.fftn(jnp.fft.ifftshift(volp)))
    return vf, pad_n


@partial(jax.jit, static_argnames=("out_n",))
def extract_central_slices(vf, mats, out_n: int):
    """Gather rotated central slices from the centered FFT cube.

    vf: (P,P,P) complex64 centered FFT; mats: (B,3,3) Euler matrices
    (rows = projection plane basis in volume coords); out_n: output image size
    (its frequency grid is scaled to the padded cube).

    Returns (B, out_n, out_n//2+1) complex64 rfft-layout slices."""
    P = vf.shape[0]
    c = P // 2
    # frequency grid of the output image (digital, cycles/sample)
    fy = jnp.fft.fftfreq(out_n).astype(jnp.float32)
    fx = jnp.fft.rfftfreq(out_n).astype(jnp.float32)
    # continuous frequency coords in the padded cube's index units:
    # k_pad = f * P  (f in cycles/output-sample * out_n/P... careful):
    # The projection has sampling 1 px; its FFT sample f corresponds to
    # volume-frequency f (cycles/px), which sits at index f*P in the cube.
    KX = jnp.broadcast_to(fx[None, :], (out_n, fx.shape[0]))
    KY = jnp.broadcast_to(fy[:, None], (out_n, fx.shape[0]))

    vr = jnp.real(vf)
    vi = jnp.imag(vf)

    def one(M):
        # 3D frequency = kx * e_x + ky * e_y (rows 0,1 of M)
        kx = KX * P
        ky = KY * P
        gz = kx * M[0, 2] + ky * M[1, 2]
        gy = kx * M[0, 1] + ky * M[1, 1]
        gx = kx * M[0, 0] + ky * M[1, 0]
        zi = gz + c
        yi = gy + c
        xi = gx + c
        z0 = jnp.floor(zi).astype(jnp.int32)
        y0 = jnp.floor(yi).astype(jnp.int32)
        x0 = jnp.floor(xi).astype(jnp.int32)
        fz, fyw, fxw = zi - z0, yi - y0, xi - x0
        outr = jnp.zeros_like(zi)
        outi = jnp.zeros_like(zi)
        for dz in range(2):
            wz = jnp.where(dz, fz, 1 - fz)
            for dy in range(2):
                wy = jnp.where(dy, fyw, 1 - fyw)
                for dx in range(2):
                    wx = jnp.where(dx, fxw, 1 - fxw)
                    w = wz * wy * wx
                    zj = jnp.clip(z0 + dz, 0, P - 1)
                    yj = jnp.clip(y0 + dy, 0, P - 1)
                    xj = jnp.clip(x0 + dx, 0, P - 1)
                    inside = ((z0 + dz >= 0) & (z0 + dz < P) &
                              (y0 + dy >= 0) & (y0 + dy < P) &
                              (x0 + dx >= 0) & (x0 + dx < P))
                    w = jnp.where(inside, w, 0.0)
                    outr = outr + w * vr[zj, yj, xj]
                    outi = outi + w * vi[zj, yj, xj]
        return outr + 1j * outi

    return jax.vmap(one)(jnp.asarray(mats, jnp.float32))


@partial(jax.jit, static_argnames=("out_n",))
def slices_to_projections(slices, out_n: int):
    """Inverse-FFT rfft-layout central slices into centered projections.

    No extra scaling: by the discrete projection-slice theorem the gathered
    slice values ARE the projection's DFT (the padded volume was ifftshifted
    before fftn, so phases correspond to the centered origin)."""
    imgs = jnp.fft.irfft2(slices, s=(out_n, out_n))
    return jnp.fft.fftshift(imgs, axes=(-2, -1))


class FourierProjector:
    """Volume -> many projections via one 3D FFT + batched slice gathers.

    Mirrors the reference FourierProjector API shape (pad once, project many;
    data/fourier_projection.h:111)."""

    def __init__(self, vol, pad_factor: float = 2.0):
        vol = np.asarray(vol, np.float32)
        self.N = vol.shape[-1]
        self.vf, self.pad_n = prepare_fourier_volume(vol, pad_factor)

    def project_euler(self, rot, tilt, psi, shifts=None):
        """Batched projection at Euler angles (degrees). Optional (B,2) shifts
        applied in Fourier space. Returns (B, N, N) float32."""
        rot = np.atleast_1d(np.asarray(rot, np.float32))
        tilt = np.atleast_1d(np.asarray(tilt, np.float32))
        psi = np.atleast_1d(np.asarray(psi, np.float32))
        mats = np.asarray(euler_matrix(rot, tilt, psi), np.float32)
        slices = extract_central_slices(self.vf, mats, self.N)
        if shifts is not None:
            from xmipp3_tpu.ops.fourier import shift_spec_2d
            slices = shift_spec_2d(slices, jnp.asarray(shifts[:, 0]),
                                   jnp.asarray(shifts[:, 1]),
                                   self.N, self.N)
        return slices_to_projections(slices, self.N)


def project_real_space(vol, rot, tilt, psi, order: int = 1):
    """Ray-casting projector: rotate the volume so the projection direction
    becomes z, then sum along z (reference projectVolume, data/projection.h:196).
    Batched over angles. Returns (B, N, N)."""
    from xmipp3_tpu.ops.geo import apply_affine_3d
    rot = np.atleast_1d(rot)
    tilt = np.atleast_1d(tilt)
    psi = np.atleast_1d(psi)
    mats = np.asarray(euler_matrix(rot, tilt, psi), np.float32)
    rotated = apply_affine_3d(vol, mats)        # out(x) = vol(M^-1 x)=vol(M^T x)
    return jnp.sum(rotated, axis=1)
