"""Helical symmetry ops: symmetrization and (rot, z) parameter search.

TPU-first rebuild of the reference's symmetry_Helical
(data/symmetries.cpp:1632-1705) and the helical branch of
volume_find_symmetry (volume_find_symmetry.cpp:359-420).  Instead of the
reference's per-voxel replica loop, each helical replica l is one
rotate+shift resampling of the whole volume evaluated as a batched
trilinear gather, and a candidate grid is evaluated by vmapping the
correlation objective over (rot, z) pairs — the natural layout for the
MXU/VPU.  Boundary micro-divergence: the reference's
interpolatedElement3DHelical recovers out-of-z corner taps from the
adjacent replica (symmetries.cpp:1577-1596); here those sub-voxel corner
reads are zero-padded, which only perturbs the last fractional slice.
"""
from __future__ import annotations

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["symmetrize_helical", "helical_correlation_grid",
           "helical_correlation"]


def _trilinear(vol, xs, ys, zs):
    """Sample vol (D,H,W) at float coords (array index space), zero
    outside."""
    D, H, W = vol.shape
    x0 = jnp.floor(xs).astype(jnp.int32)
    y0 = jnp.floor(ys).astype(jnp.int32)
    z0 = jnp.floor(zs).astype(jnp.int32)
    fx = xs - x0
    fy = ys - y0
    fz = zs - z0
    out = 0.0
    for dz in (0, 1):
        for dy in (0, 1):
            for dx in (0, 1):
                xi = x0 + dx
                yi = y0 + dy
                zi = z0 + dz
                inside = ((xi >= 0) & (xi < W) & (yi >= 0) & (yi < H)
                          & (zi >= 0) & (zi < D))
                v = vol[jnp.clip(zi, 0, D - 1), jnp.clip(yi, 0, H - 1),
                        jnp.clip(xi, 0, W - 1)]
                wgt = (jnp.where(dx, fx, 1 - fx) * jnp.where(dy, fy, 1 - fy)
                       * jnp.where(dz, fz, 1 - fz))
                out = out + jnp.where(inside, v, 0.0) * wgt
    return out


@partial(jax.jit, static_argnames=("l_max", "cn", "dihedral"))
def _symmetrize_helical_jit(vol, z_shift, rot_rad, l_max, cn, dihedral,
                            height_fraction):
    D, H, W = vol.shape
    cz, cy, cx = D // 2, H // 2, W // 2
    # logical (centered) coordinates, Xmipp origin
    k = (jnp.arange(D, dtype=jnp.float32) - cz)[:, None, None]
    i = (jnp.arange(H, dtype=jnp.float32) - cy)[None, :, None]
    j = (jnp.arange(W, dtype=jnp.float32) - cx)[None, None, :]
    hz = jnp.round(height_fraction * D)
    z_first = -jnp.floor(hz / 2)                  # FIRST_XMIPP_INDEX
    z_last = z_first + hz - 1                     # LAST_XMIPP_INDEX
    z_half = jnp.floor(0.5 * z_shift)

    acc = jnp.zeros_like(vol)
    norm = jnp.zeros_like(vol)
    for l in range(-l_max, l_max + 1):
        kp = k + l * z_shift                                     # (D,1,1)
        in_h = (kp >= z_first) & (kp <= z_last)
        w = jnp.where(kp - z_first <= z_half,
                      (kp - z_first + 1) / (z_half + 1),
                      jnp.where(z_last - kp <= z_half,
                                (z_last + 1 - kp) / (z_half + 1), 1.0))
        w = jnp.where(in_h, w, 0.0)
        for n in range(cn):
            ang = l * rot_rad + n * (2 * np.pi / cn)
            ca, sa = jnp.cos(ang), jnp.sin(ang)
            jp = ca * j - sa * i
            ip = sa * j + ca * i
            s = _trilinear(vol, jp + cx, ip + cy,
                           jnp.broadcast_to(kp, vol.shape) + cz)
            acc = acc + w * s
            norm = norm + w * jnp.ones_like(s)
            if dihedral:
                sd = _trilinear(vol, jp + cx, -ip + cy,
                                jnp.broadcast_to(-kp, vol.shape) + cz)
                acc = acc + w * sd
                norm = norm + w * jnp.ones_like(sd)
    return jnp.where(norm > 0, acc / jnp.maximum(norm, 1e-12), 0.0)


def symmetrize_helical(vol, z_shift, rot_deg, cn: int = 1,
                       dihedral: bool = False,
                       height_fraction: float = 1.0,
                       l_max: int | None = None):
    """Helically symmetrized volume; z_shift in voxels, rot in degrees."""
    vol = jnp.asarray(vol, jnp.float32)
    if l_max is None:
        l_max = int(np.ceil(vol.shape[0] / max(float(z_shift), 0.5))) + 1
    return _symmetrize_helical_jit(vol, jnp.float32(z_shift),
                                   jnp.float32(np.deg2rad(rot_deg)),
                                   int(l_max), int(cn), bool(dihedral),
                                   jnp.float32(height_fraction))


def _masked_corr(a, b, mask):
    n = jnp.maximum(mask.sum(), 1.0)
    am = (a * mask).sum() / n
    bm = (b * mask).sum() / n
    ac = (a - am) * mask
    bc = (b - bm) * mask
    return (ac * bc).sum() / jnp.maximum(
        jnp.sqrt((ac * ac).sum() * (bc * bc).sum()), 1e-12)


@partial(jax.jit, static_argnames=("l_max", "cn", "dihedral"))
def _helical_corr_jit(vol, mask, z_shift, rot_rad, l_max, cn, dihedral,
                      height_fraction):
    vs = _symmetrize_helical_jit(vol, z_shift, rot_rad, l_max, cn,
                                 dihedral, height_fraction)
    return _masked_corr(vol, vs, mask)


def helical_correlation(vol, z_shift, rot_deg, cn=1, dihedral=False,
                        height_fraction=1.0, mask=None,
                        l_max: int | None = None):
    vol = jnp.asarray(vol, jnp.float32)
    if mask is None:
        mask = jnp.ones_like(vol)
    else:
        mask = jnp.asarray(mask, jnp.float32)
    if l_max is None:
        l_max = int(np.ceil(vol.shape[0] / max(float(z_shift), 0.5))) + 1
    return _helical_corr_jit(vol, mask, jnp.float32(z_shift),
                             jnp.float32(np.deg2rad(rot_deg)), int(l_max),
                             int(cn), bool(dihedral),
                             jnp.float32(height_fraction))


def helical_correlation_grid(vol, z_values, rot_values_deg, cn=1,
                             dihedral=False, height_fraction=1.0,
                             mask=None, chunk: int = 16):
    """Correlation map over the (rot, z) grid — rows are rotations,
    columns z shifts (the reference's output.xmp layout,
    volume_find_symmetry.cpp:294-307).  One vmapped dispatch per chunk."""
    vol = jnp.asarray(vol, jnp.float32)
    if mask is None:
        mask = jnp.ones_like(vol)
    else:
        mask = jnp.asarray(mask, jnp.float32)
    z_values = np.asarray(z_values, np.float32)
    rot_values = np.asarray(rot_values_deg, np.float32)
    l_max = int(np.ceil(vol.shape[0] / max(float(z_values.min()), 0.5))) + 1
    zz, rr = np.meshgrid(z_values, rot_values)       # (R, Z)
    pairs = np.stack([zz.ravel(), np.deg2rad(rr.ravel())], axis=1)
    f = jax.jit(jax.vmap(
        lambda p: _helical_corr_jit(vol, mask, p[0], p[1], l_max, cn,
                                    dihedral,
                                    jnp.float32(height_fraction))),
        static_argnums=())
    out = []
    for c0 in range(0, len(pairs), chunk):
        out.append(np.asarray(f(jnp.asarray(pairs[c0:c0 + chunk]))))
    return np.concatenate(out).reshape(len(rot_values), len(z_values))
