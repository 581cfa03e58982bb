"""Mesh parallelism for the remaining heavy engines (round-3 VERDICT #5).

Covers the engines the reference runs under MPI wrappers that had no mesh
path yet:
  - image_rotational_pca  (reference image_rotational_pca.h:41, MPI-capable)
  - ctf_estimate_from_micrograph --mode regions (region grid is
    embarrassingly parallel)
  - angular_sph_alignment / forward_zernike family (per-particle DP)

Design: all three are pure batch computations, so data parallelism is
expressed by input shardings (NamedSharding over the sample axis) — XLA
partitions the jitted pipeline and inserts the collectives (the covariance
psum for PCA); no shard_map plumbing is needed.
"""
from __future__ import annotations

from functools import partial

import numpy as np

import jax
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

from xmipp3_tpu.parallel.mesh import pad_to_multiple


def shard_batch(arr, mesh, axis_name: str = "data"):
    """Device-put `arr` sharded along axis 0 of the mesh axis."""
    return jax.device_put(arr, NamedSharding(mesh, P(axis_name)))


@partial(jax.jit, static_argnames=())
def _cov_sums(X):
    # sums are over the (sharded) sample axis: XLA turns these into
    # per-device partial sums + one psum each over the ICI
    s1 = X.sum(axis=0)
    C = X.T @ X
    return s1, C


def parallel_pca_components(mesh, X, n_eig: int, axis_name: str = "data"):
    """Top-`n_eig` principal components of X (samples, D) with the sample
    axis sharded over the mesh: per-device partial covariance + one psum,
    then a host eigendecomposition of the (D, D) covariance.

    The mpi_image_rotational_pca analog (the reference distributes the
    Hmatrix/Wmatrix accumulations over MPI ranks,
    image_rotational_pca.h:41). Matches the serial SVD-based
    models.dimred.pca components up to sign."""
    X = np.asarray(X, np.float32)
    n, D = X.shape
    Xp, _ = pad_to_multiple(X, mesh.shape[axis_name])  # zero rows: no-ops
    Xd = shard_batch(jnp.asarray(Xp), mesh, axis_name)
    s1, C = _cov_sums(Xd)
    s1 = np.asarray(s1, np.float64)
    C = np.asarray(C, np.float64)
    mu = s1 / n
    # centered covariance from raw moments: C - n mu mu^T
    Cc = C - n * np.outer(mu, mu)
    w, V = np.linalg.eigh(Cc)
    order = np.argsort(w)[::-1][:n_eig]
    return V[:, order].T.copy()


def parallel_refine_defocus(mesh, psds, seed_params, sampling, axis_name:
                            str = "data", **kwargs):
    """refine_defocus_batch with the region axis sharded over the mesh
    (ctf_estimate_from_micrograph --mode regions is embarrassingly
    parallel over grid regions; the reference farms regions to MPI
    workers). Padded regions are fit too (same compute) and dropped."""
    from xmipp3_tpu.models.ctf_estimation import refine_defocus_batch
    psds = np.asarray(psds, np.float32)
    R = len(psds)
    psds_p, n_valid = pad_to_multiple(psds, mesh.shape[axis_name])
    psds_d = shard_batch(jnp.asarray(psds_p), mesh, axis_name)
    out = refine_defocus_batch(psds_d, seed_params, sampling, **kwargs)
    return np.asarray(out)[:n_valid]


def parallel_class_sums(mesh, imgs, psi, sx, sy, flip, assign, n_refs: int,
                        sel_weights=None, axis_name: str = "data"):
    """Class-average accumulation with the particle axis sharded over the
    mesh (the mpi_angular_class_average work split): each device registers
    its particle shard (apply_md_geometry) and accumulates one-hot class
    sums; ONE psum fuses (sums, counts). sel_weights (B,) of 0/1 folds
    the --select/--limit rejections into the same pass.

    Returns (sums (K,H,W), counts (K,))."""
    from functools import partial as _partial

    from xmipp3_tpu.ops.geo import apply_md_geometry
    imgs = np.asarray(imgs, np.float32)
    B, H, W = imgs.shape
    n_dev = mesh.shape[axis_name]
    w = np.ones(B, np.float32) if sel_weights is None \
        else np.asarray(sel_weights, np.float32)
    imgs_p, n_valid = pad_to_multiple(imgs, n_dev)
    pad1 = lambda v: pad_to_multiple(np.asarray(v, np.float32), n_dev)[0]
    w_p = pad1(w)
    w_p[n_valid:] = 0.0
    a_p = pad_to_multiple(np.asarray(assign, np.int32), n_dev)[0]

    @_partial(jax.shard_map, mesh=mesh, in_specs=(P(axis_name),) * 6,
              out_specs=(P(), P()))
    def shard_sums(im_l, psi_l, sx_l, sy_l, flip_l, wa_l):
        w_l = wa_l[:, 0]
        a_l = wa_l[:, 1].astype(jnp.int32)
        reg = apply_md_geometry(im_l, psi_l, sx_l, sy_l,
                                flip_l > 0.5)
        onehot = (jax.nn.one_hot(a_l, n_refs, dtype=jnp.float32)
                  * w_l[:, None])
        sums = jnp.einsum("bk,bhw->khw", onehot, reg)
        counts = onehot.sum(axis=0)
        return (jax.lax.psum(sums, axis_name),
                jax.lax.psum(counts, axis_name))

    wa = np.stack([w_p, a_p.astype(np.float32)], axis=1)
    sums, counts = shard_sums(
        jnp.asarray(imgs_p), jnp.asarray(pad1(psi)), jnp.asarray(pad1(sx)),
        jnp.asarray(pad1(sy)), jnp.asarray(pad1(flip)), jnp.asarray(wa))
    return np.asarray(sums), np.asarray(counts)


def parallel_filter_bank(mesh, v1r, v2r, r2, shape, bank_step,
                         bank_overlap, weight_fun, weight_power,
                         axis_name: str = "data"):
    """halves-restoration filter bank with the BAND axis sharded over the
    mesh (the cuda_volume_halves_restoration per-band loop, VERDICT r3
    #8): each device restores its band subset (band FFT + per-band noise
    eCDF + weighting), one psum fuses the three accumulators. Bands are
    independent by construction, so mesh == serial exactly."""
    from functools import partial as _partial

    from xmipp3_tpu.ops.halves_restoration import ecdf_prob
    n_dev = mesh.shape[axis_name]
    filter_step = bank_step * (1.0 - bank_overlap)
    n_bands = int(np.ceil(0.5 / filter_step - 1e-9))
    ws = np.arange(n_bands, dtype=np.float32) * filter_step
    ws_p = pad_to_multiple(ws, n_dev, fill=-1.0)[0]  # w<0 = inert band
    f_v1 = jnp.fft.rfftn(jnp.asarray(v1r))
    f_v2 = jnp.fft.rfftn(jnp.asarray(v2r))

    @_partial(jax.shard_map, mesh=mesh,
              in_specs=(P(axis_name), P(), P(), P()),
              out_specs=(P(), P(), P()))
    def shard_bands(ws_l, f1, f2, r2_l):
        def body(carry, w):
            m1, m2, ms = carry
            live = w >= 0.0
            band = (r2_l >= w * w) & (r2_l < (w + bank_step) ** 2) & live
            vf1 = jnp.fft.irfftn(jnp.where(band, f1, 0.0), s=shape)
            vf2 = jnp.fft.irfftn(jnp.where(band, f2, 0.0), s=shape)
            noise = 0.5 * (vf1 - vf2) ** 2
            cdf_n = jnp.sort(noise.ravel())
            e1 = vf1 * vf1
            e2 = vf2 * vf2
            w1 = ecdf_prob(cdf_n, noise.size, e1)
            w2 = ecdf_prob(cdf_n, noise.size, e2)
            if weight_fun == 0:
                weight = 0.5 * (w1 + w2)
            elif weight_fun == 1:
                weight = jnp.minimum(w1, w2)
            else:
                weight = 0.5 * (w1 + w2) * (
                    1.0 - jnp.abs(w1 - w2)
                    / jnp.maximum(w1 + w2, 1e-38))
            weight = weight ** weight_power
            vf1w = vf1 * weight
            vf2w = vf2 * weight
            m1 = m1 + vf1w
            m2 = m2 + vf2w
            ms = ms + jnp.where(e1 > e2, vf1w, vf2w)
            return (m1, m2, ms), None

        zero = jax.lax.pcast(jnp.zeros(shape, jnp.float32),
                             (axis_name,), to="varying")
        (m1, m2, ms), _ = jax.lax.scan(body, (zero, zero, zero), ws_l)
        return (jax.lax.psum(m1, axis_name),
                jax.lax.psum(m2, axis_name),
                jax.lax.psum(ms, axis_name))

    m1, m2, ms = shard_bands(jnp.asarray(ws_p), f_v1, f_v2,
                             jnp.asarray(r2))
    scale = 1.0 - bank_overlap
    return (np.asarray(m1) * scale, np.asarray(m2) * scale,
            np.asarray(ms) * scale)
