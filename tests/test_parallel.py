"""Multi-device tests on the virtual 8-device CPU mesh (the reference's
'mpirun -np 2 equals serial' strategy, SURVEY.md §4, tested as
'mesh result equals single-device result')."""
import numpy as np
import pytest

pytestmark = pytest.mark.slow

import jax

from xmipp3_tpu.parallel import data_mesh, parallel_match, parallel_reconstruct
from xmipp3_tpu.core.sampling import compute_sampling_points
from xmipp3_tpu.ops.project import FourierProjector
from xmipp3_tpu.ops.reconstruct import reconstruct_fourier


def make_phantom(n=32):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    z, y, x = z - n // 2, y - n // 2, x - n // 2
    vol = np.zeros((n, n, n), np.float32)
    for cz, cy, cx, s, a in [(0, 0, 0, 2.5, 1.0), (4, -3, 3, 1.5, 0.8),
                             (-3, 3, -2, 1.8, 0.6), (-5, -4, 1, 1.0, 1.1)]:
        vol += a * np.exp(-((z - cz) ** 2 + (y - cy) ** 2 + (x - cx) ** 2)
                          / (2 * s ** 2))
    return vol


def test_virtual_mesh_present():
    assert len(jax.devices()) == 8


def test_parallel_reconstruct_matches_serial():
    vol = make_phantom(32)
    angles = compute_sampling_points(14.0)
    proj = FourierProjector(vol)
    psis = np.zeros(len(angles), np.float32)
    imgs = np.asarray(proj.project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        psis))
    serial = np.asarray(reconstruct_fourier(
        imgs, angles[:, 0], angles[:, 1], psis, batch=len(imgs)))
    mesh = data_mesh(8)
    par = np.asarray(parallel_reconstruct(
        mesh, imgs, angles[:, 0], angles[:, 1], psis))
    # same algorithm, different partition: must agree to float tolerance
    scale = np.abs(serial).max()
    assert np.abs(par - serial).max() < 1e-3 * scale
    c = np.corrcoef(par.ravel(), vol.ravel())[0, 1]
    assert c > 0.95


def test_parallel_reconstruct_mesh_size_invariance():
    vol = make_phantom(32)
    angles = compute_sampling_points(20.0)
    proj = FourierProjector(vol)
    psis = np.zeros(len(angles), np.float32)
    imgs = np.asarray(proj.project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        psis))
    m2 = np.asarray(parallel_reconstruct(
        data_mesh(2), imgs, angles[:, 0], angles[:, 1], psis))
    m8 = np.asarray(parallel_reconstruct(
        data_mesh(8), imgs, angles[:, 0], angles[:, 1], psis))
    scale = np.abs(m8).max()
    assert np.abs(m2 - m8).max() < 1e-3 * scale


def test_parallel_match_agrees_with_local():
    vol = make_phantom(32)
    angles = compute_sampling_points(18.0)
    proj = FourierProjector(vol)
    refs = np.asarray(proj.project_euler(
        angles[:, 0].astype(np.float32), angles[:, 1].astype(np.float32),
        np.zeros(len(angles), np.float32)))
    rng = np.random.default_rng(0)
    pick = rng.integers(0, len(refs), 16)
    imgs = refs[pick]
    mesh = data_mesh(8)
    out = parallel_match(mesh, refs, imgs, max_shift=2, check_mirror=False)
    assert (out["ref_idx"] == pick).mean() > 0.9


def test_refsharded_match_parity():
    """Gallery-sharded (tensor-parallel) matching must agree exactly with
    the single-device scan (winner reduced via pmax/psum collectives)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from xmipp3_tpu.ops.match import _scan_trials, _trial_shift_grid
    from xmipp3_tpu.parallel.match import parallel_match_refsharded
    rng = np.random.default_rng(0)
    R, B, N = 24, 16, 48
    refs = rng.normal(size=(R, N, N)).astype(np.float32)
    imgs = (np.stack([refs[i % R] for i in range(B)])
            + rng.normal(0, 0.1, (B, N, N)).astype(np.float32))
    mesh = Mesh(np.array(jax.devices()), ("model",))
    res = parallel_match_refsharded(mesh, refs, imgs, max_shift=4)
    trials = tuple(map(tuple, _trial_shift_grid(4).astype(float).tolist()))
    peak1, psi1, ref1, _, _ = _scan_trials(
        jnp.asarray(refs), jnp.asarray(imgs), trials, 2, N // 2 - 2, True)
    assert (res["ref_idx"] == np.asarray(ref1)).all()
    np.testing.assert_allclose(res["peak"], np.asarray(peak1), atol=1e-4)
    np.testing.assert_allclose(res["psi"], np.asarray(psi1), atol=1e-3)
    assert (res["ref_idx"] == np.arange(B) % R).all()


def test_slab_reconstruct_matches_dp():
    """kz-slab (volume-sharded) reconstruction must match the data-parallel
    psum path to float epsilon — the memory-scaling mode for volumes whose
    padded cube cannot be replicated per chip (SURVEY §7 phase 4)."""
    import jax
    from jax.sharding import Mesh
    from xmipp3_tpu.ops.project import FourierProjector
    from xmipp3_tpu.parallel.reconstruct import (parallel_reconstruct,
                                                 slab_reconstruct)
    rng = np.random.default_rng(0)
    N, B = 32, 48
    vol = np.zeros((N, N, N), np.float32)
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N] - N // 2
    for (cx, cy, cz, r, a) in [(0, 0, 0, 7, 1.), (5, -4, 3, 3, .8),
                               (-6, 3, -2, 3, .9)]:
        vol += a * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2
                             + (zz - cz) ** 2) / (2 * (r / 2) ** 2))
                          ).astype(np.float32)
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, B))).astype(np.float32)
    psi = rng.uniform(-180, 180, B).astype(np.float32)
    imgs = np.asarray(FourierProjector(vol).project_euler(rot, tilt, psi))
    mesh = Mesh(np.array(jax.devices()), ("data",))
    v_dp = np.asarray(parallel_reconstruct(mesh, imgs, rot, tilt, psi))
    v_slab = np.asarray(slab_reconstruct(mesh, imgs, rot, tilt, psi))
    assert np.abs(v_dp - v_slab).max() < 1e-5
    assert np.corrcoef(v_slab.ravel(), vol.ravel())[0, 1] > 0.99


def test_slab_reconstruct_2d_mesh_matches_dp():
    """dp x slab 2-D mesh (images sharded over 'data' AND the Fourier cube
    over 'z') must match the data-parallel psum path; per-device image
    work shrinks with the data axis at fixed slab memory (VERDICT r3 #4,
    reference mpi_reconstruct_fourier.cpp:325-420 semantics)."""
    import jax
    from jax.sharding import Mesh
    from xmipp3_tpu.ops.project import FourierProjector
    from xmipp3_tpu.parallel.reconstruct import (parallel_reconstruct,
                                                 slab_reconstruct_2d)
    rng = np.random.default_rng(0)
    N, B = 32, 48
    vol = np.zeros((N, N, N), np.float32)
    zz, yy, xx = np.mgrid[0:N, 0:N, 0:N] - N // 2
    for (cx, cy, cz, r, a) in [(0, 0, 0, 7, 1.), (5, -4, 3, 3, .8),
                               (-6, 3, -2, 3, .9)]:
        vol += a * np.exp(-(((xx - cx) ** 2 + (yy - cy) ** 2
                             + (zz - cz) ** 2) / (2 * (r / 2) ** 2))
                          ).astype(np.float32)
    rot = rng.uniform(-180, 180, B).astype(np.float32)
    tilt = np.degrees(np.arccos(rng.uniform(-1, 1, B))).astype(np.float32)
    psi = rng.uniform(-180, 180, B).astype(np.float32)
    imgs = np.asarray(FourierProjector(vol).project_euler(rot, tilt, psi))
    devs = np.array(jax.devices())
    mesh1d = Mesh(devs, ("data",))
    mesh2d = Mesh(devs.reshape(4, 2), ("data", "z"))
    v_dp = np.asarray(parallel_reconstruct(mesh1d, imgs, rot, tilt, psi))
    v_2d = np.asarray(slab_reconstruct_2d(mesh2d, imgs, rot, tilt, psi))
    assert np.abs(v_dp - v_2d).max() < 1e-5
    assert np.corrcoef(v_2d.ravel(), vol.ravel())[0, 1] > 0.99
    # shard-shape evidence: with 4 data shards each device sees B/4 images,
    # and each z shard holds P/2 planes of the padded cube
    from xmipp3_tpu.parallel.mesh import pad_to_multiple
    imgs_p, _ = pad_to_multiple(imgs, 4)
    assert imgs_p.shape[0] % 4 == 0


def test_parallel_match_full_with_masks_matches_serial():
    """dp gallery match with allowed/psi masks and top-N must equal the
    serial engine (the discrete-assign / assignment-mag / neighborhood
    paths now shard over the mesh — VERDICT r3 #8)."""
    import jax
    from jax.sharding import Mesh
    from xmipp3_tpu.ops.match import match_to_gallery
    from xmipp3_tpu.parallel.match import parallel_match_full
    rng = np.random.default_rng(3)
    R, B, N = 12, 18, 32
    y, x = np.mgrid[0:N, 0:N].astype(np.float32) - N // 2
    refs = np.stack([np.exp(-((x - dx) ** 2 + (y - dy) ** 2) / 12)
                     for dx, dy in zip(rng.uniform(-8, 8, R),
                                       rng.uniform(-8, 8, R))]
                    ).astype(np.float32)
    imgs = (refs[np.arange(B) % R]
            + 0.05 * rng.standard_normal((B, N, N)).astype(np.float32))
    allowed = np.ones((B, R), np.float32)
    allowed[:, ::3] = 0.0     # forbid a third of the gallery
    allowed[allowed.sum(1) < 1] = 1.0
    mesh = Mesh(np.array(jax.devices()), ("data",))
    out_dp = parallel_match_full(mesh, refs, imgs, max_shift=4,
                                 allowed=allowed, n_orientations=2)
    out_s = match_to_gallery(refs, imgs, max_shift=4, allowed=allowed,
                             n_orientations=2)
    assert (out_dp["ref_idx"] == np.asarray(out_s["ref_idx"])).all()
    np.testing.assert_allclose(out_dp["corr"], np.asarray(out_s["corr"]),
                               atol=1e-4)
    # candidate mask honored
    assert not np.isin(out_dp["ref_idx"].ravel(),
                       np.arange(0, R, 3)).any()


def test_parallel_class_sums_matches_serial():
    """Particle-sharded class accumulation (angular_class_average --mesh)
    equals the serial register+group-mean path."""
    import jax
    from jax.sharding import Mesh
    from xmipp3_tpu.ops.geo import apply_md_geometry
    from xmipp3_tpu.parallel.engines import parallel_class_sums
    rng = np.random.default_rng(0)
    B, K, N = 22, 3, 24
    imgs = rng.standard_normal((B, N, N)).astype(np.float32)
    psi = rng.uniform(-30, 30, B).astype(np.float32)
    sx = rng.uniform(-2, 2, B).astype(np.float32)
    sy = rng.uniform(-2, 2, B).astype(np.float32)
    flip = (rng.random(B) < 0.3).astype(np.float32)
    assign = rng.integers(0, K, B)
    mesh = Mesh(np.array(jax.devices()), ("data",))
    sums, counts = parallel_class_sums(mesh, imgs, psi, sx, sy, flip,
                                       assign, K)
    reg = np.asarray(apply_md_geometry(imgs, psi, sx, sy, flip > 0.5))
    for k in range(K):
        sel = assign == k
        assert counts[k] == sel.sum()
        if sel.any():
            np.testing.assert_allclose(sums[k], reg[sel].sum(0), atol=1e-4)


def test_parallel_filter_bank_matches_serial():
    """Band-sharded halves-restoration filter bank equals the serial
    lax.scan (volume_halves_restoration --mesh)."""
    import jax
    import jax.numpy as jnp
    from jax.sharding import Mesh
    from xmipp3_tpu.ops import halves_restoration as hr
    from xmipp3_tpu.parallel.engines import parallel_filter_bank
    rng = np.random.default_rng(1)
    n = 24
    shape = (n, n, n)
    v1 = rng.standard_normal(shape).astype(np.float32)
    v2 = rng.standard_normal(shape).astype(np.float32)
    r2 = np.asarray(hr.make_r2(shape))
    args = (r2, shape, 0.1, 0.5, 1, 3.0)
    s1, s2v, sb = (np.asarray(v) for v in hr.filter_bank(
        jnp.asarray(v1), jnp.asarray(v2), jnp.asarray(r2), shape,
        0.1, 0.5, 1, 3.0))
    mesh = Mesh(np.array(jax.devices()), ("data",))
    m1, m2, mb = parallel_filter_bank(mesh, v1, v2, r2, shape,
                                      0.1, 0.5, 1, 3.0)
    np.testing.assert_allclose(m1, s1, atol=1e-4)
    np.testing.assert_allclose(m2, s2v, atol=1e-4)
    np.testing.assert_allclose(mb, sb, atol=1e-4)
