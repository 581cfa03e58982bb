"""Tests for the fused direct-KB gridding kernel (ops/pallas_scatter_kb).

The Mosaic kernel itself only compiles on TPU; CPU CI validates the
window polynomial, the gating logic, and that the kb interp path still
produces correct volumes through the XLA fallback. The kernel-vs-XLA
equivalence runs when a TPU is present (same check performed on real
hardware during development: max rel err ~2e-3, dominated by the
degree-7 window polynomial)."""
import numpy as np
import pytest
import jax
import jax.numpy as jnp

from xmipp3_tpu.ops import pallas_scatter_kb as psk


class TestWindowPoly:
    def test_order0_matches_bessel(self):
        from scipy import special as ss
        poly = psk._window_poly(1.9, 15.0, 0)
        d2 = np.linspace(0, 1.9 ** 2, 777)
        exact = ss.iv(0, 15.0 * np.sqrt(np.maximum(
            1 - d2 / 1.9 ** 2, 0))) / ss.iv(0, 15.0)
        approx = np.polyval(poly, d2)
        assert np.abs(approx - exact).max() < 5e-4

    def test_order2_finite_and_zero_at_edge(self):
        poly = psk._window_poly(2.0, 13.36, 2)
        d2 = np.linspace(0, 4.0, 100)
        approx = np.polyval(poly, d2)
        assert np.all(np.isfinite(approx))
        # window vanishes at the blob edge
        assert abs(approx[-1]) < 5e-3

    def test_poly_cached(self):
        assert psk._window_poly(1.9, 15.0, 0) is \
            psk._window_poly(1.9, 15.0, 0)


class TestGate:
    def test_cpu_backend_disables(self):
        if jax.default_backend() != "tpu":
            assert not psk.kb_fastpath_ok(256, 1.9, False)

    def test_slab_without_thickness_disables(self):
        assert not psk.kb_fastpath_ok(256, 1.9, True)

    def test_slab_with_bad_thickness_disables(self):
        # slab_p*P*P must tile into 8192-voxel kernel tiles
        assert not psk.kb_fastpath_ok(250, 1.9, True, 1)

    def test_slab_ok_on_tpu(self):
        ok = psk.kb_fastpath_ok(256, 1.9, True, 32)
        assert ok == (jax.default_backend() == "tpu")

    def test_radius_above_two_disables(self):
        assert not psk.kb_fastpath_ok(256, 2.5, False)

    def test_non_tile_divisible_disables(self):
        assert not psk.kb_fastpath_ok(100, 1.9, False)


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic kernel needs a TPU")
class TestKernelVsXLA:
    def test_matches_tap_expansion(self):
        from xmipp3_tpu.ops import reconstruct as rec
        from xmipp3_tpu.core.geometry import euler_matrix
        from xmipp3_tpu.ops.project import FourierProjector
        rng = np.random.default_rng(0)
        N, C = 64, 32
        z, y, x = np.mgrid[0:N, 0:N, 0:N].astype(np.float32) - N // 2
        vol = np.exp(-(x**2 + y**2 + z**2) / (2 * (N / 8) ** 2))
        angs = np.stack([rng.uniform(0, 360, C), rng.uniform(0, 180, C),
                         rng.uniform(0, 360, C)], 1).astype(np.float32)
        mats = np.stack([euler_matrix(*a) for a in angs]).astype(np.float32)
        imgs = jnp.asarray(FourierProjector(vol).project_euler(
            angs[:, 0], angs[:, 1], angs[:, 2]))
        P = 2 * N
        zeros = jnp.zeros((P, P, P), jnp.float32)
        sx = jnp.zeros((C,), jnp.float32)
        iw = jnp.ones((C,), jnp.float32)
        a = rec.backproject_chunk(zeros, zeros, zeros, imgs,
                                  jnp.asarray(mats), sx, sx, iw,
                                  P=P, interp="kb")
        saved = psk.kb_fastpath_ok
        psk.kb_fastpath_ok = lambda *args: False
        rec.backproject_chunk.clear_cache()
        try:
            b = rec.backproject_chunk(zeros, zeros, zeros, imgs,
                                      jnp.asarray(mats), sx, sx, iw,
                                      P=P, interp="kb")
        finally:
            psk.kb_fastpath_ok = saved
            rec.backproject_chunk.clear_cache()
        for x1, x2 in zip(a, b):
            x1, x2 = np.asarray(x1), np.asarray(x2)
            err = np.abs(x1 - x2).max() / max(np.abs(x2).max(), 1e-9)
            assert err < 5e-3


@pytest.mark.skipif(jax.default_backend() != "tpu",
                    reason="Mosaic kernel needs a TPU")
class TestSlabKernel:
    def test_slabs_stack_to_full_cube(self):
        """kz-slab mode: gridding each z-slab separately (offset tile
        grid + slab tap mask) must reproduce the full-cube kernel."""
        rng = np.random.default_rng(1)
        P, M = 64, 50000
        zi = jnp.asarray(rng.uniform(0.0, P - 1.001, M).astype(np.float32))
        yi = jnp.asarray(rng.uniform(0.0, P - 1.001, M).astype(np.float32))
        xi = jnp.asarray(rng.uniform(0.0, P - 1.001, M).astype(np.float32))
        vals = [jnp.asarray(rng.standard_normal(M).astype(np.float32))
                for _ in range(3)]
        zeros = jnp.zeros((P * P * P,), jnp.float32)
        full = psk.kb_scatter_3ch(zeros, zeros, zeros, zi, yi, xi, *vals,
                                  P=P, radius=1.9, alpha=15.0, order=0)
        nslab = 4
        sp = P // nslab
        zslab = jnp.zeros((sp * P * P,), jnp.float32)
        parts = [[] for _ in range(3)]
        for s in range(nslab):
            out = psk.kb_scatter_3ch(zslab, zslab, zslab, zi, yi, xi,
                                     *vals, P=P, radius=1.9, alpha=15.0,
                                     order=0, zdim=sp,
                                     z_lo=jnp.int32(s * sp))
            for c in range(3):
                parts[c].append(np.asarray(out[c]))
        for c in range(3):
            stacked = np.concatenate(parts[c])
            ref = np.asarray(full[c])
            err = np.abs(stacked - ref).max() / max(np.abs(ref).max(),
                                                    1e-9)
            assert err < 1e-5, err
