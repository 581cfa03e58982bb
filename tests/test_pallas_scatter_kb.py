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

    def test_slab_disables(self):
        assert not psk.kb_fastpath_ok(256, 1.9, True)

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
