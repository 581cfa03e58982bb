"""Golden parity with the reference function_tests/test_polar_main.cpp:
the embedded weighted mean/stddev of the 3x3 fixture's polar rings."""
import numpy as np

import jax.numpy as jnp

from xmipp3_tpu.ops.polar import polar_rings_reference, polar_weighted_stats

MUL3 = np.array([[1, 2, 3], [3, 2, 1], [4, 4, 5]], np.float32)


def test_compute_average_and_stddev():
    rings, radii = polar_rings_reference(jnp.asarray(MUL3), 0, 1)
    mean, std = polar_weighted_stats(rings, radii)
    assert abs(mean - 1.886528450043468) < 1e-5
    assert abs(std - 0.49643800057938808) < 1e-5
