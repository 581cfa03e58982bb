"""Golden parity with the reference function_tests/test_filters_main.cpp,
using the reference's own fixture (filters/test2.spi): bestShift of an
image with itself is (0,0); correlationIndex(self) == 1; an image
transformed by rot 15 deg + shift (-4, 6) and mirrored must be re-alignable
onto the original (alignImages / alignImagesConsideringMirrors roles)."""
import os

import numpy as np
import pytest

import jax.numpy as jnp

from xmipp3_tpu.core.image import Image
from xmipp3_tpu.ops.align import align_considering_mirrors, iterative_align
from xmipp3_tpu.ops.geo import (alignment_matrices_2d, apply_affine_2d,
                                centered_flip)
from xmipp3_tpu.ops.shift import best_shift, correlation_index


@pytest.fixture(scope="module")
def test2(reference_resources):
    img = np.squeeze(Image(os.path.join(reference_resources, "filters",
                                        "test2.spi")).data).astype(np.float32)
    return img


def test_best_shift_self(test2):
    dx, dy, _ = best_shift(jnp.asarray(test2), jnp.asarray(test2[None]))
    assert abs(float(dx[0])) < 1e-3 and abs(float(dy[0])) < 1e-3


def test_correlation_self(test2):
    c = correlation_index(jnp.asarray(test2), jnp.asarray(test2[None]))
    assert float(c[0]) == pytest.approx(1.0, abs=1e-5)


def test_align_images_golden(test2):
    # the reference test's exact transform: rotate 15 deg, shift (-4, 6)
    M = alignment_matrices_2d(jnp.array([15.0]), jnp.array([-4.0]),
                              jnp.array([6.0]))
    transformed = np.asarray(apply_affine_2d(jnp.asarray(test2[None]), M,
                                             wrap=True))[0]
    psi, sx, sy, corr, aligned = iterative_align(test2, transformed[None])
    assert float(corr[0]) > 0.98
    c = np.corrcoef(np.asarray(aligned)[0].ravel(), test2.ravel())[0, 1]
    assert c > 0.95


def test_align_images_mirror_golden(test2):
    M = alignment_matrices_2d(jnp.array([15.0]), jnp.array([-4.0]),
                              jnp.array([6.0]))
    transformed = np.asarray(apply_affine_2d(jnp.asarray(test2[None]), M,
                                             wrap=True))[0]
    mirrored = np.asarray(centered_flip(jnp.asarray(transformed[None]), 2))[0]
    psi, sx, sy, flip, corr, aligned = align_considering_mirrors(
        test2, mirrored[None])
    assert bool(flip[0])                 # the mirror must be detected
    assert float(corr[0]) > 0.98
    c = np.corrcoef(np.asarray(aligned)[0].ravel(), test2.ravel())[0, 1]
    assert c > 0.95
