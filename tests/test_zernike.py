"""Zernike3D deformation tests."""
import numpy as np
import pytest
import jax.numpy as jnp

from xmipp3_tpu.core.image import Image, save_image
from xmipp3_tpu.core.metadata import MetaData
from xmipp3_tpu.ops.zernike import (deform_volume, deformation_amplitude,
                                    fit_deformation, zernike_basis_grid,
                                    zernike_indices, zernike_radial)
from xmipp3_tpu.programs import get_program


def test_zernike_radial_known_values():
    r = np.linspace(0, 1, 5)
    np.testing.assert_allclose(zernike_radial(0, 0, r), 1.0)
    np.testing.assert_allclose(zernike_radial(1, 1, r), r)
    np.testing.assert_allclose(zernike_radial(2, 0, r), 2 * r ** 2 - 1)


def test_indices_counts():
    # L1=1,L2=1: (0,0,0) + (1,1,-1..1) = 4
    assert len(zernike_indices(1, 1)) == 4
    assert len(zernike_indices(3, 2)) == 13


def test_zero_coeffs_identity():
    rng = np.random.default_rng(0)
    vol = rng.standard_normal((16, 16, 16)).astype(np.float32)
    basis = jnp.asarray(zernike_basis_grid(16, 2, 2))
    out = np.asarray(deform_volume(jnp.asarray(vol), basis,
                                   jnp.zeros((3, basis.shape[0]))))
    np.testing.assert_allclose(out, vol, atol=1e-5)


def make_two_state(n=24):
    z, y, x = np.mgrid[0:n, 0:n, 0:n].astype(np.float32)
    state_a = (np.exp(-((z - 12) ** 2 + (y - 12) ** 2 + (x - 9) ** 2) / 6.0) +
               0.8 * np.exp(-((z - 9) ** 2 + (y - 15) ** 2 + (x - 14) ** 2)
                            / 4.0)).astype(np.float32)
    state_b = (np.exp(-((z - 12) ** 2 + (y - 12) ** 2 + (x - 12) ** 2) / 6.0) +
               0.8 * np.exp(-((z - 9) ** 2 + (y - 13) ** 2 + (x - 15) ** 2)
                            / 4.0)).astype(np.float32)
    return state_a, state_b


def test_fit_deformation_between_states():
    a, b = make_two_state()
    ncc0 = float(np.corrcoef(a.ravel(), b.ravel())[0, 1])
    coeffs, deformed, ncc = fit_deformation(a, b, 4, 3, n_steps=150)
    assert ncc > ncc0 + 0.3    # 0.49 -> ~0.97
    assert ncc > 0.93
    basis = zernike_basis_grid(24, 4, 3)
    amp = deformation_amplitude(basis, coeffs)
    assert 0.1 < amp < 6.0


def test_volume_deform_sph_program(tmp_path):
    a, b = make_two_state()
    fa, fb = str(tmp_path / "a.vol"), str(tmp_path / "b.vol")
    save_image(fa, a)
    save_image(fb, b)
    out = str(tmp_path / "d.vol")
    prog = get_program("volume_deform_sph")
    rc = prog.run_with_args(f"-i {fa} -r {fb} -o {out} --steps 120 "
                            f"--l1 4 --l2 3 --oroot {tmp_path}/clnm -v 0")
    assert rc == 0
    assert prog.ncc > 0.9
    # apply stored coefficients -> same result
    out2 = str(tmp_path / "d2.vol")
    rc = get_program("volume_apply_coefficient_zernike3d").run_with_args(
        f"-i {fa} --clnm {tmp_path}/clnm.xmd -o {out2} --l1 4 --l2 3")
    assert rc == 0
    d1 = np.squeeze(Image(out).data)
    d2 = np.squeeze(Image(out2).data)
    np.testing.assert_allclose(d1, d2, atol=1e-4)
