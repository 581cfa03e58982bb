"""ops/optim.adam_scan: the single-dispatch Adam loop used by the
continuous/Zernike/NMA/SVM refinements."""
import numpy as np
import jax.numpy as jnp

from xmipp3_tpu.ops.optim import adam_scan


def test_quadratic_converges():
    target = jnp.asarray([3.0, -2.0, 0.5])

    def loss(x):
        return ((x - target) ** 2).sum()

    x, last = adam_scan(loss, jnp.zeros(3), n_steps=400, lr=0.05)
    assert np.abs(np.asarray(x) - np.asarray(target)).max() < 1e-2
    assert float(last) < 1e-3


def test_per_axis_learning_rate_freezes_zero_lr_rows():
    def loss(x):
        return ((x - 1.0) ** 2).sum()

    x0 = jnp.zeros((2, 4))
    x, _ = adam_scan(loss, x0, n_steps=200, lr=jnp.asarray([0.1, 0.0]))
    out = np.asarray(x)
    assert np.abs(out[0] - 1.0).max() < 1e-2     # row with lr moves
    assert np.abs(out[1]).max() == 0.0           # lr=0 row frozen


def test_returns_final_loss_scalar():
    def loss(x):
        return (x ** 2).sum()

    x, last = adam_scan(loss, jnp.asarray([1.0]), n_steps=50, lr=0.2)
    assert np.ndim(np.asarray(last)) == 0
