"""Deep-learning toolkit availability helpers.

Reference role (py_xmipp/deepLearningToolkitUtils/utils.py): check that
the conda DLTK env providing TF/torch is installed before running deep
programs. TPU-native divergence: the deep_* programs here run on JAX/flax
which ships with the framework, so the check reports the JAX device
instead of probing conda environments (docs/COVERAGE.md §L7)."""
from __future__ import annotations


def checkIf_tf_keras_installed():
    """JAX/flax replaces TF-Keras in this framework; succeeds when the
    device stack imports."""
    import flax  # noqa: F401
    import jax
    return len(jax.devices()) > 0


def checkIf_pytorch_installed():
    import torch  # noqa: F401
    return True


def getDeviceInfo():
    import jax
    d = jax.devices()[0]
    return {"platform": d.platform, "device_count": jax.device_count()}
