"""xmippPyModules — importable Python module surface of the framework.

Mirrors the reference's `libraries/py_xmipp` package layout
(reference src/xmipp/libraries/py_xmipp/: swiftalign, classifyPcaFuntion,
coordinatesTools, deepLearningToolkitUtils, example_module) with
JAX/numpy-native implementations built on xmipp3_tpu ops — the reference's
torch/kornia backends become jnp device code.
"""
