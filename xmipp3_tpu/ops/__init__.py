"""Device ops: the JAX/XLA/Pallas compute core.

Everything here is jit-friendly: static shapes, batched leading axes, float32
(complex64 spectra). These ops replace the reference's L1 filters/alignment
library, the L2 HAL estimator stack, and the L5 CUDA kernel suites
(SURVEY.md §2.1, §2.2, §2.5) with TPU-idiomatic equivalents.
"""
