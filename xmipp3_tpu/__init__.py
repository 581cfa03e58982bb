"""xmipp3_tpu — a TPU-native cryo-EM image-processing framework.

A from-scratch rebuild of the capabilities of Xmipp (I2PC/xmipp v6.0.0) with an
idiomatic JAX/XLA/Pallas compute core: batched FFT alignment kernels, Fourier
central-slice projection / Kaiser-Bessel gridding reconstruction, CTF estimation,
classification, resolution analysis — sharded over TPU meshes with XLA collectives
in place of the reference's MPI layer, while keeping Xmipp's STAR/.xmd metadata,
MRC/MRCS/Spider image formats, and CLI program grammar contract-compatible.

Layer map (mirrors SURVEY.md):
  core/      — L0: metadata (STAR), image I/O, filenames, program framework, geometry
  ops/       — L1/L2/L5: jitted device ops (FFT, filters, CTF, alignment, projection)
  models/    — L3: algorithm engines (one class per program family)
  parallel/  — L4: mesh runtime (shard_map/psum replaces MPI)
  programs/  — L6: CLI endpoints (xmipp_<name>)
  utils/     — progress, logging, timing
"""

__version__ = "0.1.0"

from xmipp3_tpu.core.metadata import MetaData, Row
from xmipp3_tpu.core.image import Image
from xmipp3_tpu.core.filename import FileName

__all__ = ["MetaData", "Row", "Image", "FileName", "__version__"]
