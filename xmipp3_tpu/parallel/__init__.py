"""L4 replacement: TPU mesh runtime (shard_map/psum instead of MPI).

SURVEY.md §2.4 mapping:
  MpiTaskDistributor (dynamic master-worker) -> static even sharding of the
      particle axis over the mesh "data" axis (deterministic outputs
      independent of worker count, like the reference's MDL_GATHER_ID sort);
  chunked xmipp_MPI_Reduce of Fourier volumes -> jax.lax.psum over ICI;
  gatherMetadatas -> all_gather of fixed-shape result rows;
  MpiFileMutex / per-rank .xmd files -> unnecessary (single controller).
"""
from xmipp3_tpu.parallel.mesh import (data_mesh, shard_particles,
                                      replicate, local_batch_size)
from xmipp3_tpu.parallel.reconstruct import parallel_reconstruct
from xmipp3_tpu.parallel.match import parallel_match

__all__ = ["data_mesh", "shard_particles", "replicate", "local_batch_size",
           "parallel_reconstruct", "parallel_match"]
