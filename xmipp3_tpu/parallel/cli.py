"""CLI surface for mesh parallelism — the `--mesh` flag.

The reference scales out through 51 mpi_* wrapper programs (MPI
master-worker, parallel/xmipp_mpi.h:222-272). Here the SAME endpoints take a
`--mesh` flag (default auto) and run their hot path sharded over the visible
jax device mesh:

  auto  : dp when >1 device is visible, serial otherwise (the default, so
          `xmipp mpi_<prog>` scales out with zero extra flags);
  dp    : particle/data axis sharded over the mesh (parallel_match_full /
          parallel_reconstruct — psum volume reduction);
  tp    : big-operand (gallery) sharded over the mesh
          (parallel_match_refsharded winner reduction);
  slab  : volume kz-slab sharding (slab_reconstruct) for cubes too large to
          replicate per chip;
  none  : force the serial single-device path.

Multi-host: run the same program on every host under `jax.distributed`
(initialize via --dist-coordinator/--dist-nprocs/--dist-procid or the
JAX_COORDINATOR_ADDRESS/JAX_NUM_PROCESSES/JAX_PROCESS_ID env), and the same
mesh spans all hosts' devices — the analog of `mpirun -np N` across nodes.
"""
from __future__ import annotations

MESH_MODES = ("auto", "dp", "tp", "slab", "slab2d", "none", "serial")


def add_mesh_params(prog, modes: str = "auto dp tp slab slab2d none serial"):
    """Add the --mesh parameter to a program's grammar."""
    prog.addParamsLine(
        f"  [--mesh <mode=auto>] : Device-mesh parallel mode ({modes}); "
        f"auto = dp when >1 device is visible")
    prog.addParamsLine(
        "  [--dist_coordinator <addr=\"\">] : jax.distributed coordinator "
        "address host:port (multi-host runs)")
    prog.addParamsLine(
        "  [--dist_nprocs <n=-1>]   : number of processes in the multi-host "
        "run")
    prog.addParamsLine(
        "  [--dist_procid <i=-1>]   : this process' index in the multi-host "
        "run")


def read_mesh_params(prog):
    """Read --mesh/--dist_* back; call from readParams."""
    prog.mesh_mode = prog.getParam("--mesh") if prog.checkParam("--mesh") \
        else "auto"
    prog.dist_coordinator = prog.getParam("--dist_coordinator") \
        if prog.checkParam("--dist_coordinator") else ""
    prog.dist_nprocs = prog.getIntParam("--dist_nprocs") \
        if prog.checkParam("--dist_nprocs") else -1
    prog.dist_procid = prog.getIntParam("--dist_procid") \
        if prog.checkParam("--dist_procid") else -1


def maybe_init_distributed(prog) -> None:
    """Initialize jax.distributed for multi-host meshes when requested.

    Mirrors `mpirun -np N` across nodes: every host runs the same program;
    jax.distributed stitches their local devices into one global mesh."""
    import os
    addr = getattr(prog, "dist_coordinator", "") or \
        os.environ.get("JAX_COORDINATOR_ADDRESS", "")
    if not addr:
        return
    import jax
    n = getattr(prog, "dist_nprocs", -1)
    pid = getattr(prog, "dist_procid", -1)
    if n < 0:
        n = int(os.environ.get("JAX_NUM_PROCESSES", "1"))
    if pid < 0:
        pid = int(os.environ.get("JAX_PROCESS_ID", "0"))
    jax.distributed.initialize(coordinator_address=addr, num_processes=n,
                               process_id=pid)


def resolve_mesh(mode: str = "auto", min_devices: int = 2,
                 axis_name: str = "data"):
    """Resolve a --mesh flag value into (Mesh | None, effective_mode).

    Returns (None, "none") for the serial path. The mesh spans ALL visible
    devices (single- or multi-host)."""
    if mode not in MESH_MODES:
        raise ValueError(f"--mesh {mode!r}: expected one of {MESH_MODES}")
    if mode in ("none", "serial"):
        return None, "none"
    import jax
    devs = jax.devices()
    if len(devs) < min_devices:
        if mode == "auto":
            return None, "none"
        raise RuntimeError(
            f"--mesh {mode} needs >= {min_devices} devices, found "
            f"{len(devs)} ({devs[0].platform})")
    if mode == "auto":
        mode = "dp"
    if mode == "slab2d":
        # dp x slab 2-D mesh: factor devices as (data, z) with z = 2
        # (or the largest even split); needs >= 4 devices
        import numpy as _np
        from jax.sharding import Mesh
        n = len(devs)
        if n < 4 or n % 2:
            raise RuntimeError(f"--mesh slab2d needs an even device count "
                               f">= 4, found {n}")
        return Mesh(_np.array(devs).reshape(n // 2, 2), ("data", "z")), mode
    from xmipp3_tpu.parallel.mesh import data_mesh
    axis = "model" if mode == "tp" else axis_name
    return data_mesh(len(devs), axis_name=axis), mode
