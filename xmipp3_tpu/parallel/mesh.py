"""Mesh construction + sharding helpers."""
from __future__ import annotations

import numpy as np

import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def data_mesh(n_devices: int | None = None, axis_name: str = "data") -> Mesh:
    """1-D device mesh over the particle (data) axis.

    Within one pod this rides ICI; multi-host extends transparently through
    jax.distributed (same program, bigger mesh). Raises if fewer than
    n_devices devices exist — silently clamping would let an n-way program
    "pass" on a 1-device mesh, validating nothing."""
    devs = jax.devices()
    if n_devices is not None:
        if len(devs) < n_devices:
            raise RuntimeError(
                f"data_mesh({n_devices}) requested but only {len(devs)} "
                f"device(s) are visible on platform "
                f"'{devs[0].platform}'. For a virtual CPU mesh force the "
                f"CPU backend with jax.config.update('jax_platforms','cpu') "
                f"and jax.config.update('jax_num_cpu_devices', n) before "
                f"any device op.")
        devs = devs[:n_devices]
    return Mesh(np.array(devs), (axis_name,))


def shard_particles(arr, mesh: Mesh, axis_name: str = "data"):
    """Place an (N, ...) stack sharded along the mesh data axis."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(arr, sharding)


def replicate(arr, mesh: Mesh):
    """Replicate (references, volumes) on every device."""
    return jax.device_put(arr, NamedSharding(mesh, P()))


def local_batch_size(total: int, mesh: Mesh, axis_name: str = "data") -> int:
    n = mesh.shape[axis_name]
    if total % n:
        raise ValueError(f"batch {total} not divisible by mesh size {n}; "
                         f"pad the stack (static shapes)")
    return total // n


def pad_to_multiple(arr, multiple: int, axis: int = 0, fill=0.0):
    """Pad the particle axis so it divides the mesh evenly; returns
    (padded, n_valid)."""
    n = arr.shape[axis]
    rem = (-n) % multiple
    if rem == 0:
        return arr, n
    pad = [(0, 0)] * arr.ndim
    pad[axis] = (0, rem)
    return np.pad(np.asarray(arr), pad, constant_values=fill), n
