"""Device mesh construction and sharding helpers.

The reference's distribution story is single-host multi-GPU data
parallelism only (SURVEY.md §2.5: Keras replica towers, torch
scatter/gather, per-GPU eval subprocesses, a CPU process pool for batched
lattice filtering). The TPU-native replacement is one uniform mechanism:
a `jax.sharding.Mesh` over all devices with named axes

  - 'data'  : batch/frame data parallelism (replaces all four reference
              mechanisms; gradients reduced with `psum` over ICI),
  - 'tile'  : spatial tiling of the image plane with halo exchange
              (`parallel.tiling`) for resolutions that exceed one chip.

Multi-host: `jax.distributed.initialize()` then the same mesh spans hosts;
collectives ride ICI within a slice and DCN across slices — XLA inserts
them from shardings, no NCCL/MPI analog needed.
"""
from __future__ import annotations

import os

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = [
    "distributed_init",
    "make_mesh",
    "data_sharding",
    "replicated",
    "P",
    "Mesh",
]


def distributed_init(
    coordinator_address: str | None = None,
    num_processes: int | None = None,
    process_id: int | None = None,
) -> bool:
    """Multi-host entry point: join the JAX distributed runtime so one
    mesh spans every host's chips (the TPU-native replacement for the
    reference's per-GPU subprocess sharding, `lib/utils/subprocess.py:
    29-100`, and its single-host-only DataParallel).

    Arguments default to the standard env vars (`JAX_COORDINATOR_ADDRESS`,
    `JAX_NUM_PROCESSES`, `JAX_PROCESS_ID`); on TPU pods with a resolvable
    metadata service, bare `jax.distributed.initialize()` autodetects all
    three. Returns True when a multi-process runtime was initialized,
    False for the single-process fallback (no coordinator configured) —
    callers then run the same code on the local mesh unchanged.

    Call ONCE per process, before any other jax API touches the backend.
    """
    coordinator_address = coordinator_address or os.environ.get(
        "JAX_COORDINATOR_ADDRESS"
    )
    env_np = os.environ.get("JAX_NUM_PROCESSES")
    env_pid = os.environ.get("JAX_PROCESS_ID")
    if num_processes is None and env_np is not None:
        num_processes = int(env_np)
    if process_id is None and env_pid is not None:
        process_id = int(env_pid)
    if coordinator_address is None and num_processes is None:
        return False  # single-process: nothing to join
    jax.distributed.initialize(
        coordinator_address=coordinator_address,
        num_processes=num_processes,
        process_id=process_id,
    )
    return True


def make_mesh(
    data: int | None = None, tile: int = 1, devices=None
) -> Mesh:
    """Create a ('data', 'tile') mesh.

    Args:
      data: size of the data axis (default: all devices / tile).
      tile: size of the spatial-tiling axis.
      devices: optional explicit device list (default `jax.devices()`).
    """
    devices = list(devices if devices is not None else jax.devices())
    if data is None:
        data = len(devices) // tile
    if data * tile != len(devices):
        devices = devices[: data * tile]
    arr = np.array(devices).reshape(data, tile)
    return Mesh(arr, ("data", "tile"))


def data_sharding(mesh: Mesh, ndim: int) -> NamedSharding:
    """Shard the leading (batch) axis over 'data', replicate the rest."""
    return NamedSharding(mesh, P("data", *([None] * (ndim - 1))))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())
