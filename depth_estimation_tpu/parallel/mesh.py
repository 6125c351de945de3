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

import numpy as np
import jax
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

__all__ = ["make_mesh", "data_sharding", "replicated", "P", "Mesh"]


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
