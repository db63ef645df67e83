"""Device-mesh helpers: the TPU-native replacement for the reference's
torch.distributed/DDP plumbing (training/utils/distributed.py, trainer.py
:262-311). Data parallelism = shard the batch over the 'data' mesh axis and
let XLA insert the psum for gradients; no process groups, no NCCL hooks.
"""

from __future__ import annotations

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(
    axis_sizes: Optional[Sequence[int]] = None,
    axis_names: Sequence[str] = ("data",),
    devices=None,
) -> Mesh:
    """Build a Mesh; default = all devices on one 'data' axis."""
    devices = devices if devices is not None else jax.devices()
    if axis_sizes is None:
        axis_sizes = (len(devices),)
    dev_array = np.asarray(devices).reshape(axis_sizes)
    return Mesh(dev_array, axis_names)


def data_sharding(mesh: Mesh, axis: int = 0, name: str = "data") -> NamedSharding:
    """Shard the given array axis over the named mesh axis."""
    spec = [None] * (axis + 1)
    spec[axis] = name
    return NamedSharding(mesh, P(*spec))


def replicated(mesh: Mesh) -> NamedSharding:
    return NamedSharding(mesh, P())


def shard_batch(mesh: Mesh, batch, axis: int = 0, name: str = "data"):
    """Device-put a host pytree with the batch axis sharded over the mesh."""
    sh = data_sharding(mesh, axis, name)
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sh), batch)
