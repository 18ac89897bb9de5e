"""Device mesh helpers.

The reference's only multi-device strategy is PyTorch DDP over NCCL
(nerf/utils.py:366-368, 962-977), never actually launched. Here data
parallelism is first-class: a 1-D `data` mesh shards the ray batch across
chips; gradients and eval metrics reduce with psum over ICI. The training
step is built with shard_map in train/trainer.py; these helpers create the
mesh and place arrays.
"""

from typing import Optional, Sequence

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(devices: Optional[Sequence] = None, axis_name: str = "data") -> Mesh:
    devices = list(devices) if devices is not None else jax.devices()
    return Mesh(np.array(devices), (axis_name,))


def replicate(mesh: Mesh, tree):
    """Place a pytree replicated on every device of the mesh."""
    sharding = NamedSharding(mesh, P())
    return jax.device_put(tree, sharding)


def shard_batch(mesh: Mesh, tree, axis_name: str = "data"):
    """Shard a pytree's arrays along their leading axis across the mesh."""
    sharding = NamedSharding(mesh, P(axis_name))
    return jax.device_put(tree, sharding)
