"""1-D data-parallel mesh utilities.

The reference's only parallelism is DDP (SURVEY §2.10): rank-strided batch
sharding + implicit gradient all-reduce. The TPU-native equivalent is a 1-D
``('data',)`` jax.sharding.Mesh: the batch is sharded over the axis, params
are replicated, and the gradient psum is inserted by XLA/GSPMD when the jitted
train step's outputs require it — collectives ride ICI with no NCCL analogue.
BatchNorm batch statistics are likewise global means under GSPMD, replacing
torch sync_batchnorm (reference configs/trainer/gpu.yaml:9).
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P


def make_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    devices = jax.devices()
    if num_devices is not None and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """device_put each array with its leading dim sharded over the mesh."""
    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        return jax.device_put(x, NamedSharding(mesh, spec))

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data"):
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
