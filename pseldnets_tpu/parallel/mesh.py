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


def make_local_mesh(num_devices: Optional[int] = None, axis: str = "data") -> Mesh:
    """Mesh over THIS process's devices only (== make_mesh when single-process).

    Validation runs the full dataset independently on every process (reference
    keeps its rank split commented out — docs/PARITY.md deviation #3), so eval
    shards over the local mesh while training shards over the global one."""
    devices = jax.local_devices()
    if num_devices is not None and num_devices > 0:
        devices = devices[:num_devices]
    return Mesh(np.asarray(devices), (axis,))


def _spans_other_processes(mesh: Mesh) -> bool:
    if jax.process_count() == 1:
        return False
    me = jax.process_index()
    return any(d.process_index != me for d in mesh.devices.flat)


def shard_batch(mesh: Mesh, batch, axis: str = "data"):
    """Put each array on the mesh with its leading dim sharded over ``axis``.

    Single-process (or local-only mesh): a plain device_put. When the mesh
    spans multiple processes, each process holds only ITS rank's slice of the
    global batch (rank-strided DistributedBatchSampler, data/sampler.py), so
    the global array is assembled from the per-process shards with
    jax.make_array_from_process_local_data — device_put would require the
    full global value on every process and fails on differing values."""
    process_local = _spans_other_processes(mesh)

    def put(x):
        spec = P(axis, *([None] * (x.ndim - 1)))
        sharding = NamedSharding(mesh, spec)
        if process_local:
            return jax.make_array_from_process_local_data(sharding,
                                                          np.asarray(x))
        return jax.device_put(x, sharding)

    return jax.tree_util.tree_map(put, batch)


def replicate(mesh: Mesh, tree):
    sharding = NamedSharding(mesh, P())
    return jax.tree_util.tree_map(lambda x: jax.device_put(x, sharding), tree)


def batch_sharding(mesh: Mesh, axis: str = "data"):
    return NamedSharding(mesh, P(axis))


def replicated_sharding(mesh: Mesh):
    return NamedSharding(mesh, P())
