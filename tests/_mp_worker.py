"""Worker for the two-process jax.distributed test (test_multiprocess.py).

Each process: rank-strided DistributedBatchSampler batches -> shard_batch
over the GLOBAL mesh (make_array_from_process_local_data path) -> jitted
SGD steps on a tiny linear model (GSPMD inserts the grad psum). Writes the
final params and the reassembled first global batch for the parent test to
compare against a single-process oracle.

Usage: python _mp_worker.py <proc_id> <num_procs> <port> <out_dir>
"""

import os
import sys

proc_id, num_procs, port = int(sys.argv[1]), int(sys.argv[2]), sys.argv[3]
out_dir = sys.argv[4]

os.environ["JAX_PLATFORMS"] = "cpu"
os.environ["XLA_FLAGS"] = "--xla_force_host_platform_device_count=2"
import jax

jax.config.update("jax_platforms", "cpu")
jax.distributed.initialize(coordinator_address=f"localhost:{port}",
                           num_processes=num_procs, process_id=proc_id)

import numpy as np
import jax.numpy as jnp

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pseldnets_tpu.data.sampler import DistributedBatchSampler
from pseldnets_tpu.parallel.mesh import (make_local_mesh, make_mesh,
                                         replicate, shard_batch)

CLIP_NUM, PER_RANK_B, STEPS, SEED = 19, 4, 4, 5  # global batch 8 = 4-dev mesh x2
D = 4


def item(i):
    """Deterministic per-index sample: features + scalar target."""
    rng = np.random.RandomState(1000 + int(i))
    x = rng.standard_normal(D).astype(np.float32)
    return x, np.float32(x.sum() * 0.5)


mesh = make_mesh()
assert mesh.size == 2 * num_procs, mesh.size
local_mesh = make_local_mesh()
assert local_mesh.size == 2

sampler = DistributedBatchSampler(CLIP_NUM, PER_RANK_B, seed=SEED)
assert sampler.rank == proc_id and sampler.num_replicas == num_procs

w = replicate(mesh, jnp.zeros((D,), jnp.float32))


@jax.jit
def step(w, x, y):
    def loss(w):
        return jnp.mean((x @ w - y) ** 2)

    g = jax.grad(loss)(w)
    return w - 0.1 * g


it = iter(sampler)
first_global = None
for s in range(STEPS):
    idx = next(it)
    xs, ys = zip(*(item(i) for i in idx))
    batch = shard_batch(mesh, {"x": np.stack(xs), "y": np.asarray(ys)})
    if s == 0:
        from jax.experimental import multihost_utils

        # reassemble the sharded global batch: every process must see the
        # identical global array built from the rank-local shards
        first_global = np.asarray(
            multihost_utils.process_allgather(batch["x"], tiled=True))
        first_idx_local = np.asarray(idx)
    w = step(w, batch["x"], batch["y"])

# eval-mesh leg: the full (replicated) batch shards over the LOCAL mesh via
# plain device_put; params must be localized first (a jit cannot mix global-
# and local-mesh inputs — the same move SELDTask._localize_for_eval makes)
xs, ys = zip(*(item(i) for i in range(6)))
ev = shard_batch(local_mesh, np.stack(xs))
w_local = replicate(local_mesh, jax.device_get(w))
ev_out = np.asarray(jax.jit(lambda x, w: x @ w)(ev, w_local))

np.savez(os.path.join(out_dir, f"proc{proc_id}.npz"),
         w=np.asarray(jax.device_get(w)),
         first_global=first_global,
         first_idx_local=first_idx_local,
         ev_out=ev_out)
print(f"proc {proc_id} done", flush=True)
