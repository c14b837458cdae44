"""Worker for the two-process TENSOR-PARALLEL test (test_tp_multihost.py).

2 processes x 2 local CPU devices = a (data=2, model=2) mesh whose data axis
spans processes and whose model axis stays process-local (jax.devices() is
ordered by process, so make_mesh_2d's reshape puts the process boundary on
the data axis — the Megatron collectives ride "ICI", not "DCN", exactly the
production layout). Pins that parallel/tp.py shardings survive multi-host
param assembly: params placed per tp_shardings via make_array_from_callback,
rank-strided batches assembled with shard_batch's process-local path, jitted
SGD steps (GSPMD inserts both the TP reduce and the data-parallel grad
psum), and the updated params stay model-sharded.

Usage: python _mp_tp_worker.py <proc_id> <num_procs> <port> <out_dir>
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

import flax.linen as nn
import numpy as np
import jax.numpy as jnp
from jax.sharding import NamedSharding, PartitionSpec as P

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))
from pseldnets_tpu.data.sampler import DistributedBatchSampler
from pseldnets_tpu.parallel.mesh import shard_batch
from pseldnets_tpu.parallel.tp import (count_model_sharded, make_mesh_2d,
                                       tp_shardings)

CLIP_NUM, PER_RANK_B, STEPS, SEED = 19, 4, 3, 5
D, HID = 8, 16


class TinyMLP(nn.Module):
    @nn.compact
    def __call__(self, x):
        h = nn.Dense(HID, name="fc1")(x)
        h = nn.gelu(h)
        return nn.Dense(1, name="fc2")(h)


def item(i):
    rng = np.random.RandomState(1000 + int(i))
    x = rng.standard_normal(D).astype(np.float32)
    return x, np.float32(x.sum() * 0.5)


mesh = make_mesh_2d(2, 2)
# the data axis must be the PROCESS axis (model collectives process-local)
assert {d.process_index for d in mesh.devices[0]} != {0, 1}, \
    "model axis spans processes — device order assumption broken"

model = TinyMLP()
params = model.init(jax.random.PRNGKey(0), jnp.zeros((1, D)))["params"]
shardings = tp_shardings(params, mesh)


def put(leaf, sh):
    arr = np.asarray(leaf)
    return jax.make_array_from_callback(arr.shape, sh,
                                        lambda idx: arr[idx])


params = jax.tree_util.tree_map(put, params, shardings)
# fc1 kernel (None,'model'), fc1 bias ('model'), fc2 kernel ('model',None)
n0 = count_model_sharded(params)
assert n0 == 3, n0


@jax.jit
def step(p, x, y):
    def loss(p):
        pred = model.apply({"params": p}, x)[:, 0]
        return jnp.mean((pred - y) ** 2)

    g = jax.grad(loss)(p)
    return jax.tree_util.tree_map(lambda w, gw: w - 0.1 * gw, p, g)


sampler = DistributedBatchSampler(CLIP_NUM, PER_RANK_B, seed=SEED)
it = iter(sampler)
for s in range(STEPS):
    idx = next(it)
    xs, ys = zip(*(item(i) for i in idx))
    batch = shard_batch(mesh, {"x": np.stack(xs), "y": np.asarray(ys)})
    params = step(params, batch["x"], batch["y"])

# GSPMD must KEEP (or widen) the model sharding through the update —
# CLAUDE.md: propagation can shard MORE leaves than annotated, assert >=
n1 = count_model_sharded(params)
assert n1 >= 3, n1

# allgather to replicated so every process can fetch the full values
rep = jax.jit(
    lambda t: t,
    out_shardings=jax.tree_util.tree_map(
        lambda _: NamedSharding(mesh, P()), params))(params)
host = jax.tree_util.tree_map(lambda x: np.asarray(jax.device_get(x)), rep)

np.savez(os.path.join(out_dir, f"tp_proc{proc_id}.npz"),
         fc1_kernel=host["fc1"]["kernel"], fc1_bias=host["fc1"]["bias"],
         fc2_kernel=host["fc2"]["kernel"], fc2_bias=host["fc2"]["bias"],
         n_sharded_after=np.int32(n1))
print(f"tp proc {proc_id} done", flush=True)
