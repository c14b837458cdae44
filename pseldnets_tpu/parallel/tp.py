"""Opt-in tensor parallelism over a 2-D ``(data, model)`` mesh.

The reference's only parallelism is DDP (SURVEY §2.10 marks TP/PP as absent),
so this module is an ABOVE-REFERENCE extra: a Megatron-style column/row
split of the transformer dense layers for backbones that outgrow one chip's
HBM. It is deliberately annotation-only — GSPMD guarantees that ANY sharding
assignment computes the replicated program's result, so the rules below only
choose where the collectives land:

- column-parallel (output dim sharded over ``model``): ``fc1``/``qkv``
  kernels ``P(None, 'model')``, their biases ``P('model')``;
- row-parallel (input dim sharded): ``fc2``/``proj`` kernels
  ``P('model', None)``, biases replicated — the canonical pairing keeps one
  reduce per block riding ICI;
- everything else (LN scales, conv kernels, BN stats, embeddings, LoRA
  factors) replicated.

A dim is only sharded when it divides evenly by the ``model`` axis size;
otherwise the leaf stays replicated (GSPMD handles the mix).

The flagship HTSAT is ~28M params, so production serving/training stays pure
DP (batch over a 1-D mesh); enable this via the additive
``trainer.tensor_parallel`` knob (configs/trainer/tpu.yaml) when a larger
backbone needs its optimizer+param state spread across chips. Exercised on
the virtual CPU mesh by tests/test_tp.py (loss equivalence vs DP) and by
``__graft_entry__.dryrun_multichip``'s TP step.
"""

from typing import Optional

import jax
import numpy as np
from jax.sharding import Mesh, NamedSharding, PartitionSpec as P

# module names whose Dense kernel (in, out) is column- vs row-parallel
_COL_MODULES = ("fc1", "qkv")
_ROW_MODULES = ("fc2", "proj", "reduction")


def make_mesh_2d(n_data: int, n_model: int,
                 axes=("data", "model")) -> Mesh:
    devices = jax.devices()
    need = n_data * n_model
    if len(devices) < need:
        raise ValueError(f"need {need} devices for a ({n_data},{n_model}) "
                         f"mesh, have {len(devices)}")
    return Mesh(np.asarray(devices[:need]).reshape(n_data, n_model), axes)


def tp_spec(path, leaf, model_size: int, model_axis: str = "model"):
    """PartitionSpec for one param leaf, keyed on its flax path.

    ``path`` is a tuple of jax.tree_util DictKey/str path entries (torch-
    mirrored names — see train/checkpoint.py). Only 2-D dense kernels and
    their 1-D biases inside the recognized column/row modules are sharded.
    """
    names = [getattr(k, "key", str(k)) for k in path]
    in_col = any(n in _COL_MODULES for n in names)
    in_row = any(n in _ROW_MODULES for n in names)
    leafname = names[-1] if names else ""
    shape = getattr(leaf, "shape", ())
    if leafname == "kernel" and len(shape) == 2:
        if in_col and shape[1] % model_size == 0:
            return P(None, model_axis)
        if in_row and shape[0] % model_size == 0:
            return P(model_axis, None)
    if leafname == "bias" and len(shape) == 1:
        if in_col and shape[0] % model_size == 0:
            return P(model_axis)
    return P()


def tp_shardings(params, mesh: Mesh, model_axis: str = "model"):
    """Tree of NamedShardings for ``params`` per the column/row rules."""
    model_size = mesh.shape[model_axis]
    return jax.tree_util.tree_map_with_path(
        lambda path, leaf: NamedSharding(
            mesh, tp_spec(path, leaf, model_size, model_axis)),
        params)


def shard_train_state(state, mesh: Mesh, tx=None, model_axis: str = "model"):
    """Place a TrainState on a 2-D mesh: params per the TP rules,
    batch_stats/step replicated, and the optimizer state re-initialized
    under jit so GSPMD propagates the param shardings into the Adam
    moments (zeros_like of a sharded operand inherits its sharding)."""
    shardings = tp_shardings(state.params, mesh, model_axis)
    params = jax.tree_util.tree_map(jax.device_put, state.params, shardings)
    repl = NamedSharding(mesh, P())
    batch_stats = jax.tree_util.tree_map(
        lambda x: jax.device_put(x, repl), state.batch_stats)
    if tx is not None:
        opt_state = jax.jit(tx.init)(params)
    else:
        opt_state = jax.tree_util.tree_map(
            lambda x: jax.device_put(x, repl), state.opt_state)
    return state.replace(params=params, batch_stats=batch_stats,
                         opt_state=opt_state,
                         step=jax.device_put(state.step, repl))


def _spec_mentions(spec, axis: str) -> bool:
    for entry in spec:
        if entry == axis or (isinstance(entry, tuple) and axis in entry):
            return True
    return False


def count_model_sharded(tree, model_axis: str = "model") -> int:
    """Number of leaves actually sharded over the model axis (test helper)."""
    n = 0
    for leaf in jax.tree_util.tree_leaves(tree):
        sh = getattr(leaf, "sharding", None)
        if isinstance(sh, NamedSharding) and _spec_mentions(sh.spec, model_axis):
            n += 1
    return n
