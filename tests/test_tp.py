"""Tensor-parallel opt-in (parallel/tp.py): sharding rules + DP equivalence.

Above-reference extra — the reference has DDP only (SURVEY §2.10). GSPMD
guarantees any sharding annotation preserves the replicated program's
semantics, so the contract to test is (a) the Megatron column/row rules
land where intended and (b) a train step on a 2-D (data, model) mesh
matches the 1-D data-parallel step numerically.
"""

import copy
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import jax
import numpy as np
import pytest
from jax.sharding import PartitionSpec as P

from pseldnets_tpu.parallel.mesh import make_mesh
from pseldnets_tpu.parallel.tp import (count_model_sharded, make_mesh_2d,
                                       tp_shardings)


def _fake_block_params():
    z = np.zeros
    return {
        "mlp": {
            "fc1": {"base": {"kernel": z((8, 16)), "bias": z((16,))}},
            "fc2": {"base": {"kernel": z((16, 8)), "bias": z((8,))}},
        },
        "attn": {
            "qkv": {"base": {"kernel": z((8, 24)), "bias": z((24,))}},
            "proj": {"base": {"kernel": z((8, 8)), "bias": z((8,))}},
        },
        "norm1": {"scale": z((8,)), "bias": z((8,))},
        "odd": {"fc1": {"base": {"kernel": z((8, 10))}}},  # 10 % 4 != 0
    }


def test_tp_spec_rules():
    mesh = make_mesh_2d(2, 4)
    sh = tp_shardings(_fake_block_params(), mesh)
    assert sh["mlp"]["fc1"]["base"]["kernel"].spec == P(None, "model")
    assert sh["mlp"]["fc1"]["base"]["bias"].spec == P("model")
    assert sh["mlp"]["fc2"]["base"]["kernel"].spec == P("model", None)
    assert sh["mlp"]["fc2"]["base"]["bias"].spec == P()
    assert sh["attn"]["qkv"]["base"]["kernel"].spec == P(None, "model")
    assert sh["attn"]["proj"]["base"]["kernel"].spec == P("model", None)
    assert sh["norm1"]["scale"].spec == P()
    # non-divisible output dim stays replicated
    assert sh["odd"]["fc1"]["base"]["kernel"].spec == P()


def _tiny_task(tp: int):
    import __graft_entry__ as g
    from pseldnets_tpu.data.datasets import BaseDatasetSpec
    from pseldnets_tpu.train.module import SELDTask

    cfg = g._base_cfg(tiny=True)
    cfg["trainer"]["tensor_parallel"] = tp

    class _Spec(BaseDatasetSpec):
        def __init__(self):
            super().__init__()
            self.label_dic = {f"c{i}": i for i in range(4)}
            self.max_ov = 3

    mesh = None if tp > 1 else make_mesh(8)
    return SELDTask(cfg, _Spec(), steps_per_epoch=10, mesh=mesh), cfg


def _tiny_batch(cfg, B=8):
    T_label = int(cfg["data"]["train_chunklen_sec"] / 0.1)
    return {
        "data": np.random.default_rng(0).standard_normal(
            (B, 4, cfg["data"]["train_chunklen_sec"]
             * cfg["data"]["sample_rate"])).astype(np.float32),
        "adpit_label": np.zeros((B, T_label, 6, 4, 4), np.float32),
        "ov": ["1"] * B,
    }


def test_tp_train_step_matches_dp():
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    task_dp, cfg = _tiny_task(tp=1)
    state_dp = task_dp.init_state(jax.random.PRNGKey(0))
    batch = _tiny_batch(cfg)
    state_dp, losses_dp, _ = task_dp.train_step(state_dp, batch,
                                                jax.random.PRNGKey(1))

    task_tp, _ = _tiny_task(tp=4)
    assert task_tp.mesh.shape == {"data": 2, "model": 4}
    state_tp = task_tp.init_state(jax.random.PRNGKey(0))
    n_sharded = count_model_sharded(state_tp.params)
    assert n_sharded >= 4, f"only {n_sharded} leaves model-sharded"
    state_tp, losses_tp, _ = task_tp.train_step(state_tp, batch,
                                                jax.random.PRNGKey(1))

    np.testing.assert_allclose(float(losses_tp["loss_all"]),
                               float(losses_dp["loss_all"]),
                               rtol=2e-4)
    # params stay model-sharded after the optimizer update (GSPMD may
    # propagate the sharding to MORE leaves than the annotated minimum —
    # observed 26 vs 13 — but must not drop back to replicated), and a
    # second step threads the donated sharded state
    assert count_model_sharded(state_tp.params) >= n_sharded
    state_tp, losses_tp2, _ = task_tp.train_step(state_tp, batch,
                                                 jax.random.PRNGKey(2))
    assert np.isfinite(float(losses_tp2["loss_all"]))

    # one more DP step so both trees are after 2 steps, then compare values
    state_dp, _, _ = task_dp.train_step(state_dp, batch, jax.random.PRNGKey(2))
    flat_dp = jax.tree_util.tree_leaves(jax.device_get(state_dp.params))
    flat_tp = jax.tree_util.tree_leaves(jax.device_get(state_tp.params))
    worst = max(float(np.max(np.abs(a - b))) for a, b in zip(flat_dp, flat_tp))
    assert worst < 5e-4, f"param divergence after 2 steps: {worst}"


def test_tp_checkpoint_roundtrip(tmp_path):
    """Orbax save gathers model-sharded params to full host arrays
    (train/loop.py device_gets before save); restore through
    init_state(ckpt_path=...) must reproduce the values AND re-shard them
    onto the 2-D mesh."""
    if len(jax.devices()) < 8:
        pytest.skip("needs the 8-device CPU mesh")
    import orbax.checkpoint as ocp

    task, cfg = _tiny_task(tp=4)
    state = task.init_state(jax.random.PRNGKey(0))
    state, _, _ = task.train_step(state, _tiny_batch(cfg),
                                  jax.random.PRNGKey(1))

    ck = ocp.StandardCheckpointer()
    ck.save(tmp_path / "ckpt",
            jax.device_get({"params": state.params,
                            "batch_stats": state.batch_stats}), force=True)
    ck.wait_until_finished()

    task2, _ = _tiny_task(tp=4)
    state2 = task2.init_state(jax.random.PRNGKey(7),
                              ckpt_path=str(tmp_path / "ckpt"))
    a = jax.tree_util.tree_leaves(jax.device_get(state.params))
    b = jax.tree_util.tree_leaves(jax.device_get(state2.params))
    for x, y in zip(a, b):
        np.testing.assert_array_equal(np.asarray(x), np.asarray(y))
    assert count_model_sharded(state2.params) >= 13
