"""Optimizer factory tests: torch lr_scheduler semantics, adapter freeze
masks, and multi_opt grouping."""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.train.optim import build_optimizer, epoch_schedule, trainable_mask


def test_steplr_semantics():
    fn = epoch_schedule(0.1, {"method": "StepLR",
                              "kwargs": {"step_size": 2, "gamma": 0.1}},
                        steps_per_epoch=10)
    # torch StepLR: lr * gamma^(epoch // step_size), stepped per epoch
    assert np.isclose(float(fn(0)), 0.1)
    assert np.isclose(float(fn(19)), 0.1)     # epoch 1
    assert np.isclose(float(fn(20)), 0.01)    # epoch 2
    assert np.isclose(float(fn(45)), 0.001)   # epoch 4


def test_multistep_and_cosine():
    fn = epoch_schedule(1.0, {"method": "MultiStepLR",
                              "kwargs": {"milestones": [2, 4], "gamma": 0.5}}, 1)
    assert np.isclose(float(fn(1)), 1.0)
    assert np.isclose(float(fn(2)), 0.5)
    assert np.isclose(float(fn(4)), 0.25)
    fn = epoch_schedule(1.0, {"method": "CosineAnnealingLR",
                              "kwargs": {"T_max": 10, "eta_min": 0.0}}, 1)
    assert np.isclose(float(fn(0)), 1.0)
    assert np.isclose(float(fn(10)), 0.0, atol=1e-7)


def test_adapter_freeze_mask():
    params = {
        "encoder": {"attn": {"qkv": {"base": {"kernel": jnp.zeros((2, 2)),
                                              "bias": jnp.zeros(2)}},
                    "adapter": {"fc1": {"kernel": jnp.zeros((2, 1))}}}},
        "tscam_conv": {"kernel": jnp.zeros((1, 1, 2, 2))},
    }
    mask = trainable_mask(params, "adapter")
    assert mask["encoder"]["attn"]["qkv"]["base"]["kernel"] is False
    assert mask["encoder"]["attn"]["qkv"]["base"]["bias"] is True
    assert mask["encoder"]["attn"]["adapter"]["fc1"]["kernel"] is True
    assert mask["tscam_conv"]["kernel"] is True
    # no adapt -> everything trainable
    mask = trainable_mask(params, "none")
    assert all(jax.tree_util.tree_leaves(mask))


def test_frozen_params_do_not_update():
    cfg = {"model": {"optimizer": {"method": "AdamW",
                                   "kwargs": {"lr": 0.1}},
                     "lr_scheduler": {"method": "StepLR",
                                      "kwargs": {"step_size": 10, "gamma": 0.1}}},
           "adapt": {"method": "adapter"},
           "trainer": {"gradient_clip_val": 1.0}}
    params = {"backbone": {"kernel": jnp.ones((2, 2)), "bias": jnp.zeros(2)},
              "adapter_x": {"kernel": jnp.ones((2, 2))}}
    tx, _ = build_optimizer(cfg, params, steps_per_epoch=1)
    state = tx.init(params)
    grads = jax.tree_util.tree_map(jnp.ones_like, params)
    updates, _ = tx.update(grads, state, params)
    assert float(jnp.abs(updates["backbone"]["kernel"]).max()) == 0.0
    assert float(jnp.abs(updates["backbone"]["bias"]).max()) > 0.0
    assert float(jnp.abs(updates["adapter_x"]["kernel"]).max()) > 0.0
