"""Fused-kernel training forward (train/fused_forward.py): loss, grads and
batch-stats updates must match the flax train-mode apply (drop_path=0 so no
RNG-order divergence; f32 interpret kernels)."""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.models import heads
from pseldnets_tpu.train.fused_forward import (htsat_fused_train_forward,
                                               supports_fused_train)


def _tiny(drop_path=0.0, dtype=jnp.float32):
    return heads.HTSAT(
        num_classes=3, in_channels=7, mel_bins=16, num_tracks=1,
        tgt_output_frames=24, dtype=dtype,
        encoder_kwargs=(("spec_size", 64), ("patch_size", 4),
                        ("patch_stride", (4, 4)), ("embed_dim", 16),
                        ("depths", (2, 2)), ("num_heads", (2, 4)),
                        ("window_size", 4), ("mlp_ratio", 2.0),
                        ("drop_path_rate", drop_path)))


def test_fused_train_forward_matches_flax():
    model = _tiny(0.0)
    assert supports_fused_train(model)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((2, 7, 241, 16)).astype(np.float32))
    y = jnp.asarray(r.standard_normal((2, 24, 9)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    key = jax.random.PRNGKey(3)

    def loss_flax(params):
        out, nv = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": key, "patchout": key})
        return jnp.mean((out["accdoa"] - y) ** 2), nv["batch_stats"]

    def loss_fused(params):
        preds, new_bs = htsat_fused_train_forward(
            model,
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, dropout_rng=key, compute_dtype=jnp.float32, interpret=True)
        return jnp.mean((preds["accdoa"] - y) ** 2), new_bs

    (l0, bs0), g0 = jax.value_and_grad(loss_flax, has_aux=True)(
        variables["params"])
    (l1, bs1), g1 = jax.value_and_grad(loss_fused, has_aux=True)(
        variables["params"])

    assert abs(float(l0) - float(l1)) < 2e-6, (float(l0), float(l1))
    # ScalarBN train-mode stats update identical (same module either way)
    for a, b in zip(jax.tree_util.tree_leaves(bs0),
                    jax.tree_util.tree_leaves(bs1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b), atol=1e-6)
    # grads within the vjp kernel's f32 band (test_swin_vjp pins 2e-4)
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    worst = 0.0
    for path, a in flat0:
        b = flat1[path]
        scale = max(1.0, float(np.abs(np.asarray(a)).max()))
        worst = max(worst, float(np.abs(np.asarray(a)
                                        - np.asarray(b)).max()) / scale)
    assert worst < 5e-4, worst


def test_fused_train_forward_adapter_matches_flax():
    """AdapterBit config (MlpAdapter + SpatialAdapter, constant scalar):
    the fused path routes every block through swin_block_train_adapt and
    must reproduce flax loss + grads, including the adapter param grads."""
    import flax

    from pseldnets_tpu.models.adapters import AdaptConfig

    adapt = AdaptConfig({
        "method": "adapter",
        "adapt_kwargs": {"position": ["MlpAdapter", "SpatialAdapter"],
                         "type": "adapter", "mlp_ratio": 0.5,
                         "adapter_scalar": 0.1, "act_layer": "gelu"}})
    model = heads.HTSAT(
        num_classes=3, in_channels=7, mel_bins=16, num_tracks=1,
        tgt_output_frames=24, adapt=adapt,
        encoder_kwargs=(("spec_size", 64), ("patch_size", 4),
                        ("patch_stride", (4, 4)), ("embed_dim", 16),
                        ("depths", (2, 2)), ("num_heads", (2, 4)),
                        ("window_size", 4), ("mlp_ratio", 2.0),
                        ("drop_path_rate", 0.0)))
    assert supports_fused_train(model)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((2, 7, 241, 16)).astype(np.float32))
    y = jnp.asarray(r.standard_normal((2, 24, 9)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    # adapter fc2 is zero-init; randomize every adapter leaf so their grads
    # (and the upstream paths they gate) are non-trivial
    flat = flax.traverse_util.flatten_dict(variables["params"])
    for k in flat:
        if "adapter" in k:
            flat[k] = jnp.asarray(
                r.standard_normal(flat[k].shape).astype(np.float32) * 0.3)
    params0 = flax.traverse_util.unflatten_dict(flat)
    key = jax.random.PRNGKey(3)

    def loss_flax(params):
        out, _ = model.apply(
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, train=True, mutable=["batch_stats"],
            rngs={"dropout": key, "patchout": key})
        return jnp.mean((out["accdoa"] - y) ** 2)

    def loss_fused(params):
        preds, _ = htsat_fused_train_forward(
            model,
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, dropout_rng=key, compute_dtype=jnp.float32, interpret=True)
        return jnp.mean((preds["accdoa"] - y) ** 2)

    l0, g0 = jax.value_and_grad(loss_flax)(params0)
    l1, g1 = jax.value_and_grad(loss_fused)(params0)
    assert abs(float(l0) - float(l1)) < 2e-6, (float(l0), float(l1))
    flat0 = jax.tree_util.tree_leaves_with_path(g0)
    flat1 = dict(jax.tree_util.tree_leaves_with_path(g1))
    worst = 0.0
    n_adapter = 0
    for path, a in flat0:
        b = flat1[path]
        if "adapter" in str(path):
            n_adapter += 1
            assert float(np.abs(np.asarray(b)).max()) > 0, path
        scale = max(1.0, float(np.abs(np.asarray(a)).max()))
        worst = max(worst, float(np.abs(np.asarray(a)
                                        - np.asarray(b)).max()) / scale)
    assert n_adapter == 2 * 4 * 4  # 2 positions x fc1/fc2 k+b x 4 blocks
    assert worst < 5e-4, worst


def test_fused_train_forward_sharded():
    """Multi-chip data parallelism: pallas_call is not GSPMD-partitionable
    (a sharded jit all-gathers the batch and runs every kernel replicated),
    so the fused train forward shard_maps each block over the data axis.
    Loss and grads on an 8-device mesh must match the single-device run
    (shard_map's transpose psums the replicated-param cotangents)."""
    from jax.sharding import Mesh

    model = _tiny(0.0)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((8, 7, 241, 16)).astype(np.float32))
    y = jnp.asarray(r.standard_normal((8, 24, 9)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    key = jax.random.PRNGKey(3)
    mesh = Mesh(np.array(jax.devices()[:8]), ("data",))

    def loss(params, mesh):
        preds, _ = htsat_fused_train_forward(
            model,
            {"params": params, "batch_stats": variables["batch_stats"]},
            x, dropout_rng=key, compute_dtype=jnp.float32, interpret=True,
            mesh=mesh)
        return jnp.mean((preds["accdoa"] - y) ** 2)

    l0, g0 = jax.value_and_grad(lambda p: loss(p, None))(variables["params"])
    l1, g1 = jax.value_and_grad(lambda p: loss(p, mesh))(variables["params"])
    assert abs(float(l0) - float(l1)) < 1e-6, (float(l0), float(l1))
    for (path, a), (_, b) in zip(jax.tree_util.tree_leaves_with_path(g0),
                                 jax.tree_util.tree_leaves_with_path(g1)):
        np.testing.assert_allclose(np.asarray(a), np.asarray(b),
                                   rtol=1e-4, atol=1e-5, err_msg=str(path))


def test_fused_train_forward_droppath_finite():
    """drop_path>0: masks differ from flax's draw order by design — just
    pin finiteness + shape + that masks actually vary with the rng."""
    model = _tiny(0.5)
    r = np.random.default_rng(1)
    x = jnp.asarray(r.standard_normal((2, 7, 241, 16)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)
    outs = []
    for seed in (1, 2):
        preds, _ = htsat_fused_train_forward(
            model, variables, x, dropout_rng=jax.random.PRNGKey(seed),
            compute_dtype=jnp.float32, interpret=True)
        arr = np.asarray(preds["accdoa"])
        assert np.isfinite(arr).all()
        outs.append(arr)
    assert np.abs(outs[0] - outs[1]).max() > 0  # rng reaches the masks


def test_supports_fused_train_gates():
    from pseldnets_tpu.models.adapters import AdaptConfig

    assert supports_fused_train(_tiny())
    lora = heads.HTSAT(num_classes=3,
                       adapt=AdaptConfig({"method": "lora"}),
                       encoder_kwargs=(("depths", (2, 2)),
                                       ("num_heads", (2, 4))))
    assert not supports_fused_train(lora)


def test_fused_forward_auto_knob(monkeypatch):
    """trainer.fused_forward defaults to "auto" (round-5 r9d A/B win):
    fused on TPU backends when the model supports it, flax otherwise;
    explicit true still enforces support, explicit false pins flax."""
    from pathlib import Path

    from pseldnets_tpu.config import compose
    from pseldnets_tpu.data.datasets import BaseDatasetSpec
    from pseldnets_tpu.train import module as tm

    repo = Path(__file__).resolve().parent.parent
    tiny = [
        "data.sample_rate=16000", "data.nfft=256", "data.n_mels=16",
        "data.hoplen=320", "data.train_chunklen_sec=4",
        "model.kwargs.spec_size=64", "model.kwargs.embed_dim=8",
        "model.kwargs.depths=[1,1]", "model.kwargs.num_heads=[2,4]",
        "model.kwargs.window_size=4", "model.kwargs.drop_path_rate=0.0",
        "model.kwargs.tgt_output_frames=40",
        "model.kwargs.pretrained_path=null",
    ]

    class _Spec(BaseDatasetSpec):
        def __init__(self):
            super().__init__()
            self.label_dic = {f"c{i}": i for i in range(3)}
            self.max_ov = 3

    def task(extra):
        cfg = compose(str(repo / "configs"), "train",
                      ["loss=multi_accdoa"] + tiny + extra)
        return tm.SELDTask(cfg, _Spec(), steps_per_epoch=2, num_devices=1)

    # auto + CPU backend -> flax
    assert task([]).fused_forward is False
    # auto + TPU backend + supported model -> fused
    monkeypatch.setattr(tm.jax, "default_backend", lambda: "tpu")
    assert task([]).fused_forward is True
    # auto + TPU + constant-scalar AdapterBit -> fused (adapter VJP kernel)
    assert task(["adapt=adapter"]).fused_forward is True
    # ... but a learnable scalar is not in the kernels -> flax, no raise
    assert task(
        ["adapt=adapter",
         "adapt.adapt_kwargs.adapter_scalar=learnable_scalar"]
    ).fused_forward is False
    # auto + TPU + unsupported (LoRA) -> flax, no raise
    assert task(["adapt=lora"]).fused_forward is False
    # mono_finetune (method=mono_adapter, position=[]) is a plain model
    assert task(["adapt=mono_finetune"]).fused_forward is True
    # explicit false pins flax even on TPU
    assert task(["trainer.fused_forward=false"]).fused_forward is False
    # explicit true on an unsupported config raises
    import pytest

    with pytest.raises(ValueError):
        task(["adapt=lora", "trainer.fused_forward=true"])

    # fused EVAL gate (r10d): plain and constant-scalar adapter HTSAT both
    # route to the fused serving fn; LoRA and learnable-scalar stay flax
    for extra, expect in (([], True), (["adapt=adapter"], True),
                          (["adapt=mono_finetune"], True),
                          (["adapt=lora"], False),
                          (["adapt=adapter",
                            "adapt.adapt_kwargs.adapter_scalar="
                            "learnable_scalar"], False)):
        fn, _ = task(extra)._select_fused_eval()
        assert (fn is not None) is expect, extra
