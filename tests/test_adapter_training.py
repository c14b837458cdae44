"""Adapter fine-tuning end-to-end: with adapt=adapter, one optimizer step must
change ONLY biases + adapter params + the task head, leaving backbone weights
frozen (reference freeze_layers_if_needed, accdoa.py:148-170)."""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.config import Config
from pseldnets_tpu.data.datasets import BaseDatasetSpec
from pseldnets_tpu.train.module import SELDTask


class _Spec(BaseDatasetSpec):
    def __init__(self, K=3):
        super().__init__()
        self.label_dic = {f"c{i}": i for i in range(K)}
        self.max_ov = 3


def _cfg():
    return Config.wrap({
        "seed": 0,
        "data": {"audio_feature": "logmelIV", "sample_rate": 16000,
                 "nfft": 256, "n_mels": 16, "hoplen": 320, "window": "hann",
                 "train_chunklen_sec": 4, "test_chunklen_sec": 4,
                 "train_hoplen_sec": 4, "test_hoplen_sec": 4},
        "model": {"method": "multi_accdoa", "backbone": "HTSAT",
                  "batch_size": 2, "decoder": None, "num_decoder_layers": 1,
                  "kwargs": {"spec_size": 64, "patch_size": 4,
                             "patch_stride": [4, 4], "embed_dim": 8,
                             "depths": [1, 1], "num_heads": [2, 4],
                             "window_size": 4, "mlp_ratio": 2.0,
                             "drop_path_rate": 0.0, "tgt_output_frames": 40,
                             "pretrained_path": None},
                  "loss": {"_target_": "loss.multi_accdoa.Losses",
                           "loss_fn": "mse", "loss_type": "loss_all"},
                  "optimizer": {"method": "AdamW", "kwargs": {"lr": 0.01}},
                  "lr_scheduler": {"method": "StepLR",
                                   "kwargs": {"step_size": 10, "gamma": 0.1}}},
        "adapt": {"method": "adapter",
                  "adapt_kwargs": {"position": ["MlpAdapter", "SpatialAdapter"],
                                   "type": "adapter", "mlp_ratio": 0.5,
                                   "adapter_scalar": 0.1, "act_layer": "gelu"}},
        "augment": {"type": [], "AugMix": False,
                    "rotate": {"p": 0.8, "rotation_type": 48},
                    "wavmix": {"alpha": 0.5, "p": 0.5},
                    "trackmix": {"alpha": 0.5},
                    "specaug": {"T": 40, "F": 8, "mT": 4, "mF": 2},
                    "crop": {"T": 8, "F": 4, "mC": 4},
                    "freqshift": {"p": 0.5, "shift_range": 15}},
        "trainer": {"precision": "32-true", "gradient_clip_val": 1.0},
    })


def test_adapter_step_freezes_backbone(rng):
    cfg = _cfg()
    task = SELDTask(cfg, _Spec(), steps_per_epoch=10, num_devices=1)
    state = task.init_state(jax.random.PRNGKey(0))
    before = jax.device_get(state.params)

    B = 2
    batch = {
        "data": rng.standard_normal((B, 4, 4 * 16000)).astype(np.float32) * 0.1,
        "adpit_label": np.zeros((B, 40, 6, 4, 3), np.float32),
        "ov": ["1"] * B,
    }
    batch["adpit_label"][:, :, 0, 0, 0] = 1.0
    batch["adpit_label"][:, :, 0, 1, 0] = 1.0
    state, losses, _ = task.train_step(state, batch, jax.random.PRNGKey(1))
    assert np.isfinite(float(losses["loss_all"]))
    after = jax.device_get(state.params)

    import flax

    flat_b = flax.traverse_util.flatten_dict(before)
    flat_a = flax.traverse_util.flatten_dict(after)
    changed_frozen, changed_train = [], []
    for k in flat_b:
        name = "/".join(map(str, k))
        moved = not np.allclose(flat_b[k], flat_a[k])
        trainable = (name.endswith("/bias") or "adapter" in name
                     or "lora" in name or "tscam_conv" in name)
        if moved and not trainable:
            changed_frozen.append(name)
        if moved and trainable:
            changed_train.append(name)
    assert not changed_frozen, f"frozen params moved: {changed_frozen[:5]}"
    assert any("adapter" in n for n in changed_train), "adapters did not train"
    assert any("tscam_conv" in n for n in changed_train), "head did not train"


def test_stop_gradient_freeze_matches_full_grads(rng):
    """The train step freezes via stop_gradient on frozen leaves (so XLA
    DCEs their weight-grad matmuls, train/module.py). Pin that this is
    numerically a no-op for trainable leaves: grads wrt trainable params
    are IDENTICAL to plain full-tree differentiation, and frozen leaves'
    grads are exactly zero (torch's requires_grad=False analogue)."""
    import flax

    from pseldnets_tpu.train.optim import trainable_mask

    cfg = _cfg()
    task = SELDTask(cfg, _Spec(), steps_per_epoch=10, num_devices=1)
    state = task.init_state(jax.random.PRNGKey(0))
    mask = trainable_mask(state.params, "adapter")
    assert not all(jax.tree_util.tree_leaves(mask))

    x = rng.standard_normal((2, 4, 4 * 16000)).astype(np.float32) * 0.1
    feats = task.extractor(jnp.asarray(x))

    def raw_loss(params):
        out = task.model.apply(
            {"params": params, "batch_stats": state.batch_stats},
            feats, train=False)
        return jnp.mean(out["multi_accdoa"].astype(jnp.float32) ** 2)

    def masked_loss(params):
        params = jax.tree_util.tree_map(
            lambda q, m: q if m else jax.lax.stop_gradient(q), params, mask)
        return raw_loss(params)

    g_full = jax.jit(jax.grad(raw_loss))(state.params)
    g_mask = jax.jit(jax.grad(masked_loss))(state.params)

    flat_full = flax.traverse_util.flatten_dict(jax.device_get(g_full))
    flat_mask = flax.traverse_util.flatten_dict(jax.device_get(g_mask))
    flat_m = flax.traverse_util.flatten_dict(
        jax.tree_util.tree_map(bool, mask))
    n_train = n_frozen = 0
    for k, m in flat_m.items():
        if m:
            np.testing.assert_array_equal(
                flat_mask[k], flat_full[k],
                err_msg=f"trainable grad changed: {'/'.join(map(str, k))}")
            n_train += 1
        else:
            assert not np.any(flat_mask[k]), \
                f"frozen leaf has nonzero grad: {'/'.join(map(str, k))}"
            n_frozen += 1
    assert n_train > 0 and n_frozen > 0
