#!/usr/bin/env python
"""On-TPU check: SELDTask.eval_step (fused serving route) equals the flax
apply, tiny config."""
import json
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))
sys.path.insert(0, str(REPO / "tests"))

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


cfg = Config.wrap({
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
    "adapt": None,
    "augment": {"type": [], "AugMix": False,
                "rotate": {"p": 0.8, "rotation_type": 48},
                "wavmix": {"alpha": 0.5, "p": 0.5},
                "trackmix": {"alpha": 0.5},
                "specaug": {"T": 40, "F": 8, "mT": 4, "mF": 2},
                "crop": {"T": 8, "F": 4, "mC": 4},
                "freqshift": {"p": 0.5, "shift_range": 15}},
    "trainer": {"precision": "32-true", "gradient_clip_val": 1.0},
})

task = SELDTask(cfg, _Spec(), steps_per_epoch=10, num_devices=1)
state = task.init_state(jax.random.PRNGKey(0))
rng = np.random.default_rng(0)
batch = {"data": rng.standard_normal((2, 4, 4 * 16000)).astype(np.float32) * 0.1}

out = task.eval_step(state, batch)
key = "multi_accdoa"
fused = np.asarray(out[key])

variables = {"params": state.params}
if state.batch_stats:
    variables["batch_stats"] = state.batch_stats
feats = task._forward_features(jnp.asarray(batch["data"], jnp.float32))
ref = np.asarray(jax.jit(lambda v, f: task.model.apply(v, f, train=False))(
    variables, feats)[key])
d = np.abs(fused - ref).max()
print(json.dumps({"max_abs_diff": float(d), "shape": list(fused.shape)}),
      flush=True)
# On TPU the flax path's f32 matmuls run at XLA's DEFAULT (bf16) precision
# while the fused kernel computes true f32 — the two agree to bf16-precision
# noise, with the fused output the more accurate of the pair. (CPU interpret
# agreement is 5e-5, tests/test_serving_fused.py.)
assert d < 5e-3, d
print("PASS", flush=True)
