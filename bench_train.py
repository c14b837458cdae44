#!/usr/bin/env python
"""Training-throughput benchmark on one chip: sustained full train steps
(fused logmelIV frontend + HTSAT mACCDOA fwd+bwd + AdamW, bf16 model) at
B=32, K-amortized with varying inputs (the relay dedupes identical
dispatches — see CLAUDE.md). Also measures the AdapterBit fine-tune step
(frozen backbone, masked optimizer).

Prints one JSON line per mode:
{"metric": "...", "value": ms_per_step, "unit": "ms", "clips_per_sec": N}

Reference headline: "train from scratch in 1-2 days on an RTX 3090"
(~25 epochs over the 67k-clip corpus => ~1-2 h/epoch). A 109 ms B=32 step
is ~23 min/epoch on a single v5e chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

K = 16  # fori-loop harness (round 3): the body compiles once regardless of
        # K, so K sits high enough that the ~25 ms relay RTT is <2% of the
        # signal


def make_labels(rng, B, T_label, K_cls=13):
    import numpy as np

    adpit = np.zeros((B, T_label, 6, 4, K_cls), np.float32)
    cls = rng.integers(0, K_cls, (B, T_label))
    doa = rng.standard_normal((B, T_label, 3)).astype(np.float32)
    doa /= np.linalg.norm(doa, axis=-1, keepdims=True)
    bi, ti = np.meshgrid(np.arange(B), np.arange(T_label), indexing="ij")
    adpit[bi, ti, 0, 0, cls] = 1.0
    for ax in range(3):
        adpit[bi, ti, 0, 1 + ax, cls] = doa[..., ax]
    return adpit


def bench_mode(name, overrides, B=32):
    import jax
    import jax.numpy as jnp
    import numpy as np

    from pseldnets_tpu.config import compose
    from pseldnets_tpu.data.datasets import BaseDatasetSpec
    from pseldnets_tpu.train.module import SELDTask

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null",
                   "model.kwargs.audioset_pretrain=false"] + overrides)

    class _Spec(BaseDatasetSpec):
        def __init__(self):
            super().__init__()
            self.label_dic = {f"c{i}": i for i in range(13)}
            self.max_ov = 3

    task = SELDTask(cfg, _Spec(), steps_per_epoch=100)
    state = task.init_state(jax.random.PRNGKey(0))
    # donate=False: the step is re-traced inside the K-iteration outer jit
    # below, where donation would be ignored (with a warning); the production
    # per-step dispatch keeps donation
    inner = task._make_train_step(donate=False)

    rng = np.random.default_rng(0)
    sr = cfg["data"]["sample_rate"]
    sec = cfg["data"]["train_chunklen_sec"]
    base_x = jnp.asarray(rng.standard_normal((B, 4, sec * sr)), jnp.float32) * 0.1
    labels = {"adpit_label": jnp.asarray(make_labels(rng, B, sec * 10))}
    flags = jnp.asarray(task.sample_aug_flags())
    ov1 = jnp.zeros((B,), bool)
    key0 = jax.random.PRNGKey(7)

    @jax.jit
    def kstep(state, base_x, labels, k):
        def body(i, carry):
            state, acc = carry
            bx = base_x * (1.0 + 1e-4 * (k * K + i))
            state, losses = inner(state, bx, labels,
                                  jax.random.fold_in(key0, k * K + i),
                                  flags, ov1)
            return state, acc + losses["loss_all"]
        return jax.lax.fori_loop(0, K, body, (state, jnp.float32(0)))

    t0 = time.time()
    state, a = kstep(state, base_x, labels, jnp.int32(0))
    _ = float(a)
    compile_s = time.time() - t0
    iters = 4
    t0 = time.perf_counter()
    for i in range(iters):
        state, a = kstep(state, base_x, labels, jnp.int32(i + 1))
        _ = float(a)
    dt = (time.perf_counter() - t0) / (iters * K)
    print(json.dumps({
        "metric": name, "value": round(dt * 1000, 2), "unit": "ms/step",
        "B": B, "clips_per_sec": round(B / dt, 1),
        "compile_s": round(compile_s, 1),
        "epoch_min_67k_clips": round(67000 * 6 / (B / dt) / 60, 1),
    }), flush=True)
    return dt


def main():
    from bench import _wait_for_backend
    _wait_for_backend()  # ride out transient relay outages (see bench.py)
    args = sys.argv[1:]
    # trainer.fused_forward defaults to "auto" (round-5 r9d A/B: fused wins
    # 46.92 vs 79.31 ms @B=32), so the plain run measures the production
    # fused path on TPU; --flax pins the flax step for A/Bs, --fused
    # enforces the kernels (raises if unsupported).
    fused = "--fused" in args
    flax = "--flax" in args
    sizes = [int(s) for s in [a for a in args if not a.startswith("-")]
             or ["32"]]
    ov = (["trainer.fused_forward=true"] if fused
          else ["trainer.fused_forward=false"] if flax else [])
    tag = (" fused-vjp-blocks" if fused
           else " flax" if flax else " auto=fused-on-tpu")
    for b in sizes:
        bench_mode(f"train_step_htsat_maccdoa_b{b} (fused frontend + "
                   f"fwd+bwd+AdamW, bf16{tag})", ov, B=b)
    if 32 in sizes and not fused:
        # AdapterBit inserts bottleneck/LoRA adapters INSIDE the blocks —
        # the fused kernels don't implement them, so no fused mode here
        bench_mode("train_step_htsat_maccdoa_b32_adapterbit (frozen backbone + adapters)",
                   ["adapt=adapter"], B=32)


if __name__ == "__main__":
    main()
