#!/usr/bin/env python
"""Probe R3C: serial vs double-buffered train loop on-chip (VERDICT round-2
weak #6 / next-round #5 — 'measured step-interval improvement on this box').

Same jitted step, same synthetic batches, AugMix+wave-aug config (the
host-heaviest path): A = serial prepare_batch -> dispatch -> repeat;
B = _PreparedBatchPipeline overlapping batch N+1's host prep + transfers
with batch N's device step. On this 1-core box the win comes from the
GIL-released segments (native transfers through the relay, XLA dispatch);
on a many-core production host the full host_augment hides."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import numpy as np

B = 32
STEPS = 8


def make_batches(n, sec, sr, t_label, k_cls=13):
    rng = np.random.default_rng(0)
    out = []
    for i in range(n):
        adpit = np.zeros((B, t_label, 6, 4, k_cls), np.float32)
        cls = rng.integers(0, k_cls, (B, t_label))
        bi, ti = np.meshgrid(np.arange(B), np.arange(t_label), indexing="ij")
        adpit[bi, ti, 0, 0, cls] = 1.0
        out.append({
            "data": (rng.standard_normal((B, 4, sec * sr))
                     .astype(np.float32) * 0.1),
            "adpit_label": adpit,
            "ov": ["1"] * B,
        })
    return out


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.data.datasets import BaseDatasetSpec
    from pseldnets_tpu.train.loop import _PreparedBatchPipeline
    from pseldnets_tpu.train.module import SELDTask

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "augment=augmix",
                   "model.kwargs.pretrained_path=null",
                   "model.kwargs.audioset_pretrain=false"])

    class _Spec(BaseDatasetSpec):
        def __init__(self):
            super().__init__()
            self.label_dic = {f"c{i}": i for i in range(13)}
            self.max_ov = 3

    task = SELDTask(cfg, _Spec(), steps_per_epoch=100)
    state = task.init_state(jax.random.PRNGKey(0))
    sec = cfg["data"]["train_chunklen_sec"]
    sr = cfg["data"]["sample_rate"]
    batches = make_batches(STEPS + 1, sec, sr, sec * 10)
    key = jax.random.PRNGKey(7)

    # compile + warm both halves once
    k0, key = jax.random.split(key)
    state, losses, _ = task.train_step(state, batches[0], k0)
    jax.block_until_ready(losses["loss_all"])

    # A: serial
    t0 = time.perf_counter()
    for b in batches[1:]:
        key, sub = jax.random.split(key)
        state, losses, _ = task.train_step(state, b, sub)
    jax.block_until_ready(losses["loss_all"])
    serial = (time.perf_counter() - t0) / STEPS
    print(f"serial loop: {serial*1000:.1f} ms/step", flush=True)

    # B: pipelined
    pipe = _PreparedBatchPipeline(task, iter(batches[1:]))
    t0 = time.perf_counter()
    for prepared in pipe:
        key, sub = jax.random.split(key)
        state, losses, _ = task.train_step_prepared(state, prepared, sub)
    jax.block_until_ready(losses["loss_all"])
    piped = (time.perf_counter() - t0) / STEPS
    pipe.close()
    print(f"pipelined loop: {piped*1000:.1f} ms/step "
          f"({serial/piped:.2f}x)", flush=True)


if __name__ == "__main__":
    main()
