#!/usr/bin/env python
"""Benchmark: preproc+HTSAT multi-ACCDOA inference throughput on one chip.

Measures the BASELINE.json headline metric — 1-minute FOA clips/sec/chip for
the fused on-device feature chain (STFT->mel->IV) + HTS-AT forward — on the
default JAX backend (the real TPU under the driver). Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline normalizes against the driver target of 5x an A100 running the
torch reference pipeline; we estimate the A100 preproc+HTSAT inference rate at
60 one-minute clips/sec/chip (no published throughput exists — the reference
publishes quality numbers only, SURVEY §6), i.e. target = 300 clips/s/chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       str(Path(__file__).resolve().parent / ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


TARGET_CLIPS_PER_SEC = 300.0  # 5 x estimated A100 torch-reference rate


def main():
    import jax
    import jax.numpy as jnp

    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops import make_extractor

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    num_classes = 13
    model, _ = build_model(cfg, num_classes, dtype=jnp.bfloat16)
    extractor = make_extractor(cfg)

    B = 16  # 10-second clips per batch
    rng = jax.random.PRNGKey(0)
    wav = jax.random.normal(rng, (B, 4, 240000), jnp.float32) * 0.1
    feats = extractor(wav[:2])
    variables = model.init({"params": rng}, feats, train=False)

    @jax.jit
    def step(variables, wav):
        return model.apply(variables, extractor(wav), train=False)

    out = step(variables, wav)
    jax.block_until_ready(out)

    # warm
    for _ in range(2):
        out = step(variables, wav)
    jax.block_until_ready(out)

    iters = 10
    t0 = time.perf_counter()
    for _ in range(iters):
        out = step(variables, wav)
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / iters

    clips_10s_per_sec = B / dt
    one_min_clips_per_sec = clips_10s_per_sec / 6.0
    print(json.dumps({
        "metric": "1min_FOA_clips/sec/chip (preproc+HTSAT mACCDOA fwd, bf16)",
        "value": round(one_min_clips_per_sec, 3),
        "unit": "clips/s",
        "vs_baseline": round(one_min_clips_per_sec / TARGET_CLIPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
