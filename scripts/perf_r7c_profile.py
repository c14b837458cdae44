#!/usr/bin/env python
"""Probe R7C (round 4): device-op profile of the cnn14_accdoa bench step
(VERDICT #5 — 225.1 clips/s @B=128 vs the 300 bar; PERF.md r4d says the conv
trunk is near MXU peak, so the lever must be the non-conv residue). Buckets
the ~94.75 ms step by device op to name what isn't conv.

Device-timeline durations are contention-immune (CLAUDE.md), so this can run
beside CPU work; only wall numbers need a quiet box.
"""

import gzip
import json
import sys
from collections import defaultdict
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

B = 128
K = 4
TRACE_DIR = "/tmp/r7ctrace"


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import crnn_fused_forward_from_wav

    cfg = compose(str(REPO / "configs"), "train",
                  ["model=crnn", "loss=accdoa",
                   "model.kwargs.pretrained_path=null",
                   "model.kwargs.audioset_pretrain=false"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    extractor = lambda w: fused_logmel_iv(w, split3=True)  # noqa: E731
    feats0 = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    base = jax.random.normal(jax.random.PRNGKey(7), (B, 4, 240000),
                             jnp.float32) * 0.1

    @jax.jit
    def step(v, w, k):
        def body(i, acc):
            out = crnn_fused_forward_from_wav(
                model, v, w, wav_scale=1.0 + 1e-4 * (k * K + i),
                pre_scale_head=True)
            return acc + out["accdoa"].astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    from bench import _wait_for_backend
    _wait_for_backend()
    _ = float(step(variables, base, jnp.int32(0)))
    print("compiled", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        for i in range(2):
            _ = float(step(variables, base, jnp.int32(i + 1)))

    paths = sorted(Path(TRACE_DIR).rglob("*.trace.json.gz"))
    assert paths, "no trace written"
    with gzip.open(paths[-1], "rt") as f:
        trace = json.load(f)
    events = trace["traceEvents"]
    dev_pids = {e["pid"] for e in events
                if e.get("ph") == "M" and e.get("name") == "process_name"
                and "TPU" in str(e.get("args", {}).get("name", ""))
                and "pjrt" not in str(e.get("args", {}).get("name", ""))}
    sums = defaultdict(float)
    for e in events:
        if e.get("ph") == "X" and e.get("pid") in dev_pids:
            sums[e["name"]] += e.get("dur", 0)
    total = sum(sums.values())
    n_steps = 2 * K
    print(f"device total {total/1000/n_steps:.2f} ms/step over {n_steps} steps",
          flush=True)
    conv = sum(d for n, d in sums.items() if "conv" in n.lower())
    print(f"conv-named ops: {conv/1000/n_steps:.2f} ms/step "
          f"({conv/max(total,1)*100:.0f}%)", flush=True)
    for name, dur in sorted(sums.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {dur/1000/n_steps:7.3f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
