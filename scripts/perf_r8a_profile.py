#!/usr/bin/env python
"""Probe R8A (round 4): device-op timeline of the CURRENT headline bench step
(485.6 clips/s = 44.45 ms/batch @B=128, wav_scale riding the reflect head).

The frontend prep (~10 ms row-slab pad/reshape) and decimation transpose
(~4.5 ms) numbers in PERF.md's open-lever list were measured in the round-3
configuration; this re-buckets the step as it ships today so the next lever
is picked against current reality, not stale numbers.

Device-timeline durations are contention-immune (CLAUDE.md); only wall
numbers need a quiet box.
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
TRACE_DIR = "/tmp/r8atrace"


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward_from_wav

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats = fused_logmel_iv(jnp.zeros((2, 4, 240000), jnp.float32),
                            split3=True)
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats)
    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1

    @jax.jit
    def step(v, w, k):
        def body(i, acc):
            out = htsat_fused_forward_from_wav(
                model, v, w, wav_scale=1.0 + 1e-4 * (k * K + i),
                pre_scale_head=True, split3=True)
            return acc + out["multi_accdoa"].astype(jnp.float32).mean()
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
    n_steps = 2 * K
    # the jit_step/while wrappers double-count their children; drop them
    inner = {n: d for n, d in sums.items()
             if not n.startswith("jit_step") and not n.startswith("while")}
    total = sum(inner.values())
    print(f"device total {total/1000/n_steps:.2f} ms/step over {n_steps} steps",
          flush=True)
    for name, dur in sorted(inner.items(), key=lambda kv: -kv[1])[:50]:
        print(f"  {dur/1000/n_steps:7.3f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
