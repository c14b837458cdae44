#!/usr/bin/env python
"""Probe R3D: device-op profile of the CURRENT production bench step
(pack+rsqrt frontend + per-block fused HTSAT) — where do the 60 ms go?

Traces K=2 steps, parses the trace.json.gz (device pid, sum 'X' event
durations by op name), prints a grouped breakdown. Device-timeline
durations are immune to host contention (CLAUDE.md)."""

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
K = 2
TRACE_DIR = "/tmp/r3dtrace"


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    extractor = lambda w: fused_logmel_iv(w, split3=True)  # noqa: E731
    feats0 = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1

    @jax.jit
    def step(v, w, k):
        acc = jnp.float32(0)
        for i in range(K):
            out = htsat_fused_forward(
                model, v, extractor(w * (1.0 + 1e-4 * (k * K + i))))
            acc = acc + out["multi_accdoa"].astype(jnp.float32).mean()
        return acc

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
    # find the device pid
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
    for name, dur in sorted(sums.items(), key=lambda kv: -kv[1])[:25]:
        print(f"  {dur/1000/n_steps:7.3f} ms  {name[:100]}", flush=True)


if __name__ == "__main__":
    main()
