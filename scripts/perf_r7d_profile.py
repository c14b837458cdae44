#!/usr/bin/env python
"""Probe R7D (round 4): device-op profile of the passt_maccdoa bench step
(VERDICT #3 — 265.2 clips/s @B=128 exp2 vs the 300 bar; rough padded-MAC math
puts the fused ViT at ~16% MXU utilization, so the ceiling should live in
VPU chains / layout ops). Buckets the ~80.4 ms step by device op.

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
TRACE_DIR = "/tmp/r7dtrace"


def main():
    import bench_all
    from pseldnets_tpu.serving import passt_fused_forward

    cfg, model = bench_all._build(["model=passt", "loss=multi_accdoa"])
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                              jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r, "patchout": r}, f, train=False))(
            jax.random.PRNGKey(0), feats[:2])

    @jax.jit
    def step(v, f, k):
        def body(i, acc):
            out = passt_fused_forward(
                model, v, f * (1.0 + 1e-4 * (k * K + i)), attn_impl="exp2")
            return acc + out["multi_accdoa"].astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    from bench import _wait_for_backend
    _wait_for_backend()
    _ = float(step(variables, feats, jnp.int32(0)))
    print("compiled", flush=True)
    with jax.profiler.trace(TRACE_DIR):
        for i in range(2):
            _ = float(step(variables, feats, jnp.int32(i + 1)))

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
    fused = sum(d for n, d in sums.items()
                if "vit_block" in n.lower() or "custom" in n.lower())
    print(f"pallas vit_block kernels: {fused/1000/n_steps:.2f} ms/step "
          f"({fused/max(total,1)*100:.0f}%)", flush=True)
    for name, dur in sorted(sums.items(), key=lambda kv: -kv[1])[:45]:
        print(f"  {dur/1000/n_steps:7.3f} ms  {name[:110]}", flush=True)


if __name__ == "__main__":
    main()
