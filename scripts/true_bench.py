#!/usr/bin/env python
"""Trustworthy TPU timing: vary the input every call and fetch a scalar from
the output, so the axon relay can't serve cached results and laziness can't
hide execution."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp


def true_bench(name, fn, make_input, iters=8):
    x = make_input(0)
    t0 = time.time()
    out = fn(x)
    _ = float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    compile_s = time.time() - t0
    # pre-generate inputs so host-side generation isn't timed
    xs = [make_input(i + 1) for i in range(iters)]
    for xi in xs:
        jax.block_until_ready(xi)
    t0 = time.perf_counter()
    acc = 0.0
    for xi in xs:
        out = fn(xi)
        acc += float(jax.tree_util.tree_leaves(out)[0].ravel()[0])
    dt = (time.perf_counter() - t0) / iters
    print(f"{name}: compile {compile_s:.1f}s steady {dt*1000:.2f}ms", flush=True)
    return dt


if __name__ == "__main__":
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.ops import LogmelIVExtractor
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
    cfg = {"data": {"sample_rate": 24000, "nfft": 1024, "n_mels": 64,
                    "hoplen": 240, "window": "hann"}}

    def mk(i):
        return jax.random.normal(jax.random.PRNGKey(i), (B, 4, 240000),
                                 jnp.float32) * 0.1

    exx = LogmelIVExtractor(cfg, backend="xla")
    true_bench("xla extractor", jax.jit(lambda w: exx(w)), mk)
    true_bench("pallas fused", jax.jit(lambda w: fused_logmel_iv(w)), mk)
