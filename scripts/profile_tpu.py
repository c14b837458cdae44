#!/usr/bin/env python
"""One-shot TPU profiling: frontend / backbone / combined timings at several
batch sizes and dtypes. Run on the real chip; prints a JSON summary."""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       str(REPO / ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


import jax
import jax.numpy as jnp

from pseldnets_tpu.config import compose
from pseldnets_tpu.models import build_model
from pseldnets_tpu.ops import make_extractor


def timeit(f, *args, iters=10):
    out = f(*args)
    jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = f(*args)
    jax.block_until_ready(out)
    return (time.perf_counter() - t0) / iters


def main():
    results = {}
    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    ex = make_extractor(cfg)
    B = int(sys.argv[1]) if len(sys.argv) > 1 else 16

    wav = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 240000), jnp.float32) * 0.1

    t0 = time.time()
    frontend = jax.jit(lambda w: ex(w))
    dt = timeit(frontend, wav)
    results["frontend_compile_s"] = round(time.time() - t0 - dt * 10, 1)
    results["frontend_ms"] = round(dt * 1000, 2)

    feats = frontend(wav)
    for dtype_name, dtype in (("bf16", jnp.bfloat16), ("f32", jnp.float32)):
        model, _ = build_model(cfg, 13, dtype=dtype)
        variables = model.init({"params": jax.random.PRNGKey(0)}, feats[:2],
                               train=False)
        step = jax.jit(lambda v, f: model.apply(v, f, train=False))
        t0 = time.time()
        dt = timeit(step, variables, feats)
        results[f"model_{dtype_name}_compile_s"] = round(time.time() - t0 - dt * 10, 1)
        results[f"model_{dtype_name}_ms"] = round(dt * 1000, 2)

        full = jax.jit(lambda v, w: model.apply(v, ex(w), train=False))
        dt = timeit(full, variables, wav)
        results[f"full_{dtype_name}_ms"] = round(dt * 1000, 2)
        results[f"full_{dtype_name}_clips_per_s"] = round(B * 10 / dt / 60, 2)

    results["batch"] = B
    print(json.dumps(results))


if __name__ == "__main__":
    main()
