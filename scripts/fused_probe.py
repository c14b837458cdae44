#!/usr/bin/env python
"""Fused-serving vs flax HTSAT forward on the real chip (amortized dispatch)."""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from pseldnets_tpu.config import compose
from pseldnets_tpu.models import build_model
from pseldnets_tpu.serving import htsat_fused_forward

B, K, ITERS = 128, 4, 5
cfg = compose(str(REPO / "configs"), "train",
              ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
feats0 = jnp.zeros((2, 7, 1001, 64), jnp.float32)
variables = jax.jit(lambda r, f: model.init({"params": r}, f, train=False))(
    jax.random.PRNGKey(0), feats0)
feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                          jnp.float32) * 0.1


def bench(name, inner):
    def fn(base, k):
        acc = jnp.float32(0)
        for i in range(K):
            out = inner(base * (1.0 + 1e-4 * (k * K + i)))
            acc = acc + out["multi_accdoa"].astype(jnp.float32).mean()
        return acc
    jfn = jax.jit(fn)
    t0 = time.time()
    _ = float(jfn(feats, jnp.int32(0)))
    comp = time.time() - t0
    t0 = time.perf_counter()
    for i in range(ITERS):
        _ = float(jfn(feats, jnp.int32(i + 1)))
    ms = (time.perf_counter() - t0) / ITERS / K * 1000
    print(json.dumps({"variant": name, "B": B, "ms_per_batch": round(ms, 2),
                      "compile_s": round(comp, 1)}), flush=True)


bench("fused_serving_bf16",
      lambda f: htsat_fused_forward(model, variables, f))
bench("flax_apply_bf16",
      lambda f: model.apply(variables, f, train=False))

# numeric check on-device (bf16 both paths)
a = model.apply(variables, feats[:8], train=False)["multi_accdoa"]
b = htsat_fused_forward(model, variables, feats[:8])["multi_accdoa"]
d = float(jnp.abs(a.astype(jnp.float32) - b.astype(jnp.float32)).max())
print(json.dumps({"bf16_max_abs_diff": round(d, 6)}), flush=True)
