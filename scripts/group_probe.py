#!/usr/bin/env python
"""Grouped-cell fused serving + frontend t_blk sweep on the real chip."""
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
from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
from pseldnets_tpu.serving import htsat_fused_forward

B, K, ITERS = 128, 4, 5
cfg = compose(str(REPO / "configs"), "train",
              ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
variables = jax.jit(lambda r, f: model.init({"params": r}, f, train=False))(
    jax.random.PRNGKey(0), jnp.zeros((2, 7, 1001, 64), jnp.float32))
feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                          jnp.float32) * 0.1
wav = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 240000),
                        jnp.float32) * 0.1


def bench(name, inner, base):
    def fn(base, k):
        acc = jnp.float32(0)
        for i in range(K):
            acc = acc + inner(base * (1.0 + 1e-4 * (k * K + i)))
        return acc
    jfn = jax.jit(fn)
    try:
        t0 = time.time()
        _ = float(jfn(base, jnp.int32(0)))
        comp = time.time() - t0
        t0 = time.perf_counter()
        for i in range(ITERS):
            _ = float(jfn(base, jnp.int32(i + 1)))
        ms = (time.perf_counter() - t0) / ITERS / K * 1000
        print(json.dumps({"variant": name, "B": B, "ms": round(ms, 2),
                          "compile_s": round(comp, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)


bench("fused_serving_grouped",
      lambda f: htsat_fused_forward(model, variables, f)["multi_accdoa"]
      .astype(jnp.float32).mean(), feats)
for tb in (256, 512):
    bench(f"frontend_split3_tblk{tb}",
          lambda w, t=tb: fused_logmel_iv(w, split3=True, t_blk=t).mean(), wav)
