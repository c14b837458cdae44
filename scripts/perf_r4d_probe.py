#!/usr/bin/env python
"""Probe R4D: fused CRNN serving (serving/crnn.py) vs flax cnn14_accdoa.

Baseline (bench_all fori K=32): flax 104.98 ms/batch @B=128. Variants:
  flax            model.apply (re-measured for a same-session baseline)
  fused           crnn_fused_forward pool=slice, ffn_barrier=True
  fused_nobar     pool=slice, ffn_barrier=False
  fused_avgpool   pool=avg,   ffn_barrier=True

Plus a one-shot on-chip parity print (bf16 fused vs bf16 flax). Quiet box.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

B = 128
K = 32


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import crnn_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["model=crnn", "loss=accdoa",
                   "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    extractor = lambda w: fused_logmel_iv(w, split3=True)  # noqa: E731
    feats0 = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    # on-chip parity (single small batch)
    feats = extractor(base[:8])
    ref = np.asarray(jax.jit(lambda v, f: model.apply(v, f, train=False)
                             ["accdoa"])(variables, feats), np.float32)
    got = np.asarray(jax.jit(lambda v, f: crnn_fused_forward(
        model, v, f)["accdoa"])(variables, feats), np.float32)
    print(f"fused-vs-flax max dev on-chip: {np.abs(ref - got).max():.2e} "
          f"(scale {np.abs(ref).max():.3f})", flush=True)

    def k_time(body):
        @jax.jit
        def step(k0, w, v):
            return jax.lax.fori_loop(
                0, K, lambda i, acc: acc + body(k0 * K + i, w, v),
                jnp.float32(0))

        t0 = time.time()
        _ = float(step(jnp.int32(0), base, variables))
        cs = time.time() - t0
        ts = []
        for it in range(1, 4):
            t0 = time.time()
            _ = float(step(jnp.int32(it), base, variables))
            ts.append((time.time() - t0) / K)
        return min(ts), cs

    variants = {
        "flax": lambda k, w, v: model.apply(
            v, extractor(w * (1.0 + 1e-4 * k)),
            train=False)["accdoa"].astype(jnp.float32).mean(),
        "fused": lambda k, w, v: crnn_fused_forward(
            model, v, extractor(w * (1.0 + 1e-4 * k)))["accdoa"].astype(
                jnp.float32).mean(),
        "fused_nobar": lambda k, w, v: crnn_fused_forward(
            model, v, extractor(w * (1.0 + 1e-4 * k)),
            ffn_barrier=False)["accdoa"].astype(jnp.float32).mean(),
        "fused_avgpool": lambda k, w, v: crnn_fused_forward(
            model, v, extractor(w * (1.0 + 1e-4 * k)),
            pool="avg")["accdoa"].astype(jnp.float32).mean(),
    }
    for name, body in variants.items():
        dt, cs = k_time(body)
        print(f"[{name}] steady {dt * 1000:.2f} ms/batch = "
              f"{B / dt / 6.0:.1f} 1-min clips/s (compile {cs:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
