#!/usr/bin/env python
"""Probe R3G: fori-harness K sweep on the full fused serving step.

R3F showed fori K=16 within ~1% of the unrolled-K=16 headline at 1/20th
the compile cost. Higher K shrinks the ~25 ms relay-RTT share per batch;
this sweep picks the K for a fori-based bench.py."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
from jax import lax

B = 128


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats0 = fused_logmel_iv(jnp.zeros((2, 4, 240000), jnp.float32),
                             split3=True)
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    def full(i, v, w):
        out = htsat_fused_forward(
            model, v, fused_logmel_iv(w * (1.0 + 1e-4 * i), split3=True))
        return out["multi_accdoa"].astype(jnp.float32).mean()

    for K in (32, 64):
        @jax.jit
        def step(k0, v, w, K=K):
            return lax.fori_loop(
                0, K, lambda i, acc: acc + full(k0 * K + i, v, w),
                jnp.float32(0))

        t0 = time.time()
        _ = float(step(jnp.int32(0), variables, base))
        cs = time.time() - t0
        iters = 3
        t0 = time.perf_counter()
        for i in range(iters):
            _ = float(step(jnp.int32(i + 1), variables, base))
        dt = (time.perf_counter() - t0) / (iters * K)
        print(f"full fori K={K}: compile {cs:.1f}s steady {dt*1000:.2f} "
              f"ms/batch = {B/dt/6:.1f} clips/s", flush=True)


if __name__ == "__main__":
    main()
