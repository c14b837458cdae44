#!/usr/bin/env python
"""Round-2 probe D: the FULL bench step with radix-2 split3 frontend +
poly-GELU Swin kernels (fast LN/softmax reverted — measured slower).
Also updates the fused-fwd sanity number at K=8."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

B = 128


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    extractor = lambda w: fused_logmel_iv(w, split3=True)  # noqa: E731

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)
    feats0 = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    variables = jax.jit(
        lambda r, f: model.init({"params": r}, f, train=False)
    )(jax.random.PRNGKey(0), feats0)

    # sanity: fused fwd K=8 after revert (expect ~38-40 ms)
    fbase = jax.jit(extractor)(base)
    jax.block_until_ready(fbase)
    K8 = 8

    @jax.jit
    def fwd8(k0, f):
        acc = jnp.float32(0)
        for i in range(K8):
            acc = acc + htsat_fused_forward(
                model, variables,
                f * (1.0 + 1e-4 * (k0 * K8 + i)))["multi_accdoa"].astype(
                    jnp.float32).mean()
        return acc

    t0 = time.time()
    _ = float(fwd8(jnp.int32(0), fbase))
    print(f"fused fwd (reverted) compile {time.time()-t0:.0f}s", flush=True)
    t0 = time.perf_counter()
    for i in range(4):
        _ = float(fwd8(jnp.int32(i + 1), fbase))
    dt = (time.perf_counter() - t0) / (4 * K8)
    print(f"fused fwd (reverted): {dt*1000:.2f} ms (probe-A: 38.05)",
          flush=True)
    del fbase

    K = 16

    @jax.jit
    def step(variables, base, k):
        acc = jnp.float32(0)
        for i in range(K):
            wav = base * (1.0 + 1e-4 * (k * K + i)) + 1e-5 * (k * K + i)
            out = htsat_fused_forward(model, variables, extractor(wav))
            acc = acc + out["multi_accdoa"].astype(jnp.float32).mean()
        return acc

    t0 = time.time()
    _ = float(step(variables, base, jnp.int32(0)))
    print(f"full-step compile {time.time()-t0:.0f}s", flush=True)
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(variables, base, jnp.int32(i + 1)))
    dt = (time.perf_counter() - t0) / (iters * K)
    clips = (B / dt) / 6.0
    print(f"FULL STEP: {dt*1000:.2f} ms/batch -> {clips:.1f} clips/s "
          f"(round-1: 293; target 300+)", flush=True)


if __name__ == "__main__":
    main()
