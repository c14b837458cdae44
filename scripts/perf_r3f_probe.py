#!/usr/bin/env python
"""Probe R3F: K-unrolled bench harness vs lax.fori_loop harness.

The K-unrolled outer jit exists only to amortize the dev relay's ~25 ms
per-dispatch RTT, but its compile cost scales with K (K=16 fused HTSAT
~24 min; PaSST K>=4 now SIGKILLs the compile helper — PERF.md round 3).
A fori_loop body compiles ONCE regardless of K. If steady-state ms/batch
matches the unrolled harness, every bench entry point can switch to fori:
~K-fold compile savings and PaSST measurable at full amortization.

Risk checked here: while_loop serializes iterations (no cross-iteration
pipelining), which could make fori read slower than unrolled.
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
from jax import lax

B = 128


def measure(name, step, args, K, iters=4):
    t0 = time.time()
    _ = float(step(jnp.int32(0), *args))
    cs = time.time() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(jnp.int32(i + 1), *args))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name}: compile {cs:.1f}s steady {dt*1000:.2f} ms/batch",
          flush=True)
    return dt


def harnesses(fn, K):
    """Return (unrolled, fori) jitted steps: acc over K varied inputs."""

    @jax.jit
    def unrolled(k0, *args):
        acc = jnp.float32(0)
        for i in range(K):
            acc = acc + fn(k0 * K + i, *args)
        return acc

    @jax.jit
    def fori(k0, *args):
        def body(i, acc):
            return acc + fn(k0 * K + i, *args)
        return lax.fori_loop(0, K, body, jnp.float32(0))

    return unrolled, fori


def main():
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    def fe(i, w):
        return fused_logmel_iv(w * (1.0 + 1e-4 * i),
                               split3=True).astype(jnp.float32).mean()

    un8, fo8 = harnesses(fe, 8)
    measure("frontend unrolled K=8", un8, (base,), 8)
    measure("frontend fori K=8", fo8, (base,), 8)
    _, fo32 = harnesses(fe, 32)
    measure("frontend fori K=32", fo32, (base,), 32)

    # full fused serving step
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.serving import htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats0 = fused_logmel_iv(jnp.zeros((2, 4, 240000), jnp.float32),
                             split3=True)
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)

    def full(i, v, w):
        out = htsat_fused_forward(
            model, v, fused_logmel_iv(w * (1.0 + 1e-4 * i), split3=True))
        return out["multi_accdoa"].astype(jnp.float32).mean()

    _, fullfo16 = harnesses(full, 16)
    dt = measure("full step fori K=16", fullfo16, (variables, base), 16)
    print(f"  = {B/dt/6:.1f} 1-min clips/s", flush=True)
    fullun4, _ = harnesses(full, 4)
    dt = measure("full step unrolled K=4", fullun4, (variables, base), 4)
    print(f"  = {B/dt/6:.1f} 1-min clips/s", flush=True)


if __name__ == "__main__":
    main()
