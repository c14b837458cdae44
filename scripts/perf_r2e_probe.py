#!/usr/bin/env python
"""Probe E: frontend grid-granularity sweep for the radix-2 split3 kernel.
The kernel's time = MXU theory (~10 ms @B=128) + ~18 ms fixed — if the fixed
part is per-cell latency (1024 cells at t_blk=128), halving the cell count
should show it. Also probes an approximate-rsqrt IV normalization."""

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


def k_amortized(name, body, args, K=8, iters=4):
    @jax.jit
    def step(k0, *args):
        acc = jnp.float32(0)
        for i in range(K):
            acc = acc + body(k0 * K + i, *args)
        return acc

    t0 = time.time()
    _ = float(step(jnp.int32(0), *args))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(jnp.int32(i + 1), *args))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name}: compile {compile_s:.1f}s steady {dt*1000:.2f} ms",
          flush=True)
    return dt


def main():
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    results = {}
    for t_blk in (128, 256, 336, 512):
        try:
            results[t_blk] = k_amortized(
                f"radix2 split3 t_blk={t_blk}",
                lambda k, b, tb=t_blk: fused_logmel_iv(
                    b * (1.0 + 1e-4 * k), split3=True, radix2=True,
                    t_blk=tb).mean(),
                (base,))
        except Exception as e:  # VMEM overflow etc.
            print(f"t_blk={t_blk}: FAILED {type(e).__name__}", flush=True)
    best = min(results, key=results.get)
    print(f"best t_blk={best}: {results[best]*1000:.2f} ms "
          f"(128: {results.get(128, 0)*1000:.2f})", flush=True)

    # parity of the best variant vs flat f32
    ref = jax.jit(lambda b: fused_logmel_iv(b, split3=False,
                                            radix2=False))(base[:8])
    got = jax.jit(lambda b: fused_logmel_iv(b, split3=True, radix2=True,
                                            t_blk=best))(base[:8])
    print(f"t_blk={best} parity: logmel "
          f"{float(jnp.abs(got[:, :4] - ref[:, :4]).max()):.2e} dB, iv "
          f"{float(jnp.abs(got[:, 4:] - ref[:, 4:]).max()):.2e}", flush=True)


if __name__ == "__main__":
    main()
