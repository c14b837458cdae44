#!/usr/bin/env python
"""Probe R3B: frontend VPU levers on-chip (docs/PERF.md round-3 item 2).

A/B at B=128, K=8: radix2-split3 baseline vs lane-packed halves (pack=True)
and rsqrt IV normalization, in one process. Prints per-config steady ms and
max deviation vs the baseline kernel."""

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
K = 8


def k_time(name, fn, base, iters=4):
    @jax.jit
    def step(k0, w):
        acc = jnp.float32(0)
        for i in range(K):
            acc = acc + fn(w * (1.0 + 1e-4 * (k0 * K + i))).astype(
                jnp.float32).mean()
        return acc

    t0 = time.time()
    _ = float(step(jnp.int32(0), base))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(jnp.int32(i + 1), base))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name}: compile {compile_s:.1f}s steady {dt*1000:.2f} ms",
          flush=True)
    return dt


def main():
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    variants = [
        ("baseline r2-split3", dict(split3=True)),
        ("pack", dict(split3=True, pack=True)),
        ("rsqrt", dict(split3=True, iv_norm="rsqrt")),
        ("pack+rsqrt", dict(split3=True, pack=True, iv_norm="rsqrt")),
    ]
    times = {}
    for name, kw in variants:
        times[name] = k_time(name, lambda w, kw=kw: fused_logmel_iv(w, **kw),
                             base)
    ref = jax.jit(lambda w: fused_logmel_iv(w, split3=True))(base[:4])
    for name, kw in variants[1:]:
        got = jax.jit(lambda w, kw=kw: fused_logmel_iv(w, **kw))(base[:4])
        dev_mel = float(jnp.abs(got[:, :4] - ref[:, :4]).max())
        dev_iv = float(jnp.abs(got[:, 4:] - ref[:, 4:]).max())
        print(f"{name}: dev vs baseline logmel {dev_mel:.2e} dB, "
              f"IV {dev_iv:.2e}", flush=True)
    best = min(times, key=times.get)
    print(f"BEST: {best} ({times[best]*1000:.2f} ms vs baseline "
          f"{times['baseline r2-split3']*1000:.2f} ms)", flush=True)


if __name__ == "__main__":
    main()
