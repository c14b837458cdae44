#!/usr/bin/env python
"""Probe R3I: radix-2 DIF frontend (elementwise prep + exact freq-domain
window) vs the production DIT default, on-chip @B=128, fori K=32.

Motivation (docs/PERF.md round 3): the DIT invocation wall is ~25.4 ms of
which ~9 ms is XLA prep outside the kernel — ~4.5 ms of it the even/odd
decimation interleave-transpose. DIF prep is a fused elementwise add/sub
(y± = padded[p] ± padded[p+512]) with a straight reshape, so the transpose
vanishes; the kernel pays instead a few VPU lane-shifts for the 3-tap
frequency-domain Hann. Parity pinned in tests/test_pallas_frontend.py
(interpret, 2.6e-4 dB split3); this probe records the on-chip A/B + dev.
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
K = 32


def measure(name, step, args, iters=4):
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


def fori(fn):
    @jax.jit
    def step(k0, *args):
        def body(i, acc):
            return acc + fn(k0 * K + i, *args)
        return lax.fori_loop(0, K, body, jnp.float32(0))
    return step


def main():
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    def fe(variant):
        def f(i, w):
            return fused_logmel_iv(w * (1.0 + 1e-4 * i), split3=True,
                                   variant=variant
                                   ).astype(jnp.float32).mean()
        return f

    # warm the chip claim on something tiny first (discard-first rule)
    print("claiming chip...", flush=True)
    jax.block_until_ready(jnp.zeros((8, 128)) @ jnp.zeros((128, 8)))
    print("chip claimed", flush=True)

    # on-chip parity first (single dispatch each)
    small = base[:8]
    a = jax.jit(lambda w: fused_logmel_iv(w, split3=True))(small)
    b = jax.jit(lambda w: fused_logmel_iv(w, split3=True, variant="dif")
                )(small)
    dev_lm = float(jnp.max(jnp.abs(a[:, :4] - b[:, :4])))
    dev_iv = float(jnp.max(jnp.abs(a[:, 4:] - b[:, 4:])))
    print(f"on-chip DIT-vs-DIF dev: logmel {dev_lm:.2e} dB, IV {dev_iv:.2e}",
          flush=True)

    d_dit = measure("frontend DIT (prod) K=32", fori(fe("dit")), (base,))
    d_dif = measure("frontend DIF       K=32", fori(fe("dif")), (base,))
    # re-run DIT to catch drift/ordering effects
    d_dit2 = measure("frontend DIT rerun K=32", fori(fe("dit")), (base,))
    print(f"ratio DIF vs best-DIT: "
          f"{d_dif / min(d_dit, d_dit2):.3f}", flush=True)


if __name__ == "__main__":
    main()
