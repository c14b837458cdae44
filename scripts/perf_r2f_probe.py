#!/usr/bin/env python
"""Probe F: mel-projection precision in the radix-2 split3 kernel.
HIGHEST costs 6 MXU passes on the (.., 257)@(257, 64) mel dots (~5 ms/batch
of the kernel's 29 ms); DEFAULT is 1 pass. Measures speed + end-to-end
accuracy of DEFAULT vs the f32 flat reference."""

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

    P = jax.lax.Precision
    for name, mp in (("mel HIGHEST", P.HIGHEST), ("mel DEFAULT", P.DEFAULT),
                     ("mel SPLIT3-fold", "split3")):
        k_amortized(
            f"radix2 split3 {name}",
            lambda k, b, m=mp: fused_logmel_iv(
                b * (1.0 + 1e-4 * k), split3=True, radix2=True,
                mel_precision=m).mean(),
            (base,))

    ref = jax.jit(lambda b: fused_logmel_iv(b, split3=False,
                                            radix2=False))(base[:8])
    got = jax.jit(lambda b: fused_logmel_iv(
        b, split3=True, radix2=True,
        mel_precision="split3"))(base[:8])
    print(f"mel-SPLIT3 parity vs f32 flat: logmel "
          f"{float(jnp.abs(got[:, :4] - ref[:, :4]).max()):.2e} dB, iv "
          f"{float(jnp.abs(got[:, 4:] - ref[:, 4:]).max()):.2e} "
          f"(model-side bf16 input rounding ~0.1 dB equivalent)", flush=True)


if __name__ == "__main__":
    main()
