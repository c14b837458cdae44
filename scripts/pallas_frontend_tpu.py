#!/usr/bin/env python
"""Compile + verify + time the fused Pallas frontend on the real TPU."""

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

from pseldnets_tpu.ops import LogmelIVExtractor
from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
cfg = {"data": {"sample_rate": 24000, "nfft": 1024, "n_mels": 64,
                "hoplen": 240, "window": "hann"}}
x = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 240000), jnp.float32) * 0.1

t0 = time.time()
got = fused_logmel_iv(x)
jax.block_until_ready(got)
print(f"pallas compile+run: {time.time()-t0:.1f}s", flush=True)

ref = LogmelIVExtractor(cfg)(x)
jax.block_until_ready(ref)
err = float(jnp.max(jnp.abs(got - ref)))
print(f"max |pallas - xla| = {err:.2e}", flush=True)

for name, fn in (("pallas", lambda: fused_logmel_iv(x)),
                 ("xla", lambda: LogmelIVExtractor(cfg)(x))):
    out = fn(); jax.block_until_ready(out)
    t0 = time.perf_counter()
    for _ in range(20):
        out = fn()
    jax.block_until_ready(out)
    dt = (time.perf_counter() - t0) / 20
    print(f"{name}: {dt*1000:.2f} ms for {B}x10s clips", flush=True)
