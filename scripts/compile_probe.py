#!/usr/bin/env python
"""Find where HTSAT compile time goes: encoder stages vs head vs batch size."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "3")

import jax
import jax.numpy as jnp

from pseldnets_tpu.models.htsat import HTSATEncoder

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
DT = jnp.bfloat16 if (len(sys.argv) > 2 and sys.argv[2] == "bf16") else jnp.float32

feats = jax.random.normal(jax.random.PRNGKey(0), (B, 7, 1001, 64), jnp.float32)


def probe(name, depths, heads):
    enc = HTSATEncoder(in_chans=7, mel_bins=64, depths=depths, num_heads=heads,
                       drop_path_rate=0.0, dtype=DT)
    v = enc.init({"params": jax.random.PRNGKey(0)}, feats[:1], deterministic=True)
    f = jax.jit(lambda v, x: enc.apply(v, x, deterministic=True))
    t0 = time.time()
    out = f(v, feats)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = f(v, feats)
    jax.block_until_ready(out)
    print(f"{name}: compile {c:.1f}s steady {(time.time()-t0)/5*1000:.2f}ms",
          flush=True)


probe("stage1only (2 blocks @64x64)", (2,), (4,))
probe("stages12 (2+2)", (2, 2), (4, 8))
probe("stages123 (2+2+6)", (2, 2, 6), (4, 8, 16))
probe("full (2+2+6+2)", (2, 2, 6, 2), (4, 8, 16, 32))
