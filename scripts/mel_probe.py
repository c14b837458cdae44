#!/usr/bin/env python
"""Probe mel-projection formulations on TPU to find one that is fast to run
AND fast to compile. Prints one line per variant; order cheapest-first so
partial output is informative."""

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

from pseldnets_tpu.ops.mel import mel_filterbank

B, C, T, F, M = 16, 4, 1001, 513, 64
power = jax.random.uniform(jax.random.PRNGKey(0), (B, C, T, F), jnp.float32)
mel = jnp.asarray(mel_filterbank(24000, 1024, M, fmin=20.0, fmax=12000.0,
                                 scale="htk", norm="slaney"), jnp.float32)
mel_pad = jnp.zeros((1024, 128), jnp.float32).at[:F, :M].set(mel)
power_pad = jnp.pad(power, ((0, 0), (0, 0), (0, 7), (0, 1024 - F)))


def bench(name, f, *args):
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.perf_counter()
    for _ in range(10):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile {c:.1f}s steady {(time.perf_counter()-t0)/10*1000:.2f}ms",
          flush=True)


# padded aligned einsum (K=1024, N=128)
bench("einsum_padded",
      jax.jit(lambda p: jnp.einsum("bctf,fm->bctm", p, mel_pad,
                                   precision=jax.lax.Precision.HIGHEST,
                                   preferred_element_type=jnp.float32)[..., :M]),
      power_pad)

# padded flat dot
bench("flatdot_padded",
      jax.jit(lambda p: jnp.dot(p.reshape(-1, 1024), mel_pad,
                                precision=jax.lax.Precision.HIGHEST,
                                preferred_element_type=jnp.float32)),
      power_pad)

# unpadded einsum DEFAULT (baseline from earlier probe: ~24ms)
bench("einsum_unpadded",
      jax.jit(lambda p: jnp.einsum("bctf,fm->bctm", p, mel,
                                   precision=jax.lax.Precision.DEFAULT,
                                   preferred_element_type=jnp.float32)),
      power)
