#!/usr/bin/env python
"""Compare compile+run time of STFT frontend variants on the TPU."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))
os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")

import jax
import jax.numpy as jnp
import numpy as np

from pseldnets_tpu.ops.stft import stft, stft_dft, frame_signal, dft_matrices
from pseldnets_tpu.ops.windows import get_window

B = int(sys.argv[1]) if len(sys.argv) > 1 else 2
wav = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 240000), jnp.float32)


def gather_dft(x):
    """old gather-framing + einsum variant"""
    win = get_window("hann", 1024)
    wcos, wsin = dft_matrices(1024, win)
    frames = frame_signal(x, 1024, 240, True)
    re = jnp.einsum("...tn,nf->...tf", frames, jnp.asarray(wcos),
                    precision=jax.lax.Precision.HIGHEST)
    im = jnp.einsum("...tn,nf->...tf", frames, jnp.asarray(wsin),
                    precision=jax.lax.Precision.HIGHEST)
    return re, im


def bench(name, fn):
    f = jax.jit(fn)
    t0 = time.time()
    out = f(wav)
    jax.block_until_ready(out)
    compile_s = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = f(wav)
    jax.block_until_ready(out)
    print(f"{name}: compile {compile_s:.1f}s steady {(time.time()-t0)/5*1000:.2f}ms",
          flush=True)


bench("fft", lambda x: stft(x, 1024, 240, "hann"))
bench("gather_dft", gather_dft)
bench("conv_dft", lambda x: stft_dft(x, 1024, 240, "hann"))
