#!/usr/bin/env python
"""Frontend stage timing on TPU: conv-DFT alone, +power-mel, +IV, precisions,
and the fused Pallas kernel."""

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from pseldnets_tpu.ops import LogmelIVExtractor, mel_filterbank
from pseldnets_tpu.ops.stft import stft_dft, stft
from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 16
wav = jax.random.normal(jax.random.PRNGKey(0), (B, 4, 240000), jnp.float32) * 0.1
cfg = {"data": {"sample_rate": 24000, "nfft": 1024, "n_mels": 64,
                "hoplen": 240, "window": "hann"}}


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


bench("conv_dft(HIGHEST)", jax.jit(lambda w: stft_dft(w, 1024, 240, "hann")), wav)
bench("fft_stft", jax.jit(lambda w: stft(w, 1024, 240, "hann")), wav)

mel = jnp.asarray(mel_filterbank(24000, 1024, 64, fmin=20.0, fmax=12000.0,
                                 scale="htk", norm="slaney"), jnp.float32)


def logmel_only(w, prec):
    re, im = stft_dft(w, 1024, 240, "hann")
    p = re * re + im * im
    m = jnp.einsum("bctf,fm->bctm", p, mel, precision=prec,
                   preferred_element_type=jnp.float32)
    return 10.0 * jnp.log10(jnp.maximum(m, 1e-10))


bench("dft+mel(HIGHEST)",
      jax.jit(partial(logmel_only, prec=jax.lax.Precision.HIGHEST)), wav)
bench("dft+mel(DEFAULT)",
      jax.jit(partial(logmel_only, prec=jax.lax.Precision.DEFAULT)), wav)

ex = LogmelIVExtractor(cfg)
bench("full extractor", jax.jit(lambda w: ex(w)), wav)

exf = LogmelIVExtractor(cfg, use_fft=True)
bench("full extractor (fft)", jax.jit(lambda w: exf(w)), wav)

bench("pallas fused", jax.jit(lambda w: fused_logmel_iv(w)), wav)
err = float(jnp.max(jnp.abs(fused_logmel_iv(wav) - ex(wav))))
print(f"pallas vs xla max err: {err:.2e}", flush=True)
