#!/usr/bin/env python
"""Probe 2: head pieces — scalar BN, tscam, bilinear interpolate, full head,
head+extractor — to find the slow-compile stage."""

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

from pseldnets_tpu.models import heads
from pseldnets_tpu.models.common import interpolate
from pseldnets_tpu.ops import make_extractor
from pseldnets_tpu.config import compose

B = int(sys.argv[1]) if len(sys.argv) > 1 else 4
feats = jax.random.normal(jax.random.PRNGKey(0), (B, 7, 1001, 64), jnp.float32)
wav = jax.random.normal(jax.random.PRNGKey(1), (B, 4, 240000), jnp.float32)


def bench(name, f, *args):
    t0 = time.time()
    out = f(*args)
    jax.block_until_ready(out)
    c = time.time() - t0
    t0 = time.time()
    for _ in range(5):
        out = f(*args)
    jax.block_until_ready(out)
    print(f"{name}: compile {c:.1f}s steady {(time.time()-t0)/5*1000:.2f}ms",
          flush=True)


# bilinear interpolate alone
x32 = jax.random.normal(jax.random.PRNGKey(2), (B, 32, 507), jnp.float32)
bench("interp_bilinear", jax.jit(lambda x: interpolate(x, 32, "bilinear")), x32)

# full head (bf16)
model = heads.HTSAT(num_classes=13, in_channels=7, mel_bins=64, pred_res=10,
                    num_tracks=3, encoder_kwargs=(
                        ("depths", (2, 2, 6, 2)), ("num_heads", (4, 8, 16, 32)),
                        ("spec_size", 256), ("patch_size", 4),
                        ("patch_stride", (4, 4)), ("embed_dim", 96),
                        ("window_size", 8), ("mlp_ratio", 4.0),
                        ("drop_path_rate", 0.1)),
                    dtype=jnp.bfloat16)
v = model.init({"params": jax.random.PRNGKey(0)}, feats[:1], train=False)
bench("full_head", jax.jit(lambda v, x: model.apply(v, x, train=False)), v, feats)

# extractor + head in one jit
cfg = compose(str(REPO / "configs"), "train", [])
ex = make_extractor(cfg)
bench("extractor+head",
      jax.jit(lambda v, w: model.apply(v, ex(w), train=False)), v, wav)
