#!/usr/bin/env python
"""Probe R4F: glue-fold A/B on the flagship step (B=128, fori K=32, quiet).

The r4e device profile put ~3.2 ms/batch of XLA glue around the kernels:
1.49 ms harness wav-scaling (multiply_add_fusion), 1.00 ms ScalarBN over the
features (fusion.206), 0.71 ms slice-then-re-pad (pad.220). Variants:

  baseline   extractor(w*s + o) -> htsat_fused_forward      (current bench.py)
  folded     htsat_fused_forward_from_wav(w, wav_scale=s)   (all three folded)

Plus a one-shot on-chip parity print (both bf16).
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
import numpy as np

B = 128
K = 32


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import (htsat_fused_forward,
                                       htsat_fused_forward_from_wav)

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    extractor = lambda w: fused_logmel_iv(w, split3=True)  # noqa: E731
    feats0 = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    # on-chip parity (single small batch, scale via the two routes)
    ref = np.asarray(jax.jit(lambda v, w: htsat_fused_forward(
        model, v, extractor(w * 1.001))["multi_accdoa"])(
            variables, base[:8]), np.float32)
    got = np.asarray(jax.jit(lambda v, w: htsat_fused_forward_from_wav(
        model, v, w, wav_scale=jnp.float32(1.001))["multi_accdoa"])(
            variables, base[:8]), np.float32)
    print(f"folded-vs-baseline max dev on-chip: {np.abs(ref - got).max():.2e}"
          f" (scale {np.abs(ref).max():.3f})", flush=True)

    def k_time(body):
        @jax.jit
        def step(k0, w, v):
            return jax.lax.fori_loop(
                0, K, lambda i, acc: acc + body(k0 * K + i, w, v),
                jnp.float32(0))

        t0 = time.time()
        _ = float(step(jnp.int32(0), base, variables))
        cs = time.time() - t0
        ts = []
        for it in range(1, 4):
            t0 = time.time()
            _ = float(step(jnp.int32(it), base, variables))
            ts.append((time.time() - t0) / K)
        return min(ts), cs

    variants = {
        "baseline": lambda k, w, v: htsat_fused_forward(
            model, v, extractor(w * (1.0 + 1e-4 * k) + 1e-5 * k))
            ["multi_accdoa"].astype(jnp.float32).mean(),
        "folded": lambda k, w, v: htsat_fused_forward_from_wav(
            model, v, w, wav_scale=1.0 + 1e-4 * k)
            ["multi_accdoa"].astype(jnp.float32).mean(),
    }
    for name, body in variants.items():
        dt, cs = k_time(body)
        print(f"[{name}] steady {dt * 1000:.2f} ms/batch = "
              f"{B / dt / 6.0:.1f} 1-min clips/s (compile {cs:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
