#!/usr/bin/env python
"""Probe R4B: A/B the exp2-folded softmax + post-PV-normalize attention
variant (swin_block attn_impl="exp2") against the exact softmax, full fused
HTSAT forward @B=128, fori K=32 per dispatch (quiet box only — CLAUDE.md).

Hypothesis: softmax exp is the Swin kernels' VPU hot spot (~30 ms of the
56 ms step); exp2 saves one multiply per score element and the post-PV
divide touches (N, hd=24) instead of (N, N=64) elements.
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
    from pseldnets_tpu.serving import htsat_fused_forward

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

    def make_step(impl):
        @jax.jit
        def step(v, w, k0):
            def body(i, acc):
                out = htsat_fused_forward(
                    model, v, extractor(w * (1.0 + 1e-4 * (k0 * K + i))),
                    attn_impl=impl)
                return acc + out["multi_accdoa"].astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return step

    # one-shot parity check on-chip (bf16 noise budget)
    f_exact = jax.jit(lambda v, w: htsat_fused_forward(
        model, v, w, attn_impl="exact")["multi_accdoa"])
    f_exp2 = jax.jit(lambda v, w: htsat_fused_forward(
        model, v, w, attn_impl="exp2")["multi_accdoa"])
    feats = extractor(base[:8])
    a = np.asarray(f_exact(variables, feats), np.float32)
    b = np.asarray(f_exp2(variables, feats), np.float32)
    print(f"exp2-vs-exact max dev on-chip: {np.abs(a - b).max():.2e}",
          flush=True)

    for impl in ("exact", "exp2", "exact"):
        step = make_step(impl)
        t0 = time.time()
        _ = float(step(variables, base, jnp.int32(0)))
        print(f"[{impl}] first (compile+run): {time.time() - t0:.1f}s",
              flush=True)
        ts = []
        for it in range(1, 4):
            t0 = time.time()
            _ = float(step(variables, base, jnp.int32(it)))
            ts.append((time.time() - t0) / K)
        ms = min(ts) * 1000
        print(f"[{impl}] steady: {ms:.2f} ms/batch "
              f"({B / min(ts) / 6.0:.1f} 1-min clips/s)", flush=True)


if __name__ == "__main__":
    main()
