#!/usr/bin/env python
"""Probe R6C: ViT-kernel exp2+sum_pv+nomax softmax (PaSST serving) A/B.

Transplants the Swin kernel's measured softmax wins into the ViT block:
exp2 with the q-scale/log2(e) folded into the qkv params, the denominator
riding the PV dot (ones column), and no row-max subtraction. PaSST's
attention rows are N~1000 tokens — the (N, N) subtract + divide passes and
the two cross-lane reduces these remove are ~8x wider than Swin's NP=128
ones, so the expected relative win is larger. A/B at the bench_all
production shape (B=32, offline 10 s feats, fori K=32).
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import bench_all  # noqa: E402  (reuses _build + _k_time)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

B = 32
K = 32


def main():
    from pseldnets_tpu.serving import passt_fused_forward

    cfg, model = bench_all._build(["model=passt", "loss=multi_accdoa"])
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                              jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r, "patchout": r}, f, train=False))(
            jax.random.PRNGKey(0), feats[:2])
    jax.block_until_ready(feats)

    outs = {}
    for impl in ("exact", "exp2"):
        outs[impl] = jax.jit(lambda f, v, impl=impl: passt_fused_forward(
            model, v, f, attn_impl=impl)["multi_accdoa"])(feats, variables)
    dev = float(jnp.max(jnp.abs(outs["exp2"].astype(jnp.float32)
                                - outs["exact"].astype(jnp.float32))))
    print(f"passt exp2+sum_pv+nomax parity: {dev:.3e}", flush=True)

    for impl in ("exact", "exp2"):
        dt = bench_all._k_time(
            lambda k, f, v, impl=impl: passt_fused_forward(
                model, v, f * (1.0 + 1e-4 * k),
                attn_impl=impl)["multi_accdoa"].astype(jnp.float32).mean(),
            (feats, variables), K=K)
        print(f"passt attn_impl={impl}: {dt * 1000:.3f} ms/batch @B={B}",
              flush=True)


if __name__ == "__main__":
    main()
