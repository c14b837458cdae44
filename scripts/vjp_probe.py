#!/usr/bin/env python
"""Fused-VJP Swin block vs flax: fwd+bwd timing on the real chip (stage-0
production shape), plus grad agreement."""
import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from pseldnets_tpu.models.htsat import SwinTransformerBlock
from pseldnets_tpu.ops.pallas.swin_block_vjp import swin_block_train

H = W = 64
C, NH, WIN = 96, 4, 8
B, K, ITERS = 128, 4, 5

blk = SwinTransformerBlock(dim=C, input_resolution=(H, W), num_heads=NH,
                           window_size=WIN, shift_size=4, dtype=jnp.bfloat16)
x0 = jnp.zeros((2, H * W, C), jnp.bfloat16)
vs = jax.jit(lambda r, x: blk.init(r, x))(jax.random.PRNGKey(0), x0)
params = vs["params"]
x = (jax.random.normal(jax.random.PRNGKey(1), (B, H * W, C), jnp.float32)
     * 0.1).astype(jnp.bfloat16)
masks = jnp.ones((B, 2), jnp.float32)


def bench(name, loss_fn):
    def step(p, x, k):
        acc = jnp.float32(0)
        tree = None
        for i in range(K):
            g = jax.grad(loss_fn)(p, x * (1.0 + 1e-3 * (k * K + i)))
            leaf = jax.tree_util.tree_leaves(g)[0]
            acc = acc + leaf.astype(jnp.float32).ravel()[0]
        return acc
    jfn = jax.jit(step)
    try:
        t0 = time.time()
        _ = float(jfn(params, x, jnp.int32(0)))
        comp = time.time() - t0
        t0 = time.perf_counter()
        for i in range(ITERS):
            _ = float(jfn(params, x, jnp.int32(i + 1)))
        ms = (time.perf_counter() - t0) / ITERS / K * 1000
        print(json.dumps({"variant": name, "B": B, "ms_fwd_bwd": round(ms, 2),
                          "compile_s": round(comp, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:300]}), flush=True)


bench("fused_vjp_block",
      lambda p, x: jnp.sum(swin_block_train(
          x, p, masks, H, W, NH, WIN, 4, jnp.bfloat16, False)
          .astype(jnp.float32) ** 2))
bench("flax_block",
      lambda p, x: jnp.sum(blk.apply({"params": p}, x)
                           .astype(jnp.float32) ** 2))

# on-chip grad agreement (bf16 both)
g1 = jax.jit(jax.grad(lambda p: jnp.sum(swin_block_train(
    x[:8], p, masks[:8], H, W, NH, WIN, 4, jnp.bfloat16, False)
    .astype(jnp.float32) ** 2)))(params)
g2 = jax.jit(jax.grad(lambda p: jnp.sum(blk.apply({"params": p}, x[:8])
                                        .astype(jnp.float32) ** 2)))(params)
import numpy as np

rel = []
import flax

f1 = flax.traverse_util.flatten_dict(g1)
f2 = flax.traverse_util.flatten_dict(g2)
for kk in f1:
    a, b = np.asarray(f1[kk], np.float64), np.asarray(f2[kk], np.float64)
    rel.append(float(np.abs(a - b).max() / (np.abs(b).max() + 1e-9)))
print(json.dumps({"max_rel_grad_diff_vs_flax_bf16": round(max(rel), 5)}),
      flush=True)
