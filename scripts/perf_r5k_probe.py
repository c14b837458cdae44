#!/usr/bin/env python
"""Probe R5K: softmax denominator riding the PV dot (sum_pv) A/B.

r5f put stage2's softmax at 0.73 ms/block (the largest named bucket in the
exp2 stages). sum_pv appends a zero-weight/bias-1 ones column per head to
the qkv v section, so the PV dot's lane hd IS sum(e) — the cross-lane sum
reduction disappears (the row max remains). exp2-only (stages 1-3).
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
ITERS = 3

STAGES = [
    ("stage1", 32, 32, 192, 8, 8, 4),
    ("stage2", 16, 16, 384, 16, 8, 4),
]


def main():
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas.swin_block import swin_block_fused

    rng = np.random.default_rng(0)
    for name, H, W, C, nh, w, shift in STAGES:
        L = H * W
        blk = SwinTransformerBlock(dim=C, input_resolution=(H, W),
                                   num_heads=nh, window_size=w,
                                   shift_size=shift)
        x0 = jnp.asarray(rng.standard_normal((B, L, C)).astype(np.float32)
                         * 0.5).astype(jnp.bfloat16)
        vs = jax.jit(lambda r, x: blk.init({"params": r}, x,
                                           deterministic=True))(
            jax.random.PRNGKey(0), x0)
        params = vs["params"]

        outs = {}
        for sp in (False, True):
            outs[sp] = jax.jit(lambda p, x, sp=sp: swin_block_fused(
                x, p, H=H, W=W, nh=nh, window=w, shift=shift,
                compute_dtype=jnp.bfloat16, attn_impl="exp2",
                sum_pv=sp, vmem_limit_mb=80))(params, x0)
        dev = float(jnp.max(jnp.abs(outs[True].astype(jnp.float32)
                                    - outs[False].astype(jnp.float32))))
        print(f"{name} sum_pv parity: {dev:.3e}", flush=True)

        for sp in (False, True):
            def step(p, x, kk, sp=sp):
                def body(i, acc):
                    y = swin_block_fused(
                        x * (1.0 + 1e-4 * (kk * K + i)).astype(x.dtype),
                        p, H=H, W=W, nh=nh, window=w, shift=shift,
                        compute_dtype=jnp.bfloat16, attn_impl="exp2",
                        sum_pv=sp, vmem_limit_mb=80)
                    return acc + y.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            jstep = jax.jit(step)
            _ = float(jstep(params, x0, jnp.int32(0)))
            t0 = time.perf_counter()
            for i in range(ITERS):
                _ = float(jstep(params, x0, jnp.int32(i + 1)))
            dt = (time.perf_counter() - t0) / (ITERS * K) * 1000
            print(f"{name} sum_pv={int(sp)}: {dt:.3f} ms/block", flush=True)


if __name__ == "__main__":
    main()
