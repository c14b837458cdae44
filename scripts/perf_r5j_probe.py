#!/usr/bin/env python
"""Probe R5J: bf16 hidden MLP activations (hidden_cd=True) A/B per stage.

The r5f ablations leave multi-ms structural cost in the fused Swin blocks
spread across dtype converts and VMEM traffic; the MLP's f32 hidden
(4C-wide) is the single biggest convert+traffic surface. hidden_cd stores
the fc1 output in compute dtype (f32 MXU accumulation is unchanged — only
the STORED pre-activations round to bf16 before the GELU, one extra
rounding under the serving parity band).
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
    ("stage0", 64, 64, 96, 4, 8, 4),
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
        for hc in (False, True):
            outs[hc] = jax.jit(lambda p, x, hc=hc: swin_block_fused(
                x, p, H=H, W=W, nh=nh, window=w, shift=shift,
                compute_dtype=jnp.bfloat16, attn_impl="auto",
                hidden_cd=hc))(params, x0)
        dev = float(jnp.max(jnp.abs(outs[True].astype(jnp.float32)
                                    - outs[False].astype(jnp.float32))))
        sc = float(jnp.max(jnp.abs(outs[False].astype(jnp.float32))))
        print(f"{name} hidden_cd parity: {dev:.3e} at scale {sc:.2f}",
              flush=True)

        for hc in (False, True):
            def step(p, x, kk, hc=hc):
                def body(i, acc):
                    y = swin_block_fused(
                        x * (1.0 + 1e-4 * (kk * K + i)).astype(x.dtype),
                        p, H=H, W=W, nh=nh, window=w, shift=shift,
                        compute_dtype=jnp.bfloat16, attn_impl="auto",
                        hidden_cd=hc)
                    return acc + y.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            jstep = jax.jit(step)
            _ = float(jstep(params, x0, jnp.int32(0)))
            t0 = time.perf_counter()
            for i in range(ITERS):
                _ = float(jstep(params, x0, jnp.int32(i + 1)))
            dt = (time.perf_counter() - t0) / (ITERS * K) * 1000
            print(f"{name} hidden_cd={int(hc)}: {dt:.3f} ms/block",
                  flush=True)


if __name__ == "__main__":
    main()
