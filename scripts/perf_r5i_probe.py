#!/usr/bin/env python
"""Probe R5I: window pairing (2 windows per scores/PV dot) A/B per stage.

r5h showed the stage-0 structural cost is the per-window tiny matmuls (the
partition transposes ablate to ~nothing). Pairing packs consecutive windows
into one (2N, 2N) scores dot — full 128-lane tiles, half the dot count —
with cross-window blocks killed by -1e5 in the block-diagonal bias table
(exp2 underflows to exactly 0: bit-equal math). Stage3 has nW=1 (no pairing
possible).
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

        # on-chip parity pair-vs-unpaired first
        outs = {}
        for pw in (False, True):
            outs[pw] = jax.jit(lambda p, x, pw=pw: swin_block_fused(
                x, p, H=H, W=W, nh=nh, window=w, shift=shift,
                compute_dtype=jnp.bfloat16, attn_impl="auto",
                pair_windows=pw))(params, x0)
        dev = float(jnp.max(jnp.abs(outs[True].astype(jnp.float32)
                                    - outs[False].astype(jnp.float32))))
        print(f"{name} pair parity: {dev:.3e}", flush=True)

        for pw in (False, True):
            def step(p, x, kk, pw=pw):
                def body(i, acc):
                    y = swin_block_fused(
                        x * (1.0 + 1e-4 * (kk * K + i)).astype(x.dtype),
                        p, H=H, W=W, nh=nh, window=w, shift=shift,
                        compute_dtype=jnp.bfloat16, attn_impl="auto",
                        pair_windows=pw)
                    return acc + y.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            jstep = jax.jit(step)
            try:
                jstep.lower(params, x0, jnp.int32(0)).compile()
            except Exception as e:
                print(f"{name} pair={pw}: COMPILE FAIL {str(e)[:200]}",
                      flush=True)
                continue
            _ = float(jstep(params, x0, jnp.int32(0)))
            t0 = time.perf_counter()
            for i in range(ITERS):
                _ = float(jstep(params, x0, jnp.int32(i + 1)))
            dt = (time.perf_counter() - t0) / (ITERS * K) * 1000
            print(f"{name} pair={int(pw)}: {dt:.3f} ms/block", flush=True)


if __name__ == "__main__":
    main()
