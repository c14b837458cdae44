#!/usr/bin/env python
"""Probe R5H: how much of the stage-0 block is window partition/reverse?

r5f bucketed stage0 as 0.94 GELU + 0.77 LN + 0.85 softmax + 3.9 structural
(and r5g showed it is NOT grid-dispatch-bound: G=2 vs G=4 is a wash). The
remaining suspects are the partition/reverse 6-D transposes (+ roll on
shifted blocks) and the dots. "winpart" in swin_block._ABLATE replaces the
partition with a contiguous-row view (wrong outputs, same dot shapes).
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

ABLATIONS = [set(), {"winpart"}, {"winpart", "gelu", "ln", "softmax"}]


def main():
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas import swin_block as sb

    rng = np.random.default_rng(0)
    for name, H, W, C, nh, w, shift in [("stage0/s0", 64, 64, 96, 4, 8, 0),
                                        ("stage0/s4", 64, 64, 96, 4, 8, 4)]:
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
        base = None
        for ab in ABLATIONS:
            sb._ABLATE = set(ab)
            try:
                def step(p, x, kk):
                    def body(i, acc):
                        y = sb.swin_block_fused(
                            x * (1.0 + 1e-4 * (kk * K + i)).astype(x.dtype),
                            p, H=H, W=W, nh=nh, window=w, shift=shift,
                            compute_dtype=jnp.bfloat16, attn_impl="auto")
                        return acc + y.astype(jnp.float32).mean()
                    return jax.lax.fori_loop(0, K, body, jnp.float32(0))

                jstep = jax.jit(step)
                _ = float(jstep(params, x0, jnp.int32(0)))
                t0 = time.perf_counter()
                for i in range(ITERS):
                    _ = float(jstep(params, x0, jnp.int32(i + 1)))
                dt = (time.perf_counter() - t0) / (ITERS * K) * 1000
                lbl = "+".join(sorted(ab)) or "baseline"
                if not ab:
                    base = dt
                delta = f"  (-{base - dt:.3f})" if ab and base else ""
                print(f"{name} {lbl:<26} {dt:.3f} ms/block{delta}",
                      flush=True)
            finally:
                sb._ABLATE = set()


if __name__ == "__main__":
    main()
