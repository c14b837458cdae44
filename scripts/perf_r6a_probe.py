#!/usr/bin/env python
"""Probe R6A: exp2-at-bf16 softmax A/B (exp_bf16 knob).

After sum_pv (r5k) the exp2 stages' remaining softmax cost is the row max,
the subtract, and the exp2 itself; the e is consumed by the PV dot at bf16
either way. exp_bf16 moves the f32->bf16 cast BEFORE the exp2 so the
transcendental runs at bf16 — a win only if Mosaic's bf16 exp2 is actually
cheaper than f32 exp2 (it may just upcast). Parity budget: e already rides
the PV dot at bf16, so the extra error is one rounding of (s-m) — expect
the usual ~3e-2 bf16 band.

Covers the three serving attention sites: stage0 headdot (nh=4), stage1/2
exp2+sum_pv.
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

# (name, H, W, C, nh, window, shift, attn_impl)
STAGES = [
    ("stage0", 64, 64, 96, 4, 8, 4, "headdot"),
    ("stage1", 32, 32, 192, 8, 8, 4, "exp2"),
    ("stage2", 16, 16, 384, 16, 8, 4, "exp2"),
]


def main():
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas.swin_block import swin_block_fused

    rng = np.random.default_rng(0)
    for name, H, W, C, nh, w, shift, impl in STAGES:
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
        for eb in (False, True):
            outs[eb] = jax.jit(lambda p, x, eb=eb: swin_block_fused(
                x, p, H=H, W=W, nh=nh, window=w, shift=shift,
                compute_dtype=jnp.bfloat16, attn_impl=impl,
                exp_bf16=eb, vmem_limit_mb=80))(params, x0)
        dev = float(jnp.max(jnp.abs(outs[True].astype(jnp.float32)
                                    - outs[False].astype(jnp.float32))))
        print(f"{name}[{impl}] exp_bf16 parity: {dev:.3e}", flush=True)

        for eb in (False, True):
            def step(p, x, kk, eb=eb):
                def body(i, acc):
                    y = swin_block_fused(
                        x * (1.0 + 1e-4 * (kk * K + i)).astype(x.dtype),
                        p, H=H, W=W, nh=nh, window=w, shift=shift,
                        compute_dtype=jnp.bfloat16, attn_impl=impl,
                        exp_bf16=eb, vmem_limit_mb=80)
                    return acc + y.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            jstep = jax.jit(step)
            _ = float(jstep(params, x0, jnp.int32(0)))
            t0 = time.perf_counter()
            for i in range(ITERS):
                _ = float(jstep(params, x0, jnp.int32(i + 1)))
            dt = (time.perf_counter() - t0) / (ITERS * K) * 1000
            print(f"{name}[{impl}] exp_bf16={int(eb)}: {dt:.3f} ms/block",
                  flush=True)


if __name__ == "__main__":
    main()
