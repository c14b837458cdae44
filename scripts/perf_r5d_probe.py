#!/usr/bin/env python
"""Probe R5D: per-head-dot attention (attn_impl="headdot") vs exp2 per stage.

The r5a profile puts the 12 Swin block kernels at ~30 ms of the 51 ms step,
with stage 0's two blocks at 11.6 ms (vs ~1 ms of MXU floor each) — the gap
is VPU relayout (per-head lane slices of the (R, 3C) qkv buffer at hd=24
offsets) + softmax. headdot removes every activation lane slice: q/k/v come
from per-head direct dots (leading-axis weight indexing; the MXU pads dot N
to 128 lanes anyway so (C, 24) dots cost the same tiles) and proj folds into
the per-head v weights, killing the head-concat relayout and the proj dot.
Cost: the qkv+proj MXU work rises (x3-4 at stage 0, x16 at stage 3) — so
this probe measures per-stage and serving picks per-stage winners.

AOT compile-check first (Mosaic layout legality, ~4 s), then fori-K A/B.
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

# production HTSAT stage shapes: (H, W, C, nh, window, shift)
STAGES = [
    ("stage0", 64, 64, 96, 4, 8, 4),
    ("stage1", 32, 32, 192, 8, 8, 4),
    ("stage2", 16, 16, 384, 16, 8, 4),
    ("stage3", 8, 8, 768, 32, 8, 0),  # window clamp -> shift 0
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

        results = {}
        for impl in ("exp2", "headdot"):
            def step(p, x, kk, impl=impl):
                def body(i, acc):
                    y = swin_block_fused(
                        x * (1.0 + 1e-4 * (kk * K + i)).astype(x.dtype),
                        p, H=H, W=W, nh=nh, window=w, shift=shift,
                        compute_dtype=jnp.bfloat16, attn_impl=impl)
                    return acc + y.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            jstep = jax.jit(step)
            try:
                t0 = time.perf_counter()
                jstep.lower(params, x0, jnp.int32(0)).compile()
                print(f"{name} {impl}: AOT compile ok "
                      f"({time.perf_counter() - t0:.0f}s)", flush=True)
            except Exception as e:
                print(f"{name} {impl}: COMPILE FAIL {str(e)[:300]}",
                      flush=True)
                continue
            _ = float(jstep(params, x0, jnp.int32(0)))
            t0 = time.perf_counter()
            for i in range(ITERS):
                _ = float(jstep(params, x0, jnp.int32(i + 1)))
            dt = (time.perf_counter() - t0) / (ITERS * K) * 1000
            results[impl] = dt
            print(f"{name} {impl}: {dt:.3f} ms/block @B={B}", flush=True)
        if len(results) == 2:
            r = results["exp2"] / results["headdot"]
            print(f"{name}: headdot is {r:.3f}x", flush=True)

    # parity on-chip at stage0 shape, bf16
    name, H, W, C, nh, w, shift = STAGES[0]
    blk = SwinTransformerBlock(dim=C, input_resolution=(H, W), num_heads=nh,
                               window_size=w, shift_size=shift)
    x0 = jnp.asarray(rng.standard_normal((8, H * W, C)).astype(np.float32)
                     * 0.5).astype(jnp.bfloat16)
    vs = jax.jit(lambda r, x: blk.init({"params": r}, x,
                                       deterministic=True))(
        jax.random.PRNGKey(0), x0)
    outs = {impl: jax.jit(lambda p, x, impl=impl: swin_block_fused(
        x, p, H=H, W=W, nh=nh, window=w, shift=shift,
        compute_dtype=jnp.bfloat16, attn_impl=impl))(vs["params"], x0)
        for impl in ("exp2", "headdot")}
    dev = float(jnp.max(jnp.abs(outs["exp2"].astype(jnp.float32)
                                - outs["headdot"].astype(jnp.float32))))
    print(f"stage0 bf16 parity exp2-vs-headdot: {dev:.3e}", flush=True)


if __name__ == "__main__":
    main()
