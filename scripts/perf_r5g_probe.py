#!/usr/bin/env python
"""Probe R5G: grid-cell group-size sweep for the fused Swin blocks.

r5f's ablations leave stage0 with ~3.9 ms/block of structural cost after
nulling GELU+LN+softmax — close to 64 cells x the ~30 us fixed grid-cell
dispatch overhead (auto-group G=2 at stage0). The round-2 "grouping doesn't
help" result covered LATE-stage tiles only; this sweeps G at stage0/1/2
production shapes (headdot/exp2 via auto) with the VMEM cap raised to fit
bigger groups.
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

SWEEPS = [
    ("stage0", 64, 64, 96, 4, 8, 4, (2, 4, 8)),
    ("stage1", 32, 32, 192, 8, 8, 4, (4, 8, 16)),
    ("stage2", 16, 16, 384, 16, 8, 4, (8, 16, 32)),
]


def main():
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas.swin_block import swin_block_fused

    rng = np.random.default_rng(0)
    for name, H, W, C, nh, w, shift, groups in SWEEPS:
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
        for g in groups:
            def step(p, x, kk, g=g):
                def body(i, acc):
                    y = swin_block_fused(
                        x * (1.0 + 1e-4 * (kk * K + i)).astype(x.dtype),
                        p, H=H, W=W, nh=nh, window=w, shift=shift,
                        compute_dtype=jnp.bfloat16, attn_impl="auto",
                        group=g, vmem_limit_mb=110)
                    return acc + y.astype(jnp.float32).mean()
                return jax.lax.fori_loop(0, K, body, jnp.float32(0))

            jstep = jax.jit(step)
            try:
                jstep.lower(params, x0, jnp.int32(0)).compile()
            except Exception as e:
                print(f"{name} G={g}: COMPILE FAIL {str(e)[:200]}",
                      flush=True)
                continue
            _ = float(jstep(params, x0, jnp.int32(0)))
            t0 = time.perf_counter()
            for i in range(ITERS):
                _ = float(jstep(params, x0, jnp.int32(i + 1)))
            dt = (time.perf_counter() - t0) / (ITERS * K) * 1000
            print(f"{name} G={g:<3} {dt:.3f} ms/block ({B // g} cells)",
                  flush=True)


if __name__ == "__main__":
    main()
