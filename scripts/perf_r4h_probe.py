#!/usr/bin/env python
"""Probe R4H: head-batched attention A/B on the flagship folded step
(B=128, fori K=32, quiet box).

The r4g device profile has the 12 per-block Swin kernels at ~29.4 ms of the
53.1 ms step. Inside each block the per-head loop slices q/k/v at lane
offsets hd*h (hd=24 — every slice is an unaligned-lane relayout) and runs nh
separate batched dots; nh reaches 32 at stage 3. attn_impl="batched" moves
heads onto the dot_general batch dim: one relayout per q/k/v + two flat
batched dots. Interpret-mode parity vs exact: bitwise 0.0 (f32).

Also in both variants: the attention q-scale is now folded into the qkv
weight/bias columns (exact at the f32 param level) — the in-kernel per-head
(N, hd) multiply is gone.
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


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward_from_wav

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats0 = fused_logmel_iv(jnp.zeros((2, 4, 240000), jnp.float32),
                             split3=True)
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    def make_step(impl, merge_fold=False):
        @jax.jit
        def step(v, w, k):
            def body(i, acc):
                out = htsat_fused_forward_from_wav(
                    model, v, w, wav_scale=1.0 + 1e-4 * (k * K + i),
                    split3=True, attn_impl=impl, merge_fold=merge_fold)
                return acc + out["multi_accdoa"].astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return step

    # one-shot on-chip parity (single batch, no harness)
    one = jax.jit(lambda v, w, s: htsat_fused_forward_from_wav(
        model, v, w, wav_scale=s, split3=True,
        attn_impl="batched")["multi_accdoa"])
    two = jax.jit(lambda v, w, s: htsat_fused_forward_from_wav(
        model, v, w, wav_scale=s, split3=True,
        attn_impl="exact")["multi_accdoa"])
    a = np.asarray(one(variables, base[:8], jnp.float32(1.01)))
    b = np.asarray(two(variables, base[:8], jnp.float32(1.01)))
    print(f"batched-vs-exact on-chip max dev: {np.abs(a - b).max():.2e} "
          f"(scale {np.abs(b).max():.3f})", flush=True)

    variants = [("exact", False), ("batched", False), ("exp2", False),
                ("exact", True), ("batched", True), ("exact", False)]
    for impl, mf in variants:
        step = make_step(impl, mf)
        t0 = time.perf_counter()
        _ = float(step(variables, base, jnp.int32(0)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(ITERS):
            _ = float(step(variables, base, jnp.int32(i + 1)))
        dt = (time.perf_counter() - t0) / (ITERS * K)
        tag = impl + ("+merge_fold" if mf else "")
        print(f"[{tag}] steady {dt * 1000:.2f} ms/batch = "
              f"{B / dt / 6:.1f} 1-min clips/s (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
