#!/usr/bin/env python
"""Probe R4I: merge_fold A/B on the fused EINV2 dual-HTSAT serving path
(B=32, offline feats, fori K=32, quiet box).

Both encoder branches run 2x the Swin stage stack of the flagship, so the
PatchMerging fold (commit 1f33632 / 2beb84f) has twice the surface here. The
fold runs each stage's PatchMerging (LN + 4-neighbor reshape + reduction
linear) inside the stage's last block kernel, saving one HBM round-trip of
the stage activation per stage per branch. CPU parity pinned in
tests/test_serving_fused.py.
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

B = 32
K = 32
ITERS = 3


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.serving import einv2_htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=einv2_pit_agg", "model.kwargs.pretrained_path=null",
                   "model.kwargs.audioset_pretrain=false"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                              jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats[:2])
    jax.block_until_ready(feats)

    # one-shot on-chip parity: fold vs no-fold
    one = jax.jit(lambda v, f: einv2_htsat_fused_forward(
        model, v, f, merge_fold=True)["doa"])
    two = jax.jit(lambda v, f: einv2_htsat_fused_forward(
        model, v, f, merge_fold=False)["doa"])
    a = np.asarray(one(variables, feats[:4]), np.float32)
    b = np.asarray(two(variables, feats[:4]), np.float32)
    print(f"merge_fold-vs-flax-merge on-chip max dev: {np.abs(a - b).max():.2e}"
          f" (scale {np.abs(b).max():.3f})", flush=True)

    def make_step(mf):
        @jax.jit
        def step(v, f, k):
            def body(i, acc):
                out = einv2_htsat_fused_forward(
                    model, v, f * (1.0 + 1e-4 * (k * K + i)), merge_fold=mf)
                return acc + out["doa"].astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return step

    for mf in (False, True, False):
        step = make_step(mf)
        t0 = time.perf_counter()
        _ = float(step(variables, feats, jnp.int32(0)))
        compile_s = time.perf_counter() - t0
        t0 = time.perf_counter()
        for i in range(ITERS):
            _ = float(step(variables, feats, jnp.int32(i + 1)))
        dt = (time.perf_counter() - t0) / (ITERS * K)
        tag = "merge_fold" if mf else "flax-merge"
        print(f"[{tag}] steady {dt * 1000:.2f} ms/batch @B={B} "
              f"(compile {compile_s:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
