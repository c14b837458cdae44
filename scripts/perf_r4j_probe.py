#!/usr/bin/env python
"""Probe R4J: PatchMerging-fold A/B on the flagship glue-folded step after
the Mosaic-legal rewrite (B=128, fori K=32, quiet box).

r4h found the original merge branch Mosaic-illegal (strided 6-D views +
lane-concat -> "offset mismatch on non-concat dimension"); the rewrite
(probe_merge_ops2.py: lane-pad each token row to Cp=ceil(C/128)*128, w-pair
merge via aligned (R,Cp)->(R/2,2Cp) reshape, h-parity via W//2-row block
mid-index, cross-piece LN with explicit moments, per-piece reduction dots)
compiles and runs on-chip. r4g's device profile attributed ~3.5 ms/batch of
XLA strided-slice copies to the three PatchMerging ops — this measures how
much the fold recovers, and whether exp2 softmax stacks with it
(r4h: exp2 53.55 vs exact 53.77/53.85 ms — borderline).
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

    # one-shot on-chip parity: merge_fold vs the flax PatchMerging path
    one = jax.jit(lambda v, w, s: htsat_fused_forward_from_wav(
        model, v, w, wav_scale=s, split3=True,
        merge_fold=True)["multi_accdoa"])
    two = jax.jit(lambda v, w, s: htsat_fused_forward_from_wav(
        model, v, w, wav_scale=s, split3=True)["multi_accdoa"])
    a = np.asarray(one(variables, base[:8], jnp.float32(1.01)))
    b = np.asarray(two(variables, base[:8], jnp.float32(1.01)))
    print(f"merge_fold-vs-flax-merge on-chip max dev: "
          f"{np.abs(a - b).max():.2e} (scale {np.abs(b).max():.3f})",
          flush=True)

    def make_step(impl, merge_fold):
        @jax.jit
        def step(v, w, k):
            def body(i, acc):
                out = htsat_fused_forward_from_wav(
                    model, v, w, wav_scale=1.0 + 1e-4 * (k * K + i),
                    split3=True, attn_impl=impl, merge_fold=merge_fold)
                return acc + out["multi_accdoa"].astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))
        return step

    variants = [("exact", False), ("exact", True), ("exp2", True),
                ("exact", False)]
    for impl, mf in variants:
        tag = impl + ("+merge_fold" if mf else "")
        step = make_step(impl, mf)
        try:
            t0 = time.perf_counter()
            _ = float(step(variables, base, jnp.int32(0)))
            compile_s = time.perf_counter() - t0
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] COMPILE FAILED: "
                  f"{str(e).splitlines()[0][:160]}", flush=True)
            continue
        t0 = time.perf_counter()
        for i in range(ITERS):
            _ = float(step(variables, base, jnp.int32(i + 1)))
        dt = (time.perf_counter() - t0) / (ITERS * K)
        print(f"[{tag}] steady {dt * 1000:.2f} ms/batch = "
              f"{B / dt / 6:.1f} 1-min clips/s (compile {compile_s:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
