#!/usr/bin/env python
"""Probe C2 (trimmed): EINV2 dual-HTSAT fused vs flax serving numbers, then
the train-step benchmark. Parity is pinned on CPU (test_serving_fused.py) —
no on-chip parity recompiles here."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp


def k_amortized(name, body, args, K=4, iters=4):
    @jax.jit
    def step(k0, *args):
        acc = jnp.float32(0)
        for i in range(K):
            acc = acc + body(k0 * K + i, *args)
        return acc

    t0 = time.time()
    _ = float(step(jnp.int32(0), *args))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(jnp.int32(i + 1), *args))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name}: compile {compile_s:.1f}s steady {dt*1000:.2f} ms",
          flush=True)
    return dt


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.serving import einv2_htsat_fused_forward

    B = 32
    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=einv2_pit", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, 7, 1001, 64),
                              jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats[:2])
    jax.block_until_ready(feats)
    flax_dt = k_amortized(
        "EINV2 dual-HTSAT B=32 flax fwd",
        lambda k, f: model.apply(variables, f * (1.0 + 1e-4 * k),
                                 train=False)["doa"].astype(
                                     jnp.float32).mean(),
        (feats,))
    fused_dt = k_amortized(
        "EINV2 dual-HTSAT B=32 FUSED fwd",
        lambda k, f: einv2_htsat_fused_forward(
            model, variables, f * (1.0 + 1e-4 * k))["doa"].astype(
                jnp.float32).mean(),
        (feats,))
    print(f"EINV2 speedup: {flax_dt/fused_dt:.2f}x", flush=True)
    del model, variables, feats

    import bench_train

    bench_train.main()


if __name__ == "__main__":
    main()
