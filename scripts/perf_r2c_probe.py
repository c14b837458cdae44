#!/usr/bin/env python
"""Round-2 perf probe C: fused-serving numbers for PaSST and EINV2-HTSAT
(vs their flax forwards), then the train-step benchmark (full + AdapterBit).
One process, K-amortized, varying inputs."""

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


def serving_pair(tag, model, variables, feats, fused_fn, out_key):
    flax_dt = k_amortized(
        f"{tag} flax fwd",
        lambda k, f: model.apply(variables, f * (1.0 + 1e-4 * k),
                                 train=False)[out_key].astype(
                                     jnp.float32).mean(),
        (feats,))
    fused_dt = k_amortized(
        f"{tag} FUSED fwd",
        lambda k, f: fused_fn(model, variables,
                              f * (1.0 + 1e-4 * k))[out_key].astype(
                                  jnp.float32).mean(),
        (feats,))
    ref = jax.jit(lambda f: model.apply(
        jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), variables),
        f.astype(jnp.float32), train=False))(feats[:4])
    got = jax.jit(lambda f: fused_fn(model, variables, f))(feats[:4])
    dev = float(jnp.abs(got[out_key].astype(jnp.float32)
                        - ref[out_key].astype(jnp.float32)).max())
    print(f"{tag}: fused {fused_dt*1000:.1f} ms vs flax {flax_dt*1000:.1f} ms "
          f"({flax_dt/fused_dt:.2f}x), bf16-vs-f32 max dev {dev:.4f}",
          flush=True)


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.serving import (einv2_htsat_fused_forward,
                                       passt_fused_forward)

    B = 32  # serving comparisons at a moderate batch to bound compile times

    # ---- PaSST mACCDOA ----
    cfg = compose(str(REPO / "configs"), "train",
                  ["model=passt", "loss=multi_accdoa",
                   "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                              jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r, "patchout": r}, f, train=False))(
            jax.random.PRNGKey(0), feats[:2])
    jax.block_until_ready(feats)
    serving_pair("PaSST mACCDOA B=32", model, variables, feats,
                 passt_fused_forward, "multi_accdoa")
    del model, variables, feats

    # ---- EINV2 dual-HTSAT ----
    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=einv2_pit", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats = jax.random.normal(jax.random.PRNGKey(2), (B, 7, 1001, 64),
                              jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats[:2])
    jax.block_until_ready(feats)
    serving_pair("EINV2 dual-HTSAT B=32", model, variables, feats,
                 einv2_htsat_fused_forward, "doa")
    del model, variables, feats

    # ---- train-step bench (full + adapter) ----
    import bench_train

    bench_train.main()


if __name__ == "__main__":
    main()
