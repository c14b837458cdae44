#!/usr/bin/env python
"""Round-2 perf probe B: radix-2 split3 frontend (un-duplicated row blocks)
vs the flat split3 kernel; fast-LN/softmax fused forward; then the full bench
step with the best frontend. K-amortized, varying inputs, one process."""

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


def k_amortized(name, body, args, K=8, iters=4):
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
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    # 1. frontend variants at K=8 (cheaper compiles than K=16)
    dt_flat = k_amortized(
        "frontend split3 FLAT",
        lambda k, b: fused_logmel_iv(b * (1.0 + 1e-4 * k),
                                     split3=True, radix2=False).mean(),
        (base,))
    dt_r2 = k_amortized(
        "frontend split3 RADIX2 (ungathered rows)",
        lambda k, b: fused_logmel_iv(b * (1.0 + 1e-4 * k),
                                     split3=True, radix2=True).mean(),
        (base,))
    use_r2 = dt_r2 < dt_flat
    print(f"radix2 split3 {'WINS' if use_r2 else 'loses'}: "
          f"{dt_r2*1000:.2f} vs {dt_flat*1000:.2f} ms", flush=True)

    # radix2 parity on-chip (vs flat f32-HIGHEST)
    ref = jax.jit(lambda b: fused_logmel_iv(b, split3=False,
                                            radix2=False))(base[:8])
    got = jax.jit(lambda b: fused_logmel_iv(b, split3=True,
                                            radix2=True))(base[:8])
    logmel_err = float(jnp.abs(got[:, :4] - ref[:, :4]).max())
    iv_err = float(jnp.abs(got[:, 4:] - ref[:, 4:]).max())
    print(f"radix2 split3 vs f32 flat: logmel {logmel_err:.2e} dB, "
          f"iv {iv_err:.2e} (budget: 8e-4 dB)", flush=True)
    del ref, got

    extractor = lambda w: fused_logmel_iv(w, split3=True,  # noqa: E731
                                          radix2=use_r2)
    feats0 = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    variables = jax.jit(
        lambda r, f: model.init({"params": r}, f, train=False)
    )(jax.random.PRNGKey(0), feats0)

    # 2. fused fwd with fast LN/softmax
    fbase = jax.jit(extractor)(base)
    jax.block_until_ready(fbase)
    k_amortized(
        "fused fwd (fast LN+softmax)",
        lambda k, f: htsat_fused_forward(
            model, variables,
            f * (1.0 + 1e-4 * k))["multi_accdoa"].astype(jnp.float32).mean(),
        (fbase,))
    ref = jax.jit(lambda f: model.apply(
        jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), variables),
        f.astype(jnp.float32), train=False))(fbase[:8])
    got = jax.jit(lambda f: htsat_fused_forward(model, variables,
                                                f))(fbase[:8])
    dev = float(jnp.abs(got["multi_accdoa"].astype(jnp.float32)
                        - ref["multi_accdoa"]).max())
    print(f"fast-LN/softmax bf16 fused vs f32 flax: max dev {dev:.4f} "
          f"(erf/exact-LN baseline: 0.023)", flush=True)
    del ref, got, fbase

    # 3. full bench step, K=16 (bench.py parity)
    K = 16

    @jax.jit
    def step(variables, base, k):
        acc = jnp.float32(0)
        for i in range(K):
            wav = base * (1.0 + 1e-4 * (k * K + i)) + 1e-5 * (k * K + i)
            out = htsat_fused_forward(model, variables, extractor(wav))
            acc = acc + out["multi_accdoa"].astype(jnp.float32).mean()
        return acc

    t0 = time.time()
    _ = float(step(variables, base, jnp.int32(0)))
    print(f"full-step compile {time.time()-t0:.0f}s", flush=True)
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(variables, base, jnp.int32(i + 1)))
    dt = (time.perf_counter() - t0) / (iters * K)
    clips = (B / dt) / 6.0
    print(f"FULL STEP: {dt*1000:.2f} ms/batch -> {clips:.1f} clips/s "
          f"(round-1: 293; target 300+)", flush=True)


if __name__ == "__main__":
    main()
