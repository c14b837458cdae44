#!/usr/bin/env python
"""Round-2 perf probe (v2): K-amortized on-device timing of the frontend and
fused forward separately, poly-GELU accuracy check, full bench step, and a
device-op profile. Inputs are derived on device from ONE base batch (no HBM
hoarding; varying inputs + scalar fetch keep the relay honest)."""

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

K = 16
B = 128


def k_amortized(name, body, args, iters=4, ref_ms=None):
    """body(k, *args) -> scalar; runs K times per dispatch inside one jit."""

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
    extra = f" (round-1: {ref_ms} ms)" if ref_ms else ""
    print(f"{name}: compile {compile_s:.1f}s steady {dt*1000:.2f} ms{extra}",
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

    extractor = lambda w: fused_logmel_iv(w, split3=True)  # noqa: E731
    feats0 = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    variables = jax.jit(
        lambda r, f: model.init({"params": r}, f, train=False)
    )(jax.random.PRNGKey(0), feats0)

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    # 1. frontend alone (single-copy prep + kernel), K-amortized
    k_amortized("frontend split3 B=128",
                lambda k, b: extractor(b * (1.0 + 1e-4 * k)).mean(),
                (base,), ref_ms="38 (28.6 kernel + ~10 prep)")

    # 2. fused model forward alone (poly GELU), K-amortized
    fbase = jax.jit(extractor)(base)
    jax.block_until_ready(fbase)
    k_amortized("fused fwd B=128",
                lambda k, f: htsat_fused_forward(
                    model, variables,
                    f * (1.0 + 1e-4 * k))["multi_accdoa"].astype(
                        jnp.float32).mean(),
                (fbase,), ref_ms="44")

    # 3. on-chip poly-GELU accuracy: bf16 fused vs f32 flax reference
    ref = jax.jit(lambda f: model.apply(
        jax.tree_util.tree_map(lambda a: a.astype(jnp.float32), variables),
        f.astype(jnp.float32), train=False))(fbase[:8])
    got = jax.jit(lambda f: htsat_fused_forward(model, variables,
                                                f))(fbase[:8])
    dev = float(jnp.abs(got["multi_accdoa"].astype(jnp.float32)
                        - ref["multi_accdoa"]).max())
    print(f"poly-GELU bf16 fused vs f32 flax: max dev {dev:.4f} "
          f"(round-1 erf baseline: 0.023)", flush=True)
    del ref, got, fbase

    # 4. full bench step (K=16 amortized) — the headline
    @jax.jit
    def step(variables, base, k):
        acc = jnp.float32(0)
        for i in range(K):
            wav = base * (1.0 + 1e-4 * (k * K + i)) + 1e-5 * (k * K + i)
            out = htsat_fused_forward(model, variables, extractor(wav))
            acc = acc + out["multi_accdoa"].astype(jnp.float32).mean()
        return acc

    _ = float(step(variables, base, jnp.int32(0)))
    iters = 5
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(variables, base, jnp.int32(i + 1)))
    dt = (time.perf_counter() - t0) / (iters * K)
    clips = (B / dt) / 6.0
    print(f"FULL STEP: {dt*1000:.2f} ms/batch -> {clips:.1f} clips/s "
          f"(round-1: 293)", flush=True)

    # 5. device-op profile of one dispatch to find remaining headroom
    prof_dir = str(REPO / ".profile_r2")
    with jax.profiler.trace(prof_dir):
        _ = float(step(variables, base, jnp.int32(99)))
    print(f"profile written to {prof_dir}", flush=True)


if __name__ == "__main__":
    main()
