#!/usr/bin/env python
"""Probe R3E: frontend prep A/B (interleave transpose vs stride-2 slices),
t_blk sweep under the pack layout, and a B=192 full-step probe.

The R3D device profile showed the frontend KERNEL at ~16.4 ms device-time
while the invocation walls 25.4 ms — the gap is XLA prep (decimation
transpose ~4.5 ms, pad, scaling). These are the cheap remaining levers."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

B = 128


def k_time(name, fn, base, K=8, iters=4):
    @jax.jit
    def step(k0, w):
        acc = jnp.float32(0)
        for i in range(K):
            acc = acc + fn(w * (1.0 + 1e-4 * (k0 * K + i))).astype(
                jnp.float32).mean()
        return acc

    t0 = time.time()
    _ = float(step(jnp.int32(0), base))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(jnp.int32(i + 1), base))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name}: compile {compile_s:.1f}s steady {dt*1000:.2f} ms",
          flush=True)
    return dt


def main():
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    for prep in ("transpose", "stride"):
        for t_blk in (128, 256, 512):
            k_time(f"prep={prep} t_blk={t_blk}",
                   lambda w, p=prep, t=t_blk: fused_logmel_iv(
                       w, split3=True, prep=p, t_blk=t), base)
    ref = jax.jit(lambda w: fused_logmel_iv(w, split3=True))(base[:4])
    got = jax.jit(lambda w: fused_logmel_iv(w, split3=True,
                                            prep="stride"))(base[:4])
    print(f"stride prep max dev: {float(jnp.abs(got - ref).max()):.2e}",
          flush=True)

    # full step at B=192 (HBM check: 192*4*240k f32 waveforms = 737 MB + the
    # same again for rows — fits 16 GB)
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.serving import htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    feats0 = fused_logmel_iv(jnp.zeros((2, 4, 240000), jnp.float32),
                             split3=True)
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    for Bf in (192,):
        wav = jax.random.normal(jax.random.PRNGKey(7), (Bf, 4, 240000),
                                jnp.float32) * 0.1
        jax.block_until_ready(wav)

        @jax.jit
        def full(v, w, k, K=4):
            acc = jnp.float32(0)
            for i in range(K):
                out = htsat_fused_forward(
                    model, v, fused_logmel_iv(w * (1.0 + 1e-4 * (k * K + i)),
                                              split3=True))
                acc = acc + out["multi_accdoa"].astype(jnp.float32).mean()
            return acc

        t0 = time.time()
        _ = float(full(variables, wav, jnp.int32(0)))
        cs = time.time() - t0
        t0 = time.perf_counter()
        iters = 4
        for i in range(iters):
            _ = float(full(variables, wav, jnp.int32(i + 1)))
        dt = (time.perf_counter() - t0) / (iters * 4)
        print(f"full step B={Bf}: compile {cs:.1f}s {dt*1000:.2f} ms/batch "
              f"= {Bf/dt/6:.1f} 1-min clips/s", flush=True)


if __name__ == "__main__":
    main()
