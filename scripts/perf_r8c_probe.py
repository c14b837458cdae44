#!/usr/bin/env python
"""Probe R8C (round 4): flagship serving batch sweep above B=128.

B=128 was adopted for the headline early (round 1) and never challenged
upward. EINV2 kept scaling to B=128 (r8b) and the Swin kernels are
grid-parallel over B x windows, so B=192/256 may amortize residual per-grid
and glue costs further. HBM check: B=256 waveforms = 1.0 GB f32 + features
0.5 GB — fits v5e's 16 GB. Quiet box required (wall-clock A/B).
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

K = 16  # compile cost is K-free (fori); K=16 keeps RTT <2% at these ms


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

    from bench import _wait_for_backend
    _wait_for_backend()

    for B in (128, 192, 256):
        base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                                 jnp.float32) * 0.1

        @jax.jit
        def step(v, w, k):
            def body(i, acc):
                out = htsat_fused_forward_from_wav(
                    model, v, w, wav_scale=1.0 + 1e-4 * (k * K + i),
                    pre_scale_head=True, split3=True)
                return acc + out["multi_accdoa"].astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        jax.block_until_ready(base)
        t_start = time.perf_counter()
        try:
            _ = float(step(variables, base, jnp.int32(0)))
            t0 = time.perf_counter()
            iters = 4
            for i in range(iters):
                _ = float(step(variables, base, jnp.int32(i + 1)))
            dt = (time.perf_counter() - t0) / (iters * K)
        except Exception as e:
            print(f"B={B}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        print(f"B={B}: {dt * 1000:.2f} ms/batch = {(B / dt) / 6.0:.1f} "
              f"1-min clips/s (compile+run {time.perf_counter() - t_start:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
