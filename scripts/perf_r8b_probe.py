#!/usr/bin/env python
"""Probe R8B (round 4): EINV2 dual-HTSAT serving batch sweep.

einv2_agg has only ever been measured at B=32 (322.9 clips/s end of round 3);
PaSST gained 9% moving B=32->128 (r7a) and the flagship HTSAT runs at B=128.
Sweep B in {32, 64, 128} on the fused dual-HTSAT path. Quiet box required
(wall-clock A/B).
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

K = 32


def main():
    import bench_all
    from pseldnets_tpu import serving

    cfg, model = bench_all._build(["loss=einv2_pit_agg"])
    fused_fn = serving.einv2_htsat_fused_forward

    feats0 = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 1001, 64),
                               jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r, "patchout": r}, f, train=False))(
            jax.random.PRNGKey(0), feats0)

    from bench import _wait_for_backend
    _wait_for_backend()

    for B in (32, 64, 128):
        feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                                  jnp.float32) * 0.3
        jax.block_until_ready(feats)
        t_start = time.perf_counter()
        try:
            dt = bench_all._k_time(
                lambda k, f, v: fused_fn(model, v, f * (1.0 + 1e-4 * k))[
                    "doa"].astype(jnp.float32).mean(), (feats, variables),
                K=K)
        except Exception as e:  # relay compile-helper SIGKILL etc.
            print(f"B={B}: FAILED {type(e).__name__}: {e}", flush=True)
            continue
        clips = (B / dt) / 6.0
        print(f"B={B}: {dt * 1000:.2f} ms/batch = {clips:.1f} 1-min clips/s "
              f"(compile+run {time.perf_counter() - t_start:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
