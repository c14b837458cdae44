#!/usr/bin/env python
"""Probe R8D (round 4): bf16x2 sub-DFT split — A/B + parity on the headline.

split3 (bf16x3) spends 3*hh = 360->384 K-lanes per sub-DFT part dot for
f32-accurate spectra; bf16x2 ([a_hi|a_hi] @ [hi;lo] — bf16 signal,
f32-effective weights) needs 2*hh = 240->256, i.e. 2/3 of the dominant MXU
cost (the r8a profile puts the frontend kernel at 12.69 ms of the 43.8 ms
step, ~10.5 ms of it sub-DFT dots -> expected saving ~3.5 ms, ~+8%).

CPU interpret parity vs the f32 kernel: 9.6e-2 dB worst-bin on white noise
(split3: 1.8e-4) — the same order as the bf16 FEATURE cast serving already
applies (bf16 step at dB magnitude 16-32 is 0.0625-0.125).

Acceptance gate: on-chip mACCDOA logit parity vs the split3 path within the
established fused-serving bf16 band (~3e-2 at logit scale; merge_fold 2.7e-2,
exp2 3.1e-2, passt 1.5e-2). Quiet box required for the wall A/B.
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
K = 16


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

    from bench import _wait_for_backend
    _wait_for_backend()

    # ---- parity first (also warms the chip claim)
    outs = {}
    for mode in ("bf16x3", "bf16x2"):
        f = jax.jit(lambda v, w: htsat_fused_forward_from_wav(
            model, v, w, split3=True, split_mode=mode)["multi_accdoa"])
        outs[mode] = np.asarray(f(variables, base[:8]), np.float32)
    d = np.abs(outs["bf16x2"] - outs["bf16x3"]).max()
    print(f"on-chip logit parity bf16x2 vs bf16x3: {d:.3e} "
          f"(band: merge_fold 2.7e-2 / exp2 3.1e-2)", flush=True)

    # ---- wall A/B
    for mode in ("bf16x3", "bf16x2"):
        @jax.jit
        def step(v, w, k):
            def body(i, acc):
                out = htsat_fused_forward_from_wav(
                    model, v, w, wav_scale=1.0 + 1e-4 * (k * K + i),
                    pre_scale_head=True, split3=True, split_mode=mode)
                return acc + out["multi_accdoa"].astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        jax.block_until_ready(base)
        t_start = time.perf_counter()
        _ = float(step(variables, base, jnp.int32(0)))
        t0 = time.perf_counter()
        iters = 4
        for i in range(iters):
            _ = float(step(variables, base, jnp.int32(i + 1)))
        dt = (time.perf_counter() - t0) / (iters * K)
        print(f"{mode}: {dt * 1000:.2f} ms/batch = {(B / dt) / 6.0:.1f} "
              f"1-min clips/s (compile+run {time.perf_counter() - t_start:.0f}s)",
              flush=True)


if __name__ == "__main__":
    main()
