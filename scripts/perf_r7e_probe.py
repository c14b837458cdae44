#!/usr/bin/env python
"""Probe R7E (round 4): CNN14 conv_out A/B (VERDICT #5).

The r7c device profile of the cnn14_accdoa step (92.9 ms/step true cost)
put conv-named ops at 54.9 ms and the largest NON-conv block in
maximum_convert_fusion passes — the separate f32 ReLU(x+bias) -> bf16
materializations after every conv (12.6 + 6.3 + 6.2 + 4.1 + ~8 more ms).
conv_out="compute" requests bf16 conv outputs from XLA (MXU still
accumulates f32 internally) so those passes read/write half the bytes.

A/B at the bench config (B=128, from-wav, head-only scale) + on-chip
parity of the two variants. Quiet box required.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import bench_all
import jax
import jax.numpy as jnp

B = 128
K = 32


def main():
    from bench import _wait_for_backend
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import crnn_fused_forward_from_wav

    _wait_for_backend()
    t0 = time.time()

    cfg, model = bench_all._build(["model=crnn", "loss=accdoa"])
    feats0 = fused_logmel_iv(jnp.zeros((2, 4, 240000), jnp.float32),
                             split3=True)
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    base = jax.random.normal(jax.random.PRNGKey(7), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    # parity once at B=2 (bf16 band expected)
    outs = {}
    for co in ("f32", "compute"):
        outs[co] = jax.jit(lambda w, v, co=co: crnn_fused_forward_from_wav(
            model, v, w, conv_out=co)["accdoa"])(base[:2], variables)
    dev = float(jnp.max(jnp.abs(outs["compute"].astype(jnp.float32)
                                - outs["f32"].astype(jnp.float32))))
    print(f"cnn14 conv_out compute-vs-f32 on-chip parity (bf16): {dev:.3e}",
          flush=True)

    for co in ("f32", "compute"):
        dt = bench_all._k_time(
            lambda k, w, v, co=co: crnn_fused_forward_from_wav(
                model, v, w, wav_scale=1.0 + 1e-4 * k, pre_scale_head=True,
                conv_out=co)["accdoa"].astype(jnp.float32).mean(),
            (base, variables), K=K)
        print(f"cnn14 B={B} conv_out={co}: {dt*1000:.3f} ms/batch = "
              f"{(B/dt)/6.0:.1f} clips/s", flush=True)

    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
