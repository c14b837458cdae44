#!/usr/bin/env python
"""Probe R5E: Pallas patch-embed kernel vs the einsum formulation, full step.

r5c/r5a showed the einsum patch-embed is a wash vs the conv (~2 ms of layout
copies remain — XLA materializes a transposed copy either way because the
token order interleaves the wav2img time-group axis with freq). The kernel
(ops/pallas/patch_embed.py) reads each feature byte once and writes each
token byte once, with the f->(fp,df) split folded into block-diagonal
weights so the MXU does the gather. A/B at the bench shape (B=128, fori
K=32) + on-chip parity.
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

    outs = {}
    for pe in ("einsum", "kernel"):
        outs[pe] = jax.jit(lambda v, w, pe=pe: htsat_fused_forward_from_wav(
            model, v, w, patch_embed=pe)["multi_accdoa"])(variables, base)
    dev = float(jnp.max(jnp.abs(outs["einsum"].astype(jnp.float32)
                                - outs["kernel"].astype(jnp.float32))))
    print(f"kernel-vs-einsum parity: {dev:.3e} at scale "
          f"{float(jnp.max(jnp.abs(outs['einsum'].astype(jnp.float32)))):.3f}",
          flush=True)

    for pe in ("einsum", "kernel"):
        @jax.jit
        def step(v, w, k, pe=pe):
            def body(i, acc):
                out = htsat_fused_forward_from_wav(
                    model, v, w, wav_scale=1.0 + 1e-4 * (k * K + i),
                    patch_embed=pe)
                return acc + out["multi_accdoa"].astype(jnp.float32).mean()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        t0 = time.perf_counter()
        _ = float(step(variables, base, jnp.int32(0)))
        print(f"{pe}: compile+first {time.perf_counter() - t0:.1f}s",
              flush=True)
        t0 = time.perf_counter()
        for i in range(ITERS):
            _ = float(step(variables, base, jnp.int32(i + 1)))
        dt = (time.perf_counter() - t0) / (ITERS * K) * 1000
        print(f"{pe}: {dt:.2f} ms/batch ({B / (dt / 1000) / 6:.1f} clips/s)",
              flush=True)


if __name__ == "__main__":
    main()
