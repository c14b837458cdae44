#!/usr/bin/env python
"""Probe R7A (round 4): PaSST serving batch ceiling + flagship harness cost.

1. PaSST mACCDOA fused serving (offline 10 s feats): A/B attn_impl
   exact vs exp2 (sum_pv + nomax, the ViT transplant of the Swin round-3
   wins — r6c never got measured before the relay outage), swept over
   B = 32 / 64 / 128. VERDICT item: passt_maccdoa sits at 243.4 clips/s
   @B=32 vs the 300 bar; the batch ceiling is unexplored.
2. Flagship HTSAT from-wav step: wav_scale riding the FULL prep concat
   (current bench harness) vs pre_scale_head=True (scale touches only the
   512-sample reflect head — honest per-iteration variation at ~0.4% of
   the multiply; frames >= 3 bit-identical to production). VERDICT weak
   #7: the full-ride variation understates production ~3%.

One process, fori-K harness per CLAUDE.md; quiet box required.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import bench_all  # noqa: E402  (reuses _build + _k_time)
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

K = 32


def clips(dt, B, clip_sec=10.0):
    return (B / dt) / (60.0 / clip_sec)


def passt_sweep():
    from pseldnets_tpu.serving import passt_fused_forward

    cfg, model = bench_all._build(["model=passt", "loss=multi_accdoa"])
    f0 = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 1001, 64),
                           jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r, "patchout": r}, f, train=False))(
            jax.random.PRNGKey(0), f0)

    # parity once at B=2 (cheap): exp2+sum_pv+nomax vs exact
    outs = {}
    for impl in ("exact", "exp2"):
        outs[impl] = jax.jit(lambda f, v, impl=impl: passt_fused_forward(
            model, v, f, attn_impl=impl)["multi_accdoa"])(f0, variables)
    dev = float(jnp.max(jnp.abs(outs["exp2"].astype(jnp.float32)
                                - outs["exact"].astype(jnp.float32))))
    print(f"passt exp2+sum_pv+nomax on-chip parity (bf16): {dev:.3e}",
          flush=True)

    for B in (32, 64, 128):
        feats = jax.random.normal(jax.random.PRNGKey(2), (B, 7, 1001, 64),
                                  jnp.float32) * 0.3
        jax.block_until_ready(feats)
        for impl in ("exact", "exp2"):
            try:
                dt = bench_all._k_time(
                    lambda k, f, v, impl=impl: passt_fused_forward(
                        model, v, f * (1.0 + 1e-4 * k),
                        attn_impl=impl)["multi_accdoa"].astype(
                            jnp.float32).mean(),
                    (feats, variables), K=K)
                print(f"passt B={B} attn_impl={impl}: {dt*1000:.3f} ms/batch"
                      f" = {clips(dt, B):.1f} clips/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"passt B={B} attn_impl={impl} FAILED: "
                      f"{str(e).splitlines()[0][:200]}", flush=True)
        del feats


def flagship_wavscale_ab():
    from pseldnets_tpu.serving import htsat_fused_forward_from_wav

    cfg, model = bench_all._build(["loss=multi_accdoa"])
    B = 128
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    feats0 = fused_logmel_iv(jnp.zeros((2, 4, 240000), jnp.float32),
                             split3=True)
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats0)
    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    for tag, kw in (("full-ride", {}), ("head-only", {"pre_scale_head": True})):
        dt = bench_all._k_time(
            lambda k, w, v, kw=kw: htsat_fused_forward_from_wav(
                model, v, w, wav_scale=1.0 + 1e-4 * k, split3=True,
                **kw)["multi_accdoa"].astype(jnp.float32).mean(),
            (base, variables), K=K)
        print(f"flagship wav_scale {tag}: {dt*1000:.3f} ms/batch = "
              f"{clips(dt, B):.1f} clips/s", flush=True)


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    t0 = time.time()
    passt_sweep()
    flagship_wavscale_ab()
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
