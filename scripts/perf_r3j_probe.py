#!/usr/bin/env python
"""Probe R3J: lane-trimmed frontend (2*nfh 514 -> 512, MXU-tile aligned)
vs untrimmed, on-chip @B=128, fori K=32.

The chains' [re|im] outputs at nfh=257 occupy 514 lanes -> padded to 640
(5 lane tiles) in every DFT dot, power/IV elementwise op and the mel dot's
K dim. Dropping the zero-mel-weight DC and Nyquist bins and remapping bin
hf/2 into the dead D-half column makes both halves exactly 256 lanes ->
512 total (4 tiles): a 20% MXU saving on the dominant dots if alignment is
what binds. Parity pinned in tests/test_pallas_frontend.py (<=4.6e-5 dB).
Also measures the full fused serving step with trim to project bench.py.
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
from jax import lax

B = 128
K = 32


def measure(name, step, args, iters=4, k=K):
    t0 = time.time()
    _ = float(step(jnp.int32(0), *args))
    cs = time.time() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(jnp.int32(i + 1), *args))
    dt = (time.perf_counter() - t0) / (iters * k)
    print(f"{name}: compile {cs:.1f}s steady {dt*1000:.2f} ms/batch",
          flush=True)
    return dt


def fori(fn, k=K):
    @jax.jit
    def step(k0, *args):
        def body(i, acc):
            return acc + fn(k0 * k + i, *args)
        return lax.fori_loop(0, k, body, jnp.float32(0))
    return step


def main():
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    def fe(trim):
        def f(i, w):
            return fused_logmel_iv(w * (1.0 + 1e-4 * i), split3=True,
                                   trim=trim).astype(jnp.float32).mean()
        return f

    print("claiming chip...", flush=True)
    jax.block_until_ready(jnp.zeros((8, 128)) @ jnp.zeros((128, 8)))
    print("chip claimed", flush=True)

    small = base[:8]
    a = jax.jit(lambda w: fused_logmel_iv(w, split3=True, trim=False))(small)
    b = jax.jit(lambda w: fused_logmel_iv(w, split3=True))(small)
    print(f"on-chip trim dev: logmel "
          f"{float(jnp.max(jnp.abs(a[:, :4] - b[:, :4]))):.2e} dB, IV "
          f"{float(jnp.max(jnp.abs(a[:, 4:] - b[:, 4:]))):.2e}", flush=True)

    d0 = measure("frontend untrimmed K=32", fori(fe(False)), (base,))
    d1 = measure("frontend TRIMMED   K=32", fori(fe(None)), (base,))
    d0b = measure("frontend untrimmed rerun", fori(fe(False)), (base,))
    print(f"ratio trimmed vs best-untrimmed: {d1 / min(d0, d0b):.3f}",
          flush=True)

    # full fused serving step with trim (projects bench.py's headline)
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
    print("model init done", flush=True)

    def full(i, v, w):
        out = htsat_fused_forward(
            model, v, fused_logmel_iv(w * (1.0 + 1e-4 * i), split3=True))
        return out["multi_accdoa"].astype(jnp.float32).mean()

    d = measure("full fused step (trim) K=32", fori(full), (variables, base))
    print(f"projected clips/s: {B / (d * 6):.1f}", flush=True)


if __name__ == "__main__":
    main()
