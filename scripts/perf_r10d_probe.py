#!/usr/bin/env python
"""Probe R10D: fused ADAPTER eval (serving) vs flax eval, on-chip.

AdapterBit-tuned checkpoints used to fall back to the flax eval forward
(the optimized serving kernels are adapter-free); serving/htsat now routes
adapter trees through the adapter eval kernel. Measure both sides at B=128
on offline features, fori K=8, ONE process, quiet box.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

K = 8
B = 128


def main():
    from bench import _wait_for_backend
    _wait_for_backend()

    import numpy as np
    import jax
    import jax.numpy as jnp

    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.serving import htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null",
                   "model.kwargs.audioset_pretrain=false", "adapt=adapter"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    assert model.adapt.kernels_support()
    r = np.random.default_rng(0)
    x0 = jnp.asarray(r.standard_normal((B, 7, 1001, 64)), jnp.float32) * 0.3
    variables = jax.jit(lambda rr, f: model.init(
        {"params": rr}, f, train=False))(jax.random.PRNGKey(0), x0[:2])
    # randomize zero-init adapter fc2 so the adapters do real work
    import flax

    flat = flax.traverse_util.flatten_dict(variables["params"])
    for k in flat:
        if "adapter" in k:
            flat[k] = jnp.asarray(
                r.standard_normal(flat[k].shape).astype(np.float32) * 0.1)
    variables = dict(variables)
    variables["params"] = flax.traverse_util.unflatten_dict(flat)

    def bench(name, fwd):
        @jax.jit
        def kstep(x, j):
            def body(i, acc):
                out = fwd(x * (1.0 + 1e-4 * (j * K + i)))
                key = "multi_accdoa"
                return acc + out[key].astype(jnp.float32).sum()
            return jax.lax.fori_loop(0, K, body, jnp.float32(0))

        t0 = time.time()
        _ = float(kstep(x0, jnp.int32(0)))
        compile_s = time.time() - t0
        iters = 4
        t0 = time.perf_counter()
        for i in range(iters):
            _ = float(kstep(x0, jnp.int32(i + 1)))
        dt = (time.perf_counter() - t0) / (iters * K)
        print({"metric": name, "ms_per_batch": round(dt * 1000, 2),
               "clips_per_sec": round(B / dt / 6, 1),
               "compile_s": round(compile_s, 1)}, flush=True)

    bench("htsat_adapter_eval [fused-adapter-kernel] B=128",
          lambda x: htsat_fused_forward(model, variables, x))
    bench("htsat_adapter_eval [flax] B=128",
          lambda x: model.apply(variables, x, train=False))
    print("done", flush=True)


if __name__ == "__main__":
    main()
