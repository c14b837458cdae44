#!/usr/bin/env python
"""Probe R10A (round 5 cont.): AdapterBit fused training on-chip drive.

ops/pallas/swin_block_adapt_vjp extends the fused train path (r9d default
flip) to the AdapterBit bottleneck adapters — the one BASELINE config that
stayed on flax (~79 ms/step). Three stages, ONE process (quiet box):

1. compile-check + bf16 parity of a single adapter block fwd+bwd at the
   production stage-0 shape (Mosaic legality is NOT implied by CPU-interpret
   green — CLAUDE.md; AOT errors return fast);
2. full adapterbit train step, fused (auto default) vs flax, K=8 both sides
   (the r9d A/B convention);
3. report.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import bench_train  # noqa: E402


def stage1():
    import numpy as np
    import jax
    import jax.numpy as jnp
    import flax

    from pseldnets_tpu.models.adapters import AdaptConfig
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas.swin_block_adapt_vjp import \
        swin_block_train_adapt

    H = W = 64
    C, NH, WIN = 96, 4, 8
    B = 8
    adapt = AdaptConfig({
        "method": "adapter",
        "adapt_kwargs": {"position": ["MlpAdapter", "SpatialAdapter"],
                         "type": "adapter", "mlp_ratio": 0.5,
                         "adapter_scalar": 0.1, "act_layer": "gelu"}})
    blk = SwinTransformerBlock(dim=C, input_resolution=(H, W), num_heads=NH,
                               window_size=WIN, shift_size=4, adapt=adapt)
    r = np.random.default_rng(0)
    x = jnp.asarray(r.standard_normal((B, H * W, C)).astype(np.float32))
    p = blk.init(jax.random.PRNGKey(0), x)["params"]
    flat = flax.traverse_util.flatten_dict(p)
    for k in flat:
        if "adapter" in k:
            flat[k] = jnp.asarray(
                r.standard_normal(flat[k].shape).astype(np.float32) * 0.3)
    p = flax.traverse_util.unflatten_dict(flat)
    masks = jnp.ones((B, 2), jnp.float32)

    def loss(p, x):
        o = swin_block_train_adapt(x, p, masks, H, W, NH, WIN, 4, 0.1,
                                   jnp.bfloat16, False)
        return jnp.sum(o.astype(jnp.float32) ** 2)

    fn = jax.jit(jax.value_and_grad(loss))
    t0 = time.time()
    lowered = fn.lower(p, x)
    compiled = lowered.compile()
    print(f"stage1 compile ok in {time.time()-t0:.1f}s", flush=True)
    t0 = time.time()
    val, grads = compiled(p, x)
    val = float(val)
    print(f"stage1 first exec {time.time()-t0:.1f}s loss={val:.5f}",
          flush=True)

    # bf16 parity band vs flax (XLA default precision ~ bf16 either way)
    ref = float(jnp.sum(
        blk.apply({"params": p}, x).astype(jnp.float32) ** 2))
    rel = abs(val - ref) / max(1.0, abs(ref))
    gmax = max(float(jnp.max(jnp.abs(g))) for g in
               jax.tree_util.tree_leaves(grads))
    finite = all(bool(jnp.all(jnp.isfinite(g))) for g in
                 jax.tree_util.tree_leaves(grads))
    print(f"stage1 parity rel={rel:.2e} (flax {ref:.5f}) grad_max={gmax:.3g} "
          f"finite={finite}", flush=True)
    assert finite and rel < 3e-2


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    t0 = time.time()
    stage1()
    bench_train.K = 8
    for tag, ov in (("fused-adapt-vjp", []),  # auto -> fused on axon
                    ("flax", ["trainer.fused_forward=false"])):
        try:
            bench_train.bench_mode(
                f"adapterbit_train_step_b32 K=8 A/B [{tag}]",
                ["adapt=adapter"] + ov, B=32)
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] FAILED: {str(e).splitlines()[0][:300]}",
                  flush=True)
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
