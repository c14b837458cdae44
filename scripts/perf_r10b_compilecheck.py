#!/usr/bin/env python
"""R10B: isolate which adapter-VJP kernel hangs the relay compile helper.

Compiles the fwd kernel and the bwd kernel SEPARATELY (AOT lower+compile,
no execution) at a given shape. Usage:
    python scripts/perf_r10b_compilecheck.py {fwd|bwd} {tiny|s0}
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import numpy as np
import jax
import jax.numpy as jnp
import flax

from pseldnets_tpu.models.adapters import AdaptConfig
from pseldnets_tpu.models.htsat import SwinTransformerBlock
from pseldnets_tpu.ops.pallas import swin_block_adapt_vjp as av

which = sys.argv[1] if len(sys.argv) > 1 else "fwd"
size = sys.argv[2] if len(sys.argv) > 2 else "tiny"

if size == "tiny":
    H = W = 8
    C, NH, WIN, SH = 32, 2, 4, 2
else:
    H = W = 64
    C, NH, WIN, SH = 96, 4, 8, 4
B = 2

adapt = AdaptConfig({
    "method": "adapter",
    "adapt_kwargs": {"position": ["MlpAdapter", "SpatialAdapter"],
                     "type": "adapter", "mlp_ratio": 0.5,
                     "adapter_scalar": 0.1, "act_layer": "gelu"}})
blk = SwinTransformerBlock(dim=C, input_resolution=(H, W), num_heads=NH,
                           window_size=WIN, shift_size=SH, adapt=adapt)
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

if which == "fwd":
    fn = lambda p, x: av._fwd_call(
        x, p, masks, H=H, W=W, nh=NH, window=WIN, shift=SH, scale=0.1,
        compute_dtype=jnp.bfloat16, interpret=False)
else:
    dout = jnp.ones((B, H * W, C), jnp.float32)
    fn = lambda p, x: av._bwd_call(
        x, p, masks, dout, H=H, W=W, nh=NH, window=WIN, shift=SH, scale=0.1,
        compute_dtype=jnp.bfloat16, interpret=False)[0]

t0 = time.time()
jax.jit(fn).lower(p, x).compile()
print(f"{which} {size}: compile ok in {time.time()-t0:.1f}s", flush=True)
