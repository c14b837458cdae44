#!/usr/bin/env python
"""Known-good tiny kernel compile: relay compile-helper health probe."""
import sys, time
sys.path.insert(0, '/root/repo')
import numpy as np, jax, jax.numpy as jnp
from pseldnets_tpu.models.htsat import SwinTransformerBlock
from pseldnets_tpu.ops.pallas.swin_block_vjp import swin_block_train
H = W = 8; C, NH, WIN, SH = 32, 2, 4, 2; B = 2
blk = SwinTransformerBlock(dim=C, input_resolution=(H, W), num_heads=NH,
                           window_size=WIN, shift_size=SH)
r = np.random.default_rng(0)
x = jnp.asarray(r.standard_normal((B, H*W, C)).astype(np.float32))
p = blk.init(jax.random.PRNGKey(0), x)["params"]
masks = jnp.ones((B, 2), jnp.float32)
fn = lambda p, x: swin_block_train(x, p, masks, H, W, NH, WIN, SH, jnp.bfloat16, False)
t0 = time.time()
jax.jit(fn).lower(p, x).compile()
print(f"known-good fwd compile ok in {time.time()-t0:.1f}s", flush=True)
