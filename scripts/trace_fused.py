#!/usr/bin/env python
"""Device-trace the fused serving forward + the split3 frontend."""
import glob
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from pseldnets_tpu.config import compose
from pseldnets_tpu.models import build_model
from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
from pseldnets_tpu.serving import htsat_fused_forward

B = 128
cfg = compose(str(REPO / "configs"), "train",
              ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
variables = jax.jit(lambda r, f: model.init({"params": r}, f, train=False))(
    jax.random.PRNGKey(0), jnp.zeros((2, 7, 1001, 64), jnp.float32))
feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                          jnp.float32) * 0.1
wav = jax.random.normal(jax.random.PRNGKey(2), (B, 4, 240000),
                        jnp.float32) * 0.1

mstep = jax.jit(lambda v, f, k: htsat_fused_forward(model, v, f * (1 + 1e-4 * k))
                ["multi_accdoa"].astype(jnp.float32).mean())
fstep = jax.jit(lambda w, k: fused_logmel_iv(w * (1 + 1e-4 * k),
                                             split3=True).mean())
_ = float(mstep(variables, feats, jnp.int32(0)))
_ = float(fstep(wav, jnp.int32(0)))
print("compiled", flush=True)
with jax.profiler.trace("/tmp/fusedtrace"):
    for i in range(3):
        _ = float(mstep(variables, feats, jnp.int32(i + 1)))
    for i in range(3):
        _ = float(fstep(wav, jnp.int32(i + 1)))
print(sorted(glob.glob("/tmp/fusedtrace/plugins/profile/*"))[-1], flush=True)
