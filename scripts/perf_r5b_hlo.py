#!/usr/bin/env python
"""Probe R5B: identify the residual XLA glue in the flagship bench step.

The r5a device profile of the 51 ms step shows ~8 ms outside the Pallas
kernels: copy.212/213/214 (~2.9 ms, expected: the radix-2 decimation
interleave-transpose), maximum_maximum_fusion.3 (1.53 ms) and
broadcast_multiply_fusion.72 (1.49 ms) — the latter two unexplained. AOT-
compile the exact bench step (compile only, no chip claim) and print those
instructions' definitions from the optimized HLO so we know what they compute
and whether they can fold into a kernel.
"""

import re
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

B = 128
K = 4

NAMES = [
    "maximum_maximum_fusion.3", "broadcast_multiply_fusion.72",
    "copy.212", "copy.213", "copy.214", "copy.140",
    "add_convert_fusion.5", "fusion.89", "maximum_maximum_fusion",
    "broadcast_multiply_fusion",
]


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward_from_wav

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    variables = jax.eval_shape(
        lambda r, w: model.init(
            {"params": r}, fused_logmel_iv(w, split3=True), train=False),
        jax.random.PRNGKey(0),
        jax.ShapeDtypeStruct((2, 4, 240000), jnp.float32))

    def step(v, w, k):
        def body(i, acc):
            out = htsat_fused_forward_from_wav(
                model, v, w, wav_scale=1.0 + 1e-4 * (k * K + i))
            return acc + out["multi_accdoa"].astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    w = jax.ShapeDtypeStruct((B, 4, 240000), jnp.float32)
    compiled = (jax.jit(step)
                .lower(variables, w, jax.ShapeDtypeStruct((), jnp.int32))
                .compile())
    txt = compiled.as_text()
    print(f"HLO: {len(txt.splitlines())} lines", flush=True)
    for name in NAMES:
        # definition line (fusion roots include the called computation name)
        for line in txt.splitlines():
            s = line.strip()
            if s.startswith(f"%{name} ") or s.startswith(f"{name} ") or \
               f" {name} = " in s or s.startswith(f"%{name}="):
                print("DEF:", s[:400], flush=True)
        # the fused computation body, if present
        m = re.search(rf"%fused_computation[^\n]*{re.escape(name)}", txt)
    # also dump every fusion computation whose name matches the two mysteries
    for comp in re.finditer(r"%(\S*?(?:maximum_maximum|broadcast_multiply)\S*?) \(",
                            txt):
        print("COMP:", comp.group(1)[:200], flush=True)


if __name__ == "__main__":
    main()
