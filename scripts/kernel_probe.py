#!/usr/bin/env python
"""Frontend-kernel probe on the real chip with relay-proof methodology
(distinct input per iteration, scalar fetched from every output): presplit
split3 at several t_blk, f32 HIGHEST reference, and an XLA bf16 matmul
'speed of light' with the same FLOP volume as split3's three passes.
Prints one JSON line per variant. Run detached (nohup)."""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp

from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

B = int(sys.argv[1]) if len(sys.argv) > 1 else 64
ITERS = 10


def bench(name, fn, make_input):
    try:
        x0 = make_input(0)
        t0 = time.time()
        _ = float(jax.tree_util.tree_leaves(fn(x0))[0].ravel()[0])
        compile_s = time.time() - t0
        xs = [make_input(i + 1) for i in range(ITERS)]
        for xi in xs:
            jax.block_until_ready(xi)
        t0 = time.perf_counter()
        acc = 0.0
        for xi in xs:
            acc += float(jax.tree_util.tree_leaves(fn(xi))[0].ravel()[0])
        ms = (time.perf_counter() - t0) / ITERS * 1000
        print(json.dumps({"variant": name, "B": B, "ms": round(ms, 2),
                          "compile_s": round(compile_s, 1)}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"variant": name, "error": str(e)[:200]}), flush=True)


def mk_wav(i):
    return jax.random.normal(jax.random.PRNGKey(i), (B, 4, 240000),
                             jnp.float32) * 0.1


def main():
    for t_blk in (64, 128, 256):
        bench(f"split3_presplit_tblk{t_blk}",
              jax.jit(lambda w, t=t_blk: fused_logmel_iv(w, split3=True,
                                                         t_blk=t)), mk_wav)
    bench("f32_highest_tblk128",
          jax.jit(lambda w: fused_logmel_iv(w, split3=False)), mk_wav)

    # XLA speed-of-light: 3 bf16 passes x 5 shifts of (B*8*512, 240)@(240,1026)
    M = B * 8 * 512
    ds = jax.random.normal(jax.random.PRNGKey(99), (5, 240, 1026),
                           jnp.bfloat16)

    def mk_a(i):
        return jax.random.normal(jax.random.PRNGKey(1000 + i), (M, 240),
                                 jnp.bfloat16)

    @jax.jit
    def sol(a):
        acc = jnp.zeros((M, 1026), jnp.float32)
        for _p in range(3):
            for j in range(5):
                acc = acc + jnp.dot(a, ds[j],
                                    preferred_element_type=jnp.float32)
        return acc[0, 0]

    bench("xla_bf16_dot_speed_of_light", sol, mk_a)


if __name__ == "__main__":
    main()
