#!/usr/bin/env python
"""Micro-probe 2: in-kernel deinterleave via reshape-split of the lane dim
((R, 2h) -> (R, h, 2) -> [..., p]) — the strided-slice path is rejected by
Pallas indexing (ValueError), this is the remaining candidate lowering."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def main():
    R, L = 1024, 480

    def kern(x_ref, e_ref, o_ref):
        x = x_ref[...]
        x3 = x.reshape(x.shape[0], L // 2, 2)
        e_ref[...] = x3[..., 0]
        o_ref[...] = x3[..., 1]

    @jax.jit
    def f(x):
        return pl.pallas_call(
            kern,
            out_shape=(jax.ShapeDtypeStruct((R, L // 2), jnp.float32),
                       jax.ShapeDtypeStruct((R, L // 2), jnp.float32)),
        )(x)

    x = jnp.asarray(np.random.default_rng(0).standard_normal((R, L)),
                    jnp.float32)
    try:
        e, o = f(x)
        e, o = np.asarray(e), np.asarray(o)
        ok_e = np.array_equal(e, np.asarray(x)[:, 0::2])
        ok_o = np.array_equal(o, np.asarray(x)[:, 1::2])
        print(f"reshape-split deinterleave: COMPILES, parity e={ok_e} "
              f"o={ok_o}", flush=True)
    except Exception as ex:  # noqa: BLE001
        print(f"reshape-split deinterleave: FAILS: {type(ex).__name__}: "
              f"{str(ex)[:400]}", flush=True)
        return

    # throughput on the production-sized slab
    B, C, T = 128, 4, 240_000
    sig = jax.random.normal(jax.random.PRNGKey(1), (B, C, T), jnp.float32)
    jax.block_until_ready(sig)
    rows, hh2 = T // 480, 480

    def kern2(x_ref, e_ref, o_ref):
        x = x_ref[...]
        x3 = x.reshape(x.shape[0], hh2 // 2, 2)
        e_ref[...] = x3[..., 0]
        o_ref[...] = x3[..., 1]

    @jax.jit
    def deint(s, k):
        s = s * (1.0 + 1e-4 * k)
        x = s.reshape(B * C * rows, hh2)
        e, o = pl.pallas_call(
            kern2,
            grid=(B,),
            in_specs=[pl.BlockSpec((C * rows, hh2), lambda i: (i, 0))],
            out_specs=(pl.BlockSpec((C * rows, hh2 // 2), lambda i: (i, 0)),
                       pl.BlockSpec((C * rows, hh2 // 2), lambda i: (i, 0))),
            out_shape=(jax.ShapeDtypeStruct((B * C * rows, hh2 // 2),
                                            jnp.float32),
                       jax.ShapeDtypeStruct((B * C * rows, hh2 // 2),
                                            jnp.float32)),
        )(x)
        return e[0, 0] + o[0, 0] + e[-1, -1] + o[-1, -1]

    @jax.jit
    def xla_t(s, k):
        s = s * (1.0 + 1e-4 * k)
        r = s.reshape(B, C, rows, hh2 // 2, 2)
        rt = jnp.transpose(r, (0, 4, 1, 2, 3))
        return rt[0, 0, 0, 0, 0] + rt[-1, -1, -1, -1, -1]

    for name, fn in (("pallas deint", deint), ("xla transpose", xla_t)):
        _ = float(fn(sig, jnp.int32(0)))
        t0 = time.perf_counter()
        iters = 8
        for i in range(iters):
            _ = float(fn(sig, jnp.int32(i + 1)))
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: {dt*1000:.2f} ms (incl ~25 ms RTT + scale pass)",
              flush=True)


if __name__ == "__main__":
    main()
