#!/usr/bin/env python
"""Mosaic capability probe #2: exact-GELU erf and batched dot_general."""
import json
import sys
from pathlib import Path

sys.path.insert(0, str(Path(__file__).resolve().parent.parent))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl


def run(name, kernel, x, out_shape):
    try:
        r = jax.jit(pl.pallas_call(kernel, out_shape=out_shape))(x)
        jax.block_until_ready(r)
        print(json.dumps({"cap": name, "ok": True}), flush=True)
    except Exception as e:  # noqa: BLE001
        print(json.dumps({"cap": name, "ok": False, "err": str(e)[:160]}),
              flush=True)


x = jnp.asarray(np.random.default_rng(0).standard_normal(
    (64, 64, 96)).astype(np.float32))


def k_erf(x_ref, o_ref):
    o_ref[:] = jax.nn.gelu(x_ref[:], approximate=False)


run("gelu_erf", k_erf, x, jax.ShapeDtypeStruct((64, 64, 96), jnp.float32))


def k_batched_dot(x_ref, o_ref):
    a = x_ref[:, :, :24]  # (64 windows, 64, 24)
    o_ref[:] = jax.lax.dot_general(a, a, (((2,), (2,)), ((0,), (0,))),
                                   preferred_element_type=jnp.float32)


run("batched_dot", k_batched_dot, x,
    jax.ShapeDtypeStruct((64, 64, 64), jnp.float32))

q = jnp.asarray(np.random.default_rng(1).standard_normal(
    (4096, 96)).astype(np.float32))


def k_bigslice_dot(q_ref, o_ref):
    a = q_ref[0:64, 0:24]
    b = q_ref[64:128, 0:24]
    o_ref[:] = jax.lax.dot_general(a, b, (((1,), (1,)), ((), ())),
                                   preferred_element_type=jnp.float32)


run("sliced_tiny_dot", k_bigslice_dot, q,
    jax.ShapeDtypeStruct((64, 64), jnp.float32))
