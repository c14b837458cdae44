#!/usr/bin/env python
"""Find a Mosaic-legal in-kernel formulation of PatchMerging's 2x2
neighbor select+concat.

The merge fold (swin_block.py merge=True) fails on real TPU with
"Not implemented: result/input offset mismatch on non-concat dimension" at
the lane-concat of the four strided 6-D views (line 264) — interpret mode
can't see Mosaic layout legality. Each candidate below expresses
  out (G*L, C) -> cat (G*L//4, 4C) with cat[r] = [x(2i,2j), x(2i+1,2j),
  x(2i,2j+1), x(2i+1,2j+1)]  (the reference PatchMerging order,
  models/htsat.py PatchMerging / reference model_utilities.py)
with different primitives; the probe compiles each standalone at a small
shape and reports compile-ok + max dev vs the numpy oracle.

Result (v5e, 2026-08-18): see bottom docstring update after run.
"""

import functools
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

G, H, W, C = 4, 16, 16, 96  # production stage-0 C (unaligned lane offsets)
L = H * W


def oracle(x):
    v = x.reshape(G, H // 2, 2, W // 2, 2, C)
    return np.concatenate([v[:, :, 0, :, 0], v[:, :, 1, :, 0],
                           v[:, :, 0, :, 1], v[:, :, 1, :, 1]],
                          axis=-1).reshape(G * L // 4, 4 * C)


def k_current(x_ref, o_ref):
    out = x_ref[:]
    v = out.reshape(G, H // 2, 2, W // 2, 2, C)
    cat = jnp.concatenate([v[:, :, 0, :, 0], v[:, :, 1, :, 0],
                           v[:, :, 0, :, 1], v[:, :, 1, :, 1]], axis=-1)
    o_ref[:] = cat.reshape(G * L // 4, 4 * C)


def k_reshaped_views(x_ref, o_ref):
    out = x_ref[:]
    v = out.reshape(G, H // 2, 2, W // 2, 2, C)
    ps = [v[:, :, 0, :, 0], v[:, :, 1, :, 0], v[:, :, 0, :, 1],
          v[:, :, 1, :, 1]]
    ps = [p.reshape(G * L // 4, C) for p in ps]
    o_ref[:] = jnp.concatenate(ps, axis=-1)


def k_mid_index(x_ref, o_ref):
    # row-major tokens: idx = (2*h2+hb)*W + 2*w2+wb. Split w parity via a
    # (R,2,C) reshape + middle index; split h parity via a (.,2,.) reshape
    # one level up.
    out = x_ref[:]
    v = out.reshape(G * (H // 2), 2, (W // 2), 2, C)
    ps = [v[:, 0, :, 0], v[:, 1, :, 0], v[:, 0, :, 1], v[:, 1, :, 1]]
    ps = [p.reshape(G * L // 4, C) for p in ps]
    o_ref[:] = jnp.concatenate(ps, axis=-1)


def k_roll_halves(x_ref, o_ref):
    # Build each piece with full-width rolls only (no strided views):
    # even/odd w-pairs live in adjacent (..., 2C) lane halves after a
    # (G*H, W//2, 2C) reshape -> lane slice at aligned offsets 0 / C.
    out = x_ref[:]
    a = out.reshape(G * H * (W // 2), 2 * C)
    w0 = a[:, :C]
    w1 = a[:, C:]
    # h parity: rows of (G*H, W//2, C) -> split (G*(H//2), 2, W//2, C)
    w0 = w0.reshape(G * (H // 2), 2, (W // 2), C)
    w1 = w1.reshape(G * (H // 2), 2, (W // 2), C)
    ps = [w0[:, 0], w0[:, 1], w1[:, 0], w1[:, 1]]
    ps = [p.reshape(G * L // 4, C) for p in ps]
    o_ref[:] = jnp.concatenate(ps, axis=-1)


def k_sum_dots(x_ref, w_ref, o_ref):
    # no concat at all: pieces stay separate, the 4C->K reduction is the sum
    # of four C->K dots (LN omitted here; legality of select is the point)
    out = x_ref[:]
    a = out.reshape(G * H * (W // 2), 2 * C)
    w0 = a[:, :C].reshape(G * (H // 2), 2, (W // 2), C)
    w1 = a[:, C:].reshape(G * (H // 2), 2, (W // 2), C)
    ps = [w0[:, 0], w0[:, 1], w1[:, 0], w1[:, 1]]
    acc = jnp.zeros((G * L // 4, 2 * C), jnp.float32)
    for i, p in enumerate(ps):
        acc = acc + jnp.dot(p.reshape(G * L // 4, C),
                            w_ref[i * C:(i + 1) * C, :],
                            preferred_element_type=jnp.float32)
    o_ref[:] = acc


def run(name, kern, extra=None):
    x = jnp.asarray(np.random.RandomState(0).randn(G * L, C), jnp.float32)
    outs = jax.ShapeDtypeStruct((G * L // 4, 4 * C), jnp.float32)
    args = [x]
    if extra is not None:
        args.append(extra)
        outs = jax.ShapeDtypeStruct((G * L // 4, 2 * C), jnp.float32)
    try:
        t0 = time.perf_counter()
        f = pl.pallas_call(kern, out_shape=outs)
        y = np.asarray(jax.jit(f)(*args))
        dt = time.perf_counter() - t0
        if extra is not None:
            ref = oracle(np.asarray(x)) @ np.asarray(extra)
        else:
            ref = oracle(np.asarray(x))
        print(f"[{name}] OK compile+run {dt:.1f}s  max dev "
              f"{np.abs(y - ref).max():.2e}", flush=True)
        return True
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        key = [ln for ln in msg.splitlines() if "Mosaic" in ln or
               "Not implemented" in ln or "unsupported" in ln]
        print(f"[{name}] FAIL: {(key[0] if key else msg.splitlines()[0])[:160]}",
              flush=True)
        return False


if __name__ == "__main__":
    wred = jnp.asarray(np.random.RandomState(1).randn(4 * C, 2 * C) * 0.05,
                       jnp.float32)
    run("current-6d-views", k_current)
    run("reshaped-views", k_reshaped_views)
    run("mid-index", k_mid_index)
    run("roll-halves", k_roll_halves)
    run("sum-dots", functools.partial(k_sum_dots), extra=wred)
