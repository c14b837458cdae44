#!/usr/bin/env python
"""Probe R7B (round 4): name the stage-0 'structural remainder' (VERDICT #2).

r5f/r5h measured stage0 at 3.7 ms/block with GELU+LN+softmax+winpart all
nulled, against a PERF.md '~0.5 ms MXU+IO floor'. That floor was computed
UNPADDED; counting what the MXU actually executes (every dot's K and N dims
padded to 128 lanes), headdot's schedule per image is
  q/k/vp per-head dots  4h x 3 x (4096x128x128)  = 805M padded MACs
  scores + PV (paired)  2 x 4h x 32 x (128x128x128) = 536M
  mlp fc1/fc2           4096x128x384 x 2          = 402M
= 1.74G padded MACs/image -> x128 images / 98.5T MACs/s ~= 2.26 ms/block of
pure MXU tile time. This probe validates that arithmetic on-chip:

1. calib:   a dense (4096,128)x(128,512) matmul-only kernel -> achievable
            in-kernel padded-MACs/s (MXU ceiling through pallas).
2. dots:    the exact headdot dot schedule with ALL elementwise removed
            (no LN/softmax/bias/mask/residual; raw s consumed as e).
            If this lands ~2.3-3 ms the 'remainder' is just the padded dot
            schedule at realistic utilization — named, not mysterious.
3. qkpad:   all 4 heads' q|k in ONE dot against a (C, nh*128*2) zero-padded
            weight; per-head views then sit at 128-lane tile boundaries
            (free) and the scores dot contracts the padded 128 lanes
            directly (zeros contribute 0 — same MXU pass the 24-lane
            contraction costs anyway). Same padded-MAC count as headdot's
            8 separate q/k dots; tests whether dot COUNT (dispatch/drain)
            matters at fixed tile count.

Quiet box required.
"""

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

B = 128
K = 32
ITERS = 3
H = W = 64
C = 96
NH = 4
WIN = 8
N = WIN * WIN
NW = (H // WIN) * (W // WIN)
PAIR = 2
NP_ = PAIR * N
NWP = NW // PAIR
L = H * W
HD = C // NH
HID = 4 * C


def k_time(fn, args, K=K, iters=ITERS):
    def step(kk, *a):
        def body(i, acc):
            return acc + fn(jnp.float32(1.0 + 1e-4 * (kk * K + i)), *a)
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    jstep = jax.jit(step)
    _ = float(jstep(jnp.int32(0), *args))
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(jstep(jnp.int32(i + 1), *args))
    return (time.perf_counter() - t0) / (iters * K)


def calib_kernel(x_ref, w_ref, o_ref):
    o_ref[:] = jnp.dot(x_ref[:], w_ref[:],
                       preferred_element_type=jnp.float32).astype(jnp.bfloat16)


def run_calib():
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, Kc, Nc = 4096, 128, 512
    G = 2
    x = jax.random.normal(jax.random.PRNGKey(0), (B, R, Kc), jnp.bfloat16)
    w = jax.random.normal(jax.random.PRNGKey(1), (Kc, Nc), jnp.bfloat16)

    def call(scale, x, w):
        y = pl.pallas_call(
            calib_kernel,
            grid=(B // G,),
            in_specs=[pl.BlockSpec((G, R, Kc), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((Kc, Nc), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, R, Nc), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, R, Nc), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x * scale.astype(x.dtype), w)
        return y.astype(jnp.float32).mean()

    dt = k_time(call, (x, w))
    macs = B * R * Kc * Nc
    print(f"calib (4096x128x512 dense): {dt*1000:.3f} ms/batch = "
          f"{macs/dt/1e12:.1f}T padded MACs/s", flush=True)
    return macs / dt


def dots_kernel(x_ref, wqk_ref, wvp_ref, fc1_ref, fc2_ref, o_ref, *,
                G, variant):
    cd = jnp.bfloat16
    win = x_ref[:].reshape(G * L, C)
    acc = None
    if variant == "qkpad":
        # one dot, all heads: (R, C) @ (C, NH*128*2); head h's q at lanes
        # [128h:128h+128] (hd=24 used + 104 zero), k at [512+128h:...].
        qk = jnp.dot(win, wqk_ref[:].astype(cd),
                     preferred_element_type=jnp.float32).astype(cd)
        for hh in range(NH):
            q = qk[:, 128 * hh:128 * (hh + 1)].reshape(G * NWP, NP_, 128)
            k = qk[:, 512 + 128 * hh:512 + 128 * (hh + 1)].reshape(
                G * NWP, NP_, 128)
            vp = jnp.dot(win, wvp_ref[hh].astype(cd),
                         preferred_element_type=jnp.float32).astype(cd)
            vp = vp.reshape(G * NWP, NP_, C)
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(s.astype(cd), vp,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
    else:  # headdot: per-head q,k dots exactly as production
        for hh in range(NH):
            q = jnp.dot(win, wqk_ref[0, hh].astype(cd),
                        preferred_element_type=jnp.float32
                        ).astype(cd).reshape(G * NWP, NP_, HD)
            k = jnp.dot(win, wqk_ref[1, hh].astype(cd),
                        preferred_element_type=jnp.float32
                        ).astype(cd).reshape(G * NWP, NP_, HD)
            vp = jnp.dot(win, wvp_ref[hh].astype(cd),
                         preferred_element_type=jnp.float32).astype(cd)
            vp = vp.reshape(G * NWP, NP_, C)
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            o = jax.lax.dot_general(s.astype(cd), vp,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            acc = o if acc is None else acc + o
    attn = acc.reshape(G * L, C).astype(cd)
    h1 = jnp.dot(attn, fc1_ref[:].astype(cd),
                 preferred_element_type=jnp.float32).astype(cd)
    y = jnp.dot(h1, fc2_ref[:].astype(cd),
                preferred_element_type=jnp.float32).astype(cd)
    o_ref[:] = y.reshape(G, L, C)


def run_dots(variant):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    G = 2
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.standard_normal((B, L, C)) * 0.1, jnp.bfloat16)
    if variant == "qkpad":
        wqk = np.zeros((C, NH * 128 * 2), np.float32)
        for hh in range(NH):
            wqk[:, 128 * hh:128 * hh + HD] = rng.standard_normal((C, HD)) * .1
            wqk[:, 512 + 128 * hh:512 + 128 * hh + HD] = (
                rng.standard_normal((C, HD)) * .1)
        wqk = jnp.asarray(wqk)
        qk_spec_shape = (C, NH * 256)
    else:
        wqk = jnp.asarray(rng.standard_normal((2, NH, C, HD)) * .1,
                          jnp.float32)
        qk_spec_shape = (2, NH, C, HD)
    wvp = jnp.asarray(rng.standard_normal((NH, C, C)) * .1, jnp.float32)
    fc1 = jnp.asarray(rng.standard_normal((C, HID)) * .1, jnp.float32)
    fc2 = jnp.asarray(rng.standard_normal((HID, C)) * .1, jnp.float32)

    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)

    def call(scale, x, wqk, wvp, fc1, fc2):
        y = pl.pallas_call(
            partial(dots_kernel, G=G, variant=variant),
            grid=(B // G,),
            in_specs=[pl.BlockSpec((G, L, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      const(*qk_spec_shape), const(NH, C, C),
                      const(C, HID), const(HID, C)],
            out_specs=pl.BlockSpec((G, L, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, L, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=100 * 1024 * 1024),
        )(x * scale.astype(x.dtype), wqk, wvp, fc1, fc2)
        return y.astype(jnp.float32).mean()

    dt = k_time(call, (x, wqk, wvp, fc1, fc2))
    macs = B * (805 + 536 + 402) * 1e6  # padded-MAC model above
    print(f"dots-only [{variant}]: {dt*1000:.3f} ms/block "
          f"(padded-MAC model util {macs/dt/98.5e12*100:.0f}% of peak)",
          flush=True)


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    t0 = time.time()
    run_calib()
    run_dots("headdot")
    run_dots("qkpad")
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
