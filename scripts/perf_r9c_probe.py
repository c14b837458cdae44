#!/usr/bin/env python
"""Probe R9C (round 5): PaSST full-model serving with the r9a winners.

r9a (per-block, production shape N=602 C=768 nh=12): G=1 beats the G=2
default 10.28 vs 11.99 ms/block (smaller grid cells pipeline better);
every elementwise ablation (softmax/gelu/ln) was a wash — the block cost
is the dot schedule + layout, so the lever is structural.

This probe A/Bs the FULL passt_fused_forward at B=128 exp2 across the
group/mlp settings, sweeps B at the winning config, and re-checks the two
Mosaic deinterleave rejections (PERF.md frontend lever #1 correction —
round-5 item #4): the prep-fold is blocked by in-kernel stride-2
deinterleave, not by hop parity.

Quiet box required.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import bench_all  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402

K = 32


def clips(dt, B, clip_sec=10.0):
    return (B / dt) / (60.0 / clip_sec)


def passt_full_sweep(variants, Bs=(128,)):
    from pseldnets_tpu.serving import passt_fused_forward

    cfg, model = bench_all._build(["model=passt", "loss=multi_accdoa"])
    f0 = jax.random.normal(jax.random.PRNGKey(1), (2, 7, 1001, 64),
                           jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r, "patchout": r}, f, train=False))(
            jax.random.PRNGKey(0), f0)

    for B in Bs:
        feats = jax.random.normal(jax.random.PRNGKey(2), (B, 7, 1001, 64),
                                  jnp.float32) * 0.3
        jax.block_until_ready(feats)
        for tag, kw in variants:
            try:
                dt = bench_all._k_time(
                    lambda k, f, v, kw=kw: passt_fused_forward(
                        model, v, f * (1.0 + 1e-4 * k), attn_impl="exp2",
                        **kw)["multi_accdoa"].astype(jnp.float32).mean(),
                    (feats, variables), K=K)
                print(f"passt B={B} {tag}: {dt*1000:.3f} ms/batch = "
                      f"{clips(dt, B):.1f} clips/s", flush=True)
            except Exception as e:  # noqa: BLE001
                print(f"passt B={B} {tag} FAILED: "
                      f"{str(e).splitlines()[0][:200]}", flush=True)
        del feats


def mosaic_deinterleave_checks():
    """AOT compile checks (no chip claim): the two in-kernel stride-2
    deinterleave forms PERF.md lever #1 depends on. If either ever becomes
    legal, the frontend prep fold opens up."""
    import numpy as np
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    def k_stride(x_ref, o_ref):
        o_ref[:] = x_ref[:][:, 0::2]

    def k_reshape(x_ref, o_ref):
        R, L = x_ref.shape
        o_ref[:] = x_ref[:].reshape(R, L // 2, 2)[:, :, 0]

    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (256, 512)), jnp.float32)
    for tag, kern in (("lane stride-2 slice", k_stride),
                      ("lane reshape-split", k_reshape)):
        try:
            fn = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec((256, 512), lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((256, 256), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((256, 256), jnp.float32),
            )
            jax.jit(fn).lower(x).compile()
            print(f"mosaic {tag}: COMPILES (lever #1 re-opens!)", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"mosaic {tag}: rejected ({str(e).splitlines()[0][:120]})",
                  flush=True)


def calib_true():
    """DCE-proof in-Pallas dense matmul ceiling (r9a's calib sliced f[:, :C]
    so Mosaic could skip 3/4 of each dot's columns — its 204 TMAC/s reading
    is 2x the v5e spec and untrustworthy). Here every output column feeds
    the next rep: sum of the 4 column blocks."""
    import numpy as np
    from functools import partial
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    R, C, H = 1204, 768, 3072
    REPS, B, G = 4, 128, 2

    def kern(x_ref, w_ref, o_ref):
        acc = x_ref[:].reshape(R, C).astype(jnp.bfloat16)
        for _ in range(REPS):
            f = jnp.dot(acc, w_ref[:], preferred_element_type=jnp.float32)
            acc = (f[:, :C] + f[:, C:2 * C] + f[:, 2 * C:3 * C]
                   + f[:, 3 * C:]).astype(jnp.bfloat16)
        o_ref[:] = acc.reshape(G, R // G, C)

    w = jnp.asarray(np.random.default_rng(1).normal(0, 0.02, (C, H)),
                    jnp.bfloat16)
    x = (jax.random.normal(jax.random.PRNGKey(3), (B, R // G, C),
                           jnp.float32) * 0.3).astype(jnp.bfloat16)
    jax.block_until_ready(x)

    def fn(k0, xx):
        s = (1.0 + 1e-4 * k0.astype(jnp.float32)).astype(xx.dtype)
        out = pl.pallas_call(
            kern,
            grid=(B // G,),
            in_specs=[pl.BlockSpec((G, R // G, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
                      pl.BlockSpec((C, H), lambda b: (0, 0),
                                   memory_space=pltpu.VMEM)],
            out_specs=pl.BlockSpec((G, R // G, C), lambda b: (b, 0, 0),
                                   memory_space=pltpu.VMEM),
            out_shape=jax.ShapeDtypeStruct((B, R // G, C), jnp.bfloat16),
            compiler_params=pltpu.CompilerParams(
                vmem_limit_bytes=96 * 1024 * 1024),
        )(xx * s, w)
        return out.astype(jnp.float32).mean()

    dt = bench_all._k_time(fn, (x,), K=K)
    macs = (B // G) * REPS * R * C * H
    print(f"calib_true: {dt*1000:.3f} ms for {macs/1e9:.1f}G MACs = "
          f"{macs/dt/1e12:.1f} TMAC/s in-Pallas ceiling", flush=True)


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    t0 = time.time()
    mosaic_deinterleave_checks()
    calib_true()
    variants = [
        ("G=default(2)", {}),
        ("G=1", {"group": 1}),
        ("G=1 mlp602", {"group": 1, "mlp_min_rows": 602}),
    ]
    passt_full_sweep(variants, Bs=(128,))
    # B sweep at the winner (edit after first results if G=1 isn't it)
    passt_full_sweep([("G=1", {"group": 1})], Bs=(256,))
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
