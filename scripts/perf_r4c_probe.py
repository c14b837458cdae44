#!/usr/bin/env python
"""Probe R4C: CNN trunk pooling + BN lowering A/B at production shapes.

The r4a profile of cnn14_accdoa (112.6 ms/batch device total) shows
~28.9 ms/batch in convert_reduce_fusion (the six nn.avg_pool reduce-windows)
and 56.6 ms in generic fusions. Candidates, measured on the full CNN12
trunk (B=128, 1000x64 spec, bf16):

  flax      : ConvBlock as-is (nn.avg_pool, BN at eval)
  sliceadd  : avg_pool via strided-slice adds (elementwise, fusable)
  fold      : BN folded into conv kernels (eval-only identity) + sliceadd
  foldpool  : BN folded + nn.avg_pool (isolate the two changes)

All four are mathematically identical at eval time (fp-assoc noise only).
Quiet box required for the wall numbers.
"""

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

B = 128
K = 16
FEATS = (64, 128, 256, 512, 1024, 2048)
POOLS = [(2, 2), (2, 2), (2, 2), (1, 2), (1, 2), (1, 2)]


def build_params():
    from pseldnets_tpu.models.backbone import CNN

    cnn = CNN(num_features=FEATS, dtype=jnp.bfloat16)
    x0 = jnp.zeros((2, 7, 64, 16), jnp.float32)  # NCHW tiny init
    vs = jax.jit(lambda r: cnn.init({"params": r}, x0, False))(
        jax.random.PRNGKey(0))
    return cnn, vs


def fold_bn(conv_kernel, bn):
    """Return (kernel', bias') folding eval-mode BN into the conv."""
    mean = bn["running_mean"]
    var = bn["running_var"]
    scale = bn["weight"]
    bias = bn["bias"]
    inv = np.asarray(scale) / np.sqrt(np.asarray(var) + 1e-5)
    k = np.asarray(conv_kernel, np.float32) * np.asarray(inv)[None, None, None]
    b = np.asarray(bias) - np.asarray(mean) * np.asarray(inv)
    return jnp.asarray(k, jnp.bfloat16), jnp.asarray(b, jnp.float32)


def pool_slice(x, pool):
    pt, pf = pool
    parts = [x[:, i::pt, j::pf] for i in range(pt) for j in range(pf)]
    s = parts[0].astype(jnp.float32)
    for p in parts[1:]:
        s = s + p.astype(jnp.float32)
    return (s * (1.0 / (pt * pf))).astype(x.dtype)


def trunk_folded(params, stats, x, pool_mode):
    """x NHWC bf16 -> NHWC; BN folded into conv kernels."""
    import flax.linen as nn

    for i, (c, pool) in enumerate(zip(FEATS, POOLS)):
        blk = params[f"conv_block{i + 1}"]
        bst = stats[f"conv_block{i + 1}"]
        for j in (1, 2):
            kern, bias = fold_bn(
                blk[f"conv{j}"]["kernel"],
                dict(running_mean=bst[f"bn{j}"]["bn"]["running_mean"],
                     running_var=bst[f"bn{j}"]["bn"]["running_var"],
                     weight=blk[f"bn{j}"]["bn"]["weight"],
                     bias=blk[f"bn{j}"]["bn"]["bias"]))
            x = jax.lax.conv_general_dilated(
                x, kern, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=jnp.float32)
            x = jax.nn.relu(x + bias).astype(jnp.bfloat16)
        if pool_mode == "slice":
            x = pool_slice(x, pool)
        else:
            x = nn.avg_pool(x, pool, strides=pool)
    return x


def trunk_sliceadd_flax(cnn, vs, x_nchw):
    """flax trunk but with slice-add pooling via monkeypatched avg_pool."""
    import flax.linen as nn

    orig = nn.avg_pool
    nn.avg_pool = lambda x, pool, strides=None: pool_slice(x, pool)
    try:
        out = cnn.apply(vs, x_nchw, False)
    finally:
        nn.avg_pool = orig
    return out


def main():
    cnn, vs = build_params()
    params = jax.tree.map(np.asarray, vs["params"])
    stats = jax.tree.map(np.asarray, vs["batch_stats"])
    base = jax.random.normal(jax.random.PRNGKey(7), (B, 7, 1000, 64),
                             jnp.float32) * 0.5
    base_nhwc = jnp.transpose(base, (0, 2, 3, 1)).astype(jnp.bfloat16)
    jax.block_until_ready(base_nhwc)

    def k_time(fn, *args):
        @jax.jit
        def step(k0, *a):
            return jax.lax.fori_loop(
                0, K, lambda i, acc: acc + fn(jnp.float32(1.0 + 1e-4 *
                                                          (k0 * K + i)), *a),
                jnp.float32(0))

        t0 = time.time()
        _ = float(step(jnp.int32(0), *args))
        compile_s = time.time() - t0
        ts = []
        for it in range(1, 4):
            t0 = time.time()
            _ = float(step(jnp.int32(it), *args))
            ts.append((time.time() - t0) / K)
        return min(ts), compile_s

    # NOTE: inputs ride as jit args (closure constants would bake the 229 MB
    # waveform batch into the trace — bench_all.py lesson)
    variants = {
        "flax": lambda s, v, xh, xc: cnn.apply(
            v, xc * s, False).astype(jnp.float32).mean(),
        "sliceadd": lambda s, v, xh, xc: trunk_sliceadd_flax(
            cnn, v, xc * s).astype(jnp.float32).mean(),
        "fold": lambda s, v, xh, xc: trunk_folded(
            params, stats, xh * s.astype(jnp.bfloat16),
            "slice").astype(jnp.float32).mean(),
        "foldpool": lambda s, v, xh, xc: trunk_folded(
            params, stats, xh * s.astype(jnp.bfloat16),
            "avg").astype(jnp.float32).mean(),
    }

    # parity first (single batch, small)
    ref = np.asarray(cnn.apply(vs, base[:4], False), np.float32)
    got_f = np.asarray(jnp.transpose(
        trunk_folded(params, stats, base_nhwc[:4], "slice"), (0, 3, 1, 2)),
        np.float32)
    print(f"fold-vs-flax max dev: {np.abs(ref - got_f).max():.2e} "
          f"(scale {np.abs(ref).max():.2f})", flush=True)

    for name, fn in variants.items():
        dt, cs = k_time(fn, vs, base_nhwc, base)
        print(f"[{name}] steady {dt * 1000:.2f} ms/batch "
              f"(compile {cs:.0f}s)", flush=True)


if __name__ == "__main__":
    main()
