#!/usr/bin/env python
"""Probe R3A: per-block vs whole-stage-v2 fused HTSAT forward on-chip (K=4).

Round-2's v1 stage kernel (fully-unrolled multi-block Mosaic body) hung
>35 min in compile twice; swin_stage_fused_v2 restructures as a grid over
(batch, depth) with per-block weight BlockSpecs. This decides whether
serving flips to the stage kernel (docs/PERF.md round-3 item 1)."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

B = 128


def k_amortized(name, body, args, K=4, iters=4):
    @jax.jit
    def step(k0, *args):
        acc = jnp.float32(0)
        for i in range(K):
            acc = acc + body(k0 * K + i, *args)
        return acc

    t0 = time.time()
    _ = float(step(jnp.int32(0), *args))
    compile_s = time.time() - t0
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(jnp.int32(i + 1), *args))
    dt = (time.perf_counter() - t0) / (iters * K)
    print(f"{name}: compile {compile_s:.1f}s steady {dt*1000:.2f} ms",
          flush=True)
    return dt


def stage_forward(model, variables, x, compute_dtype=jnp.bfloat16):
    """htsat_fused_forward with the v2 whole-stage kernel swapped in."""
    from pseldnets_tpu.ops.pallas.swin_block import swin_stage_fused_v2
    from pseldnets_tpu.serving import htsat as sh

    p = variables["params"]
    stats = variables["batch_stats"]
    kw = dict(model.encoder_kwargs)
    spec_size = kw.get("spec_size", 256)
    patch_stride = tuple(kw.get("patch_stride", (4, 4)))
    depths = tuple(kw.get("depths", (2, 2, 6, 2)))
    num_heads = tuple(kw.get("num_heads", (4, 8, 16, 32)))
    window = kw.get("window_size", 8)
    num_layers = len(depths)
    freq_ratio = spec_size // model.mel_bins
    time_res = patch_stride[1] * 2 ** (num_layers - 1)

    Bx, C, T, F = x.shape
    output_frames = T // model.pred_res
    x = sh._scalar_bn(x, p["scalar"], stats["scalar"]).astype(compute_dtype)
    x = sh._reshape_wav2img(x, spec_size, freq_ratio)
    pe = p["encoder"]["patch_embed"]
    x = jnp.transpose(x, (0, 2, 3, 1))
    kern = jnp.asarray(sh._dense_p(pe["proj"])["kernel"], compute_dtype)
    patch_size = kw.get("patch_size", 4)
    ph = (patch_size - patch_stride[0]) // 2
    pw = (patch_size - patch_stride[1]) // 2
    x = jax.lax.conv_general_dilated(
        x, kern, window_strides=patch_stride, padding=((ph, ph), (pw, pw)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    x = (x + sh._dense_p(pe["proj"])["bias"]).astype(compute_dtype)
    Bp, Hg, Wg, E = x.shape
    x = x.reshape(Bp, Hg * Wg, E)
    x = sh._ln(x, pe["norm"])
    for i in range(num_layers):
        Hi, Wi = Hg // (2 ** i), Wg // (2 ** i)
        w_i, base_shift = (window, window // 2)
        if min(Hi, Wi) <= window:
            w_i, base_shift = min(Hi, Wi), 0
        lp = p["encoder"][f"layers_{i}"]
        x = swin_stage_fused_v2(
            x, [lp[f"blocks_{j}"] for j in range(depths[i])],
            H=Hi, W=Wi, nh=num_heads[i], window=w_i,
            shifts=[0 if j % 2 == 0 else base_shift
                    for j in range(depths[i])],
            compute_dtype=compute_dtype)
        if i < num_layers - 1:
            dm = lp["downsample"]
            v = x.reshape(Bp, Hi, Wi, -1)
            v = jnp.concatenate([v[:, 0::2, 0::2], v[:, 1::2, 0::2],
                                 v[:, 0::2, 1::2], v[:, 1::2, 1::2]], axis=-1)
            v = v.reshape(Bp, (Hi // 2) * (Wi // 2), -1)
            v = sh._ln(v, dm["norm"])
            x = jnp.dot(v.astype(compute_dtype),
                        jnp.asarray(sh._dense_p(dm["reduction"])["kernel"],
                                    compute_dtype),
                        preferred_element_type=jnp.float32).astype(compute_dtype)
    x = sh._ln(x, p["encoder"]["norm"])
    Bp, N, Cf = x.shape
    SFt = spec_size // (2 ** (num_layers - 1)) // patch_stride[0]
    STt = spec_size // (2 ** (num_layers - 1)) // patch_stride[1]
    x = jnp.transpose(x, (0, 2, 1)).reshape(Bp, Cf, SFt, STt)
    c_freq_bin = SFt // freq_ratio
    x = x.reshape(Bp, Cf, SFt // c_freq_bin, c_freq_bin, STt)
    x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(Bp, Cf, c_freq_bin, -1)
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(compute_dtype)
    tk = jnp.asarray(p["tscam_conv"]["kernel"], compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, tk, window_strides=(1, 1), padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    x = (x + p["tscam_conv"]["bias"]).astype(compute_dtype)
    x = x.reshape(x.shape[0], -1, x.shape[-1])
    from pseldnets_tpu.models.common import _linear_upsample_matrix

    m = jnp.asarray(_linear_upsample_matrix(x.shape[1], time_res), x.dtype)
    x = jnp.einsum("st,btc->bsc", m, x, precision=jax.lax.Precision.HIGHEST)
    x = x[:, : model.tgt_output_frames * model.pred_res]
    x = x.reshape(Bx, output_frames, model.pred_res, -1).mean(axis=2)
    return {"multi_accdoa": jnp.tanh(x.astype(jnp.float32))}


def main():
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv
    from pseldnets_tpu.serving import htsat_fused_forward

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13, dtype=jnp.bfloat16)
    extractor = lambda w: fused_logmel_iv(w, split3=True)  # noqa: E731
    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)
    feats0 = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    variables = jax.jit(
        lambda r, f: model.init({"params": r}, f, train=False)
    )(jax.random.PRNGKey(0), feats0)
    fbase = jax.jit(extractor)(base)
    jax.block_until_ready(fbase)
    print("warmup done, measuring per-block", flush=True)

    blk = k_amortized(
        "per-BLOCK fused fwd",
        lambda k, f: htsat_fused_forward(
            model, variables, f * (1.0 + 1e-4 * k))["multi_accdoa"].astype(
                jnp.float32).mean(), (fbase,))
    stg = k_amortized(
        "whole-STAGE-v2 fused fwd",
        lambda k, f: stage_forward(
            model, variables, f * (1.0 + 1e-4 * k))["multi_accdoa"].astype(
                jnp.float32).mean(), (fbase,))
    print(f"stage_v2/block: {stg/blk:.3f} "
          f"({'STAGE WINS' if stg < blk else 'block wins'})", flush=True)
    ref = jax.jit(lambda f: htsat_fused_forward(model, variables,
                                                f))(fbase[:8])
    got = jax.jit(lambda f: stage_forward(model, variables, f))(fbase[:8])
    dev = float(jnp.abs(got["multi_accdoa"] - ref["multi_accdoa"]).max())
    print(f"stage_v2 vs block on-chip max dev: {dev:.5f}", flush=True)


if __name__ == "__main__":
    main()
