"""Fused-kernel HTSAT inference: the exact eval forward of models.heads.HTSAT
(reference accdoa.py:107-246 / multi_accdoa.py:31-55) with every Swin block
executed by the single-kernel Pallas block (ops.pallas.swin_block) instead of
the ~20 XLA ops per block. Reads the SAME flax variables the training model
uses — no weight conversion, pinned by tests/test_serving_fused.py.

Scope: eval only, no adapters/LoRA (falls back to model.apply if present),
10 s or 5 s clips (the reference's two supported shapes).
"""

from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from ..models import heads
from ..models.common import _linear_upsample_matrix
from ..ops.pallas.swin_block import swin_block_fused

Dtype = Any


def _scalar_bn(x: jnp.ndarray, params: Dict, stats: Dict) -> jnp.ndarray:
    """ScalarBN eval: torch BatchNorm2d semantics, fused (C, F) layout
    (models.common.ScalarBN / TorchBatchNorm, eps 1e-5)."""
    w = params["bn"]["weight"][None, :, None, :]
    b = params["bn"]["bias"][None, :, None, :]
    m = stats["bn"]["running_mean"][None, :, None, :]
    v = stats["bn"]["running_var"][None, :, None, :]
    y = (x.astype(jnp.float32) - m) * jax.lax.rsqrt(v + 1e-5) * w + b
    return y


def _reshape_wav2img(x: jnp.ndarray, spec_size: int, freq_ratio: int) -> jnp.ndarray:
    B, C, T, F = x.shape
    target_T = spec_size * freq_ratio
    x = jnp.pad(x, ((0, 0), (0, 0), (0, target_T - T), (0, 0)))
    x = jnp.transpose(x, (0, 1, 3, 2))
    x = x.reshape(B, C, F, freq_ratio, target_T // freq_ratio)
    x = jnp.transpose(x, (0, 1, 3, 2, 4))
    return x.reshape(B, C, freq_ratio * F, target_T // freq_ratio)


def _ln(x: jnp.ndarray, p: Dict) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.mean((xf - m) ** 2, axis=-1, keepdims=True)
    return ((xf - m) * jax.lax.rsqrt(v + 1e-5) * p["scale"] + p["bias"]).astype(x.dtype)


def _dense_p(d: Dict) -> Dict:
    return d["base"] if "base" in d else d


def htsat_fused_forward(model: "heads.HTSAT", variables, x: jnp.ndarray,
                        compute_dtype: Dtype = jnp.bfloat16,
                        attn_impl: str = "auto",
                        interpret: bool = False,
                        pre_normalized: bool = False,
                        merge_fold: bool = True,
                        nomax=None,
                        patch_embed: str = "einsum") -> Dict[str, jnp.ndarray]:
    """Eval-mode forward equal to ``model.apply(variables, x, train=False)``.

    ``merge_fold``: run each stage's PatchMerging inside the stage's last
    block kernel (swin_block_fused merge_params) instead of as XLA
    strided-slice copies.

    ``pre_normalized``: ``x`` already carries the eval ScalarBN (folded into
    the frontend kernel via ``fused_logmel_iv(post_affine=...)``) and may be
    zero-padded to the full reshape_wav2img frame count — used by
    :func:`htsat_fused_forward_from_wav`. 10 s clips only.
    """
    p = variables["params"]
    stats = variables["batch_stats"]
    ad = model.adapt
    has_adapters = ad.mlp_adapter or ad.spatial_adapter
    if has_adapters:
        # AdapterBit-tuned checkpoints: blocks run the adapter fwd kernel
        # (ops.pallas.swin_block_adapt_vjp — exact softmax, no merge fold;
        # somewhat slower than the plain serving kernel but still fused).
        # Callers must gate on model.adapt.kernels_support().
        assert ad.kernels_support(), "adapters not expressible in kernels"
        ad_scale = float(ad.adapt_kwargs["adapter_scalar"])
        merge_fold = False
    kw = dict(model.encoder_kwargs)
    spec_size = kw.get("spec_size", 256)
    patch_stride = tuple(kw.get("patch_stride", (4, 4)))
    embed_dim = kw.get("embed_dim", 96)
    depths = tuple(kw.get("depths", (2, 2, 6, 2)))
    num_heads = tuple(kw.get("num_heads", (4, 8, 16, 32)))
    window = kw.get("window_size", 8)
    num_layers = len(depths)
    freq_ratio = spec_size // model.mel_bins
    time_res = patch_stride[1] * 2 ** (num_layers - 1)
    SF = spec_size // (2 ** (num_layers - 1)) // patch_stride[0] // freq_ratio

    B, C, T, F = x.shape
    if pre_normalized:
        # T may be the padded frame count; frames are real up to tgt frames
        output_frames = min(T // model.pred_res, model.tgt_output_frames)
        five_sec = False
        x = x.astype(compute_dtype)
    else:
        output_frames = T // model.pred_res
        five_sec = output_frames < model.tgt_output_frames
        if five_sec:
            x = jnp.concatenate([x[: B // 2, :, :-1], x[B // 2:, :, :-1]],
                                axis=2)
        x = _scalar_bn(x, p["scalar"], stats["scalar"]).astype(compute_dtype)

    pe = p["encoder"]["patch_embed"]
    kern = jnp.asarray(_dense_p(pe["proj"])["kernel"], compute_dtype)
    patch_size = kw.get("patch_size", 4)
    ph = (patch_size - patch_stride[0]) // 2
    pw = (patch_size - patch_stride[1]) // 2
    target_T = spec_size * freq_ratio
    if patch_embed == "kernel" and ph == pw == 0 and patch_size == 4:
        # one Pallas kernel: wav2img + conv + bias + LN, each feature byte
        # read once, each token byte written once (ops.pallas.patch_embed —
        # the XLA conv/einsum forms both spend ~2 ms/batch in layout copies,
        # r5a/r5c)
        from ..ops.pallas.patch_embed import patch_embed_tokens

        Bc, Cc, Tcur, Fc = x.shape  # five_sec concat above changes B and T
        if Tcur < target_T:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, target_T - Tcur), (0, 0)))
        x = patch_embed_tokens(
            x, jnp.asarray(_dense_p(pe["proj"])["kernel"], jnp.float32),
            _dense_p(pe["proj"])["bias"], pe["norm"]["scale"],
            pe["norm"]["bias"], spec_size=spec_size, freq_ratio=freq_ratio,
            patch_stride=patch_stride, compute_dtype=compute_dtype,
            interpret=interpret)
        Hg, Wg = spec_size // patch_stride[0], spec_size // patch_stride[1]
    elif patch_embed == "einsum" and ph == pw == 0 and patch_size == 4:
        # reshape_wav2img + 4x4/4 conv as ONE row-major reshape + einsum:
        # wav2img maps (t, f) -> image (H=g*F+f, W=t'') with t = g*(T/fr)+t'';
        # patch row hp = g*(F/4)+f//4, dh = f%4, col wp = t''//4, dw = t''%4,
        # so splitting the trailing (T, F) axes in place yields every patch
        # index without any transpose. The conv formulation costs ~2.3 ms of
        # layout copies + f32 converts at B=128 (r5a/r5b profiles: the wav2img
        # transpose copy, the conv's f32 output relayout, the bias+cast pass);
        # the einsum lowers to one relayout + one MXU dot. Token order equals
        # the conv path's (row-major (g, fp, tp)) exactly.
        Bc, Cc, Tcur, Fc = x.shape  # five_sec concat above changes B and T
        if Tcur < target_T:
            x = jnp.pad(x, ((0, 0), (0, 0), (0, target_T - Tcur), (0, 0)))
        fr = freq_ratio
        tg = target_T // fr
        sh, sw = patch_stride[0], patch_stride[1]
        x7 = x.reshape(Bc, Cc, fr, tg // sw, sw, Fc // sh, sh)
        tok = jnp.einsum("bcgtufv,vuce->bgfte", x7, kern,
                         preferred_element_type=jnp.float32)
        tok = (tok + _dense_p(pe["proj"])["bias"]).astype(compute_dtype)
        Hg, Wg, E = spec_size // sh, spec_size // sw, tok.shape[-1]
        x = tok.reshape(Bc, Hg * Wg, E)
    else:
        x = _reshape_wav2img(x, spec_size, freq_ratio)
        # patch embed: conv 4x4/4 + LN (models.common.PatchEmbed)
        x = jnp.transpose(x, (0, 2, 3, 1))
        x = jax.lax.conv_general_dilated(
            x, kern, window_strides=patch_stride, padding=((ph, ph), (pw, pw)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=jnp.float32)
        x = (x + _dense_p(pe["proj"])["bias"]).astype(compute_dtype)
        Bp, Hg, Wg, E = x.shape
        x = x.reshape(Bp, Hg * Wg, E)
    if patch_embed != "kernel":  # the kernel path runs its LN in-kernel
        x = _ln(x, pe["norm"])

    for i in range(num_layers):
        Hi, Wi = Hg // (2 ** i), Wg // (2 ** i)
        w_i, base_shift = (window, window // 2)
        if min(Hi, Wi) <= window:
            w_i, base_shift = min(Hi, Wi), 0
        lp = p["encoder"][f"layers_{i}"]
        # Round-3 measurement settled the per-block vs whole-stage question:
        # the full quiet-box bench is FASTER per-block (352 vs 335 clips/s);
        # the stage kernel's apparent 2.3x win in the first probe was host
        # contention polluting the per-block side (docs/PERF.md round 3).
        # swin_stage_fused_v2 stays in-tree as a parity-pinned spare.
        for j in range(depths[i]):
            shift = 0 if j % 2 == 0 else base_shift
            last = j == depths[i] - 1
            fold_merge = merge_fold and last and i < num_layers - 1
            if has_adapters:
                from ..ops.pallas.swin_block_adapt_vjp import \
                    swin_block_adapt_eval

                x = swin_block_adapt_eval(
                    x, lp[f"blocks_{j}"], H=Hi, W=Wi, nh=num_heads[i],
                    window=w_i, shift=shift, scale=ad_scale,
                    compute_dtype=compute_dtype, interpret=interpret)
            else:
                x = swin_block_fused(
                    x, lp[f"blocks_{j}"], H=Hi, W=Wi, nh=num_heads[i],
                    window=w_i, shift=shift, compute_dtype=compute_dtype,
                    attn_impl=attn_impl, interpret=interpret, nomax=nomax,
                    merge_params=lp["downsample"] if fold_merge else None)
        if not merge_fold and i < num_layers - 1:
            # PatchMerging (models.htsat.PatchMerging) at the XLA level
            dm = lp["downsample"]
            Bcur = x.shape[0]  # NOT Bp: only the conv patch-embed branch
            # binds Bp (latent UnboundLocalError for einsum/kernel embeds
            # with merge_fold=False — hit by the adapter eval path)
            v = x.reshape(Bcur, Hi, Wi, -1)
            v = jnp.concatenate([v[:, 0::2, 0::2], v[:, 1::2, 0::2],
                                 v[:, 0::2, 1::2], v[:, 1::2, 1::2]], axis=-1)
            v = v.reshape(Bcur, (Hi // 2) * (Wi // 2), -1)
            v = _ln(v, dm["norm"])
            x = jnp.dot(v.astype(compute_dtype),
                        jnp.asarray(_dense_p(dm["reduction"])["kernel"],
                                    compute_dtype),
                        preferred_element_type=jnp.float32).astype(compute_dtype)

    x = _ln(x, p["encoder"]["norm"])

    # finalize: token map with frequency unfolding (models.htsat.finalize)
    Bp, N, Cf = x.shape
    frames = spec_size
    SFt = frames // (2 ** (num_layers - 1)) // patch_stride[0]
    STt = frames // (2 ** (num_layers - 1)) // patch_stride[1]
    x = jnp.transpose(x, (0, 2, 1)).reshape(Bp, Cf, SFt, STt)
    c_freq_bin = SFt // freq_ratio
    x = x.reshape(Bp, Cf, SFt // c_freq_bin, c_freq_bin, STt)
    x = jnp.transpose(x, (0, 1, 3, 2, 4)).reshape(Bp, Cf, c_freq_bin, -1)

    # tscam conv head + bilinear interpolate + pooling (models.heads.HTSAT)
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(compute_dtype)
    tk = jnp.asarray(p["tscam_conv"]["kernel"], compute_dtype)
    x = jax.lax.conv_general_dilated(
        x, tk, window_strides=(1, 1), padding=((0, 0), (1, 1)),
        dimension_numbers=("NHWC", "HWIO", "NHWC"),
        preferred_element_type=jnp.float32)
    x = (x + p["tscam_conv"]["bias"]).astype(compute_dtype)
    x = x.reshape(x.shape[0], -1, x.shape[-1])  # (B', ST, out)

    m = jnp.asarray(_linear_upsample_matrix(x.shape[1], time_res), x.dtype)
    x = jnp.einsum("st,btc->bsc", m, x, precision=jax.lax.Precision.HIGHEST)
    x = x[:, : model.tgt_output_frames * model.pred_res]
    if five_sec:
        half = output_frames * model.pred_res
        x = jnp.concatenate([x[:, :half], x[:, half:]], axis=0)
    x = x.reshape(B, output_frames, model.pred_res, -1).mean(axis=2)
    key = "accdoa" if model.num_tracks == 1 else "multi_accdoa"
    del SF
    return {key: jnp.tanh(x.astype(jnp.float32))}


def scalar_bn_affine(variables):
    """Eval ScalarBN as a per-(channel, mel) affine: y = x * inv + shift.

    All SELD heads share the ``scalar`` BN-over-channel module (reference
    accdoa.py:28/multi_accdoa.py/einv2.py); exactly the fold the reference's
    eval BatchNorm2d computes."""
    bn_p = variables["params"]["scalar"]["bn"]
    bn_s = variables["batch_stats"]["scalar"]["bn"]
    inv = (jnp.asarray(bn_p["weight"], jnp.float32)
           * jax.lax.rsqrt(jnp.asarray(bn_s["running_var"], jnp.float32)
                           + 1e-5))
    shift = (jnp.asarray(bn_p["bias"], jnp.float32)
             - jnp.asarray(bn_s["running_mean"], jnp.float32) * inv)
    return inv, shift


def folded_wav_features(variables, wav: jnp.ndarray, *,
                        compute_dtype: Dtype = jnp.bfloat16, wav_scale=None,
                        full_frames: bool = False, interpret: bool = False,
                        **frontend_kwargs) -> jnp.ndarray:
    """FOA waveform -> eval-normalized (B, 7, T, mel) features in ONE kernel:
    fused_logmel_iv with the eval ScalarBN (post_affine), the compute-dtype
    cast and optionally the reshape_wav2img zero-tail pad folded in; a
    scalar ``wav_scale`` rides the prep concatenate for free."""
    frontend_kwargs.setdefault("split3", True)
    inv, shift = scalar_bn_affine(variables)
    from ..ops.pallas.frontend import fused_logmel_iv

    return fused_logmel_iv(wav, pre_scale=wav_scale,
                           post_affine=(inv, shift),
                           out_dtype=compute_dtype, full_frames=full_frames,
                           interpret=interpret, **frontend_kwargs)


def htsat_fused_forward_from_wav(model: "heads.HTSAT", variables,
                                 wav: jnp.ndarray,
                                 compute_dtype: Dtype = jnp.bfloat16,
                                 wav_scale=None,
                                 attn_impl: str = "auto",
                                 interpret: bool = False,
                                 merge_fold: bool = True,
                                 patch_embed: str = "einsum",
                                 **frontend_kwargs) -> Dict[str, jnp.ndarray]:
    """Full serving step from the FOA waveform: frontend + model, with the
    eval ScalarBN, the bf16 cast and the reshape_wav2img frame pad all folded
    INTO the frontend kernel (fused_logmel_iv post_affine/out_dtype/
    full_frames — saves ~1.7 ms/batch of XLA feature passes at B=128,
    docs/PERF.md round 3). ``wav_scale`` rides the prep concatenate for free
    (bench input variation). 10-second clips only (the 5 s concat trick needs
    raw features); equal to extractor -> model.apply(train=False) up to bf16
    noise — pinned in tests/test_serving_fused.py.
    """
    feats = folded_wav_features(variables, wav, compute_dtype=compute_dtype,
                                wav_scale=wav_scale, full_frames=True,
                                interpret=interpret, **frontend_kwargs)
    n_frames = 1 + wav.shape[-1] // frontend_kwargs.get("hop", 240)
    assert (n_frames - 1) // model.pred_res == model.tgt_output_frames, \
        "htsat_fused_forward_from_wav supports 10-second clips only"
    return htsat_fused_forward(model, variables, feats,
                               compute_dtype=compute_dtype,
                               attn_impl=attn_impl, interpret=interpret,
                               pre_normalized=True, merge_fold=merge_fold,
                               patch_embed=patch_embed)
