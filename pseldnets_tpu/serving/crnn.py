"""Fused CRNN (CNN8/CNN12 + conformer decoder) serving path.

The r4a device profile of the flax cnn14_accdoa step (112.6 ms/batch @B=128)
showed the conv trunk's convs at MXU peak but ~50 ms of overhead around
them: the conformer decoder at ~31% MXU utilization (XLA fuses fc1+silu+fc2
into one windowed mega-fusion), unfused eval-BN/ReLU passes, reduce-window
avg_pools with f32 converts, and a 262M-element interpolate+segment-mean
tail. This path removes those at the XLA level (no Pallas needed — convs
are already MXU-native):

- eval BatchNorms fold into conv kernels/bias (exact identity),
- avg_pool stays reduce-window (``pool="avg"``, measured FASTER than the
  strided-slice-add variant: 53.3 vs 62.1 ms/batch trunk-only — the
  frontend's stride-slice lesson repeats; ``pool="slice"`` kept as the
  documented loser, scripts/perf_r4c_probe.py),
- conformer runs with (B*T, C)-flattened denses, optionally separated by
  ``lax.optimization_barrier`` so XLA cannot re-fuse fc1+fc2
  (``ffn_barrier``),
- dw-conv BN folds into the depthwise kernel,
- interpolate(ratio)+segment-mean(pred_res) collapse into ONE (T_out, T')
  matrix applied as a matmul.

Equivalent to ``model.apply(variables, x, train=False)`` for
``heads.CRNN``/``multi_accdoa`` CRNN with decoder in {conformer, None}
(reference src/models/accdoa.py:12-95) up to bf16 accumulation noise.
"""

import math
from functools import lru_cache
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

Dtype = Any


def _affine_from_bn(bn_p, bn_s, eps=1e-5):
    # jnp (traceable): variables ride as jit args in the eval/bench paths,
    # so the fold happens in-graph (~80M multiplies for CNN12 — negligible)
    inv = jnp.asarray(bn_p["weight"], jnp.float32) * jax.lax.rsqrt(
        jnp.asarray(bn_s["running_var"], jnp.float32) + eps)
    shift = jnp.asarray(bn_p["bias"], jnp.float32) - \
        jnp.asarray(bn_s["running_mean"], jnp.float32) * inv
    return inv, shift


def _fold_conv_bn(kernel, bn_p, bn_s, dtype):
    """conv(no-bias) + eval-BN  ->  conv(kernel * inv) + shift."""
    inv, shift = _affine_from_bn(bn_p, bn_s)
    k = jnp.asarray(kernel, jnp.float32) * inv[None, None, None]
    return k.astype(dtype), shift


def _pool_slice(x, pool):
    pt, pf = pool
    if pt == 1 and pf == 1:
        return x
    parts = [x[:, i::pt, j::pf] for i in range(pt) for j in range(pf)]
    s = parts[0].astype(jnp.float32)
    for prt in parts[1:]:
        s = s + prt.astype(jnp.float32)
    return (s * (1.0 / (pt * pf))).astype(x.dtype)


def _avg_pool(x, pool):
    import flax.linen as nn

    return nn.avg_pool(x, pool, strides=pool)


def _ln(x, p, eps=1e-5):
    xf = x.astype(jnp.float32)
    m = jnp.mean(xf, axis=-1, keepdims=True)
    v = jnp.mean(jnp.square(xf - m), axis=-1, keepdims=True)
    y = (xf - m) * jax.lax.rsqrt(v + eps)
    return (y * p["scale"] + p["bias"]).astype(x.dtype)


def _dense2d(x2, p, cd):
    y = jnp.dot(x2, jnp.asarray(p["kernel"], cd),
                preferred_element_type=jnp.float32)
    if "bias" in p:
        y = y + p["bias"]
    return y.astype(cd)


@lru_cache(maxsize=8)
def _interp_mean_matrix(t_in: int, ratio: int, pred_res: int, t_raw: int):
    """(T_out, t_in) matrix == repeat-interpolate(ratio) then mean(pred_res).

    Matches heads.CRNN: interpolate(x, ratio)[:, :t_raw] implicitly (t_raw =
    T of the input spec; t_in*ratio == t_raw for the standard hop), then
    reshape(B, T_out, pred_res, C).mean(2).
    """
    t_out = t_raw // pred_res
    m = np.zeros((t_out, t_in), np.float32)
    for s in range(t_out):
        for i in range(s * pred_res, (s + 1) * pred_res):
            m[s, min(i // ratio, t_in - 1)] += 1.0 / pred_res
    return m


def _rel_mhsa(x, p, pos_tab, nh, cd):
    """Transformer-XL relative MHSA, eval (models/conformer.py:53-93)."""
    B, T, C = x.shape
    D = C // nh
    x2 = x.reshape(B * T, C)
    q = _dense2d(x2, p["query_proj"], cd).reshape(B, T, nh, D)
    k = _dense2d(x2, p["key_proj"], cd).reshape(B, T, nh, D)
    v = _dense2d(x2, p["value_proj"], cd).reshape(B, T, nh, D)
    pp = _dense2d(pos_tab, p["pos_proj"], cd).reshape(1, T, nh, D)

    u = p["u_bias"].astype(cd)
    vb = p["v_bias"].astype(cd)
    content = jnp.einsum("bthd,bshd->bhts", q + u, k,
                         preferred_element_type=jnp.float32)
    pos = jnp.einsum("bthd,zshd->bhts", q + vb, pp,
                     preferred_element_type=jnp.float32)
    pad = jnp.zeros(pos.shape[:-1] + (1,), pos.dtype)
    padded = jnp.concatenate([pad, pos], axis=-1)
    padded = padded.reshape(B, nh, T + 1, T)
    pos = padded[:, :, 1:].reshape(B, nh, T, T)

    score = (content + pos) * (1.0 / math.sqrt(C))
    attn = jax.nn.softmax(score, axis=-1).astype(cd)
    ctx = jnp.einsum("bhts,bshd->bthd", attn, v).reshape(B * T, C)
    return _dense2d(ctx, p["out_proj"], cd).reshape(B, T, C)


def _conformer_block(x, p, s, nh, cd, ffn_barrier):
    """Eval conformer block on (B, T, C) with flattened denses."""
    from ..models.conformer import sinusoid_position_encoding

    B, T, C = x.shape

    def ffn(h, fp):
        h2 = _ln(h, fp["norm"]).reshape(B * T, C)
        f = _dense2d(h2, fp["fc1"], cd)
        f = (f.astype(jnp.float32) *
             jax.nn.sigmoid(f.astype(jnp.float32))).astype(cd)
        if ffn_barrier:
            f = jax.lax.optimization_barrier(f)
        return _dense2d(f, fp["fc2"], cd).reshape(B, T, C)

    x = x + 0.5 * ffn(x, p["ff1"])

    pos_tab = jnp.asarray(sinusoid_position_encoding(T, C), cd)
    h = _ln(x, p["attn_norm"])
    x = x + _rel_mhsa(h, p["attn"], pos_tab, nh, cd)

    # conv module: pw1 -> GLU -> dw(BN folded) -> silu -> pw2
    cp, cs = p["conv"], s["conv"]
    h = _ln(x, cp["norm"]).reshape(B * T, C)
    h = _dense2d(h, cp["pw_conv1"], cd)
    a, b = h[:, :C], h[:, C:]
    h = (a.astype(jnp.float32) *
         jax.nn.sigmoid(b.astype(jnp.float32))).astype(cd).reshape(B, T, C)
    dw = jnp.asarray(cp["dw_conv"]["kernel"], jnp.float32)  # (k, 1, C)
    inv, shift = _affine_from_bn(cp["bn"], cs["bn"])
    dw = (dw * inv[None, None]).astype(cd)
    ksz = dw.shape[0]
    pad = (ksz - 1) // 2
    h = jax.lax.conv_general_dilated(
        h, dw, window_strides=(1,), padding=((pad, pad),),
        dimension_numbers=("NWC", "WIO", "NWC"), feature_group_count=C,
        preferred_element_type=jnp.float32)
    h = h + shift
    h = (h * jax.nn.sigmoid(h)).astype(cd).reshape(B * T, C)  # silu, f32
    x = x + _dense2d(h, cp["pw_conv2"], cd).reshape(B, T, C)

    x = x + 0.5 * ffn(x, p["ff2"])
    return _ln(x, p["final_norm"])


def _conv_block(x, folded, conv_impl, cd, conv_pet, pallas_max_weight_mb,
                interpret=False):
    """One ConvBlock (conv+bias+ReLU x2) of the trunk, folded-BN weights.

    conv_impl="pallas" runs the fused Pallas kernel (ops.pallas.conv_block):
    bias+ReLU and the mid activation stay in VMEM — removes the ~25 ms of
    f32 ReLU(x+bias)->bf16 materializations the r7c device profile named.
    Only for blocks whose (9*Cin, Cmid)+(9*Cmid, Cout) weights fit VMEM
    (the big-spatial early blocks, which carry ~all the ReLU bytes). The
    stem block's conv1 (Cin=7) stays an XLA conv emitting RAW bias-free
    output — the kernel's per-tap dots would pad K 7->128 lanes (18x MACs);
    the kernel then fuses bias1+ReLU -> conv2 -> bias2+ReLU (relu_conv
    mode), which is where the materialization bytes are.

    MEASURED LOSER (round-5 r9b A/B, docs/PERF.md): the per-tap padding at
    the C=64 early blocks costs more than the passes it removes (full model
    102.7 vs 75.3 ms @B=128) — "xla" stays the default; "pallas" remains as
    the measured-alternative record.
    """
    (k1, s1), (k2, s2) = folded
    wbytes = sum(9 * k.shape[2] * k.shape[3] * 2 for k, _ in folded)
    if (conv_impl == "pallas"
            and wbytes <= pallas_max_weight_mb * 1024 * 1024):
        from ..ops.pallas.conv_block import conv3x3_bias_relu

        if k1.shape[2] < 32:  # tiny Cin: per-tap K-padding unaffordable
            x = jax.lax.conv_general_dilated(
                x, k1, window_strides=(1, 1), padding=((1, 1), (1, 1)),
                dimension_numbers=("NHWC", "HWIO", "NHWC"),
                preferred_element_type=cd)
            return conv3x3_bias_relu(x, None, s1, k2, s2, compute_dtype=cd,
                                     interpret=interpret)
        return conv3x3_bias_relu(x, k1, s1, k2, s2, compute_dtype=cd,
                                 interpret=interpret)
    for kern, bias in folded:
        x = jax.lax.conv_general_dilated(
            x, kern, window_strides=(1, 1), padding=((1, 1), (1, 1)),
            dimension_numbers=("NHWC", "HWIO", "NHWC"),
            preferred_element_type=conv_pet)
        x = jax.nn.relu(x + bias.astype(conv_pet)).astype(cd)
    return x


def crnn_fused_forward(model, variables, x: jnp.ndarray,
                       compute_dtype: Dtype = jnp.bfloat16,
                       pool: str = "avg",
                       ffn_barrier: bool = True,
                       conv_out: str = "f32",
                       conv_impl: str = "xla",
                       pallas_max_weight_mb: float = 16.0,
                       interpret: bool = False,
                       pre_normalized: bool = False) -> Dict[str, jnp.ndarray]:
    """Eval forward equal to ``model.apply(variables, x, train=False)``.

    ``model`` is heads.CRNN (accdoa or multi_accdoa flavour) with
    decoder in {"conformer", None}; ``x`` is (B, C, T, F) float32 features.
    ``pre_normalized``: ``x`` already carries the eval ScalarBN (folded into
    the frontend kernel — see :func:`crnn_fused_forward_from_wav`).
    ``conv_out``: "compute" asks XLA for compute-dtype conv outputs so the
    trunk's ReLU(x+bias) passes read/write bf16 — the r7c device profile
    showed the separate f32 relu+convert materializations after every conv
    were the largest non-conv cost (~25 ms of the 92.9 ms step; the MXU
    still accumulates f32 internally). Measured a WASH on-chip (r7e A/B
    @B=128: 93.79 ms vs 93.24 f32 — XLA's conv emitter evidently already
    fuses the downcast into the producing pass, so halving the relu bytes
    buys nothing), hence "f32" (the slightly faster side) is the default.
    """
    assert model.decoder in ("conformer", None, "None", "null", "identity"), \
        f"crnn_fused_forward supports conformer/null decoders, got " \
        f"{model.decoder!r}"
    p = variables["params"]
    st = variables["batch_stats"]
    cd = compute_dtype
    B, C_in, T, F = x.shape
    output_frames = T // model.pred_res

    if not pre_normalized:
        # ScalarBN (eval affine over (channel, mel))
        inv, shift = _affine_from_bn(p["scalar"]["bn"], st["scalar"]["bn"])
        x = x * inv[None, :, None, :] + shift[None, :, None, :]

    # NHWC trunk with folded BNs
    x = jnp.transpose(x, (0, 2, 3, 1)).astype(cd)
    feats = tuple(model.num_features)
    pools = [(2, 2)] * 3 + [(1, 2)] * (len(feats) - 3)
    pool_fn = _pool_slice if pool == "slice" else _avg_pool
    conv_pet = cd if conv_out == "compute" else jnp.float32
    for i in range(len(feats)):
        blk = p["convs"][f"conv_block{i + 1}"]
        bst = st["convs"][f"conv_block{i + 1}"]
        folded = [_fold_conv_bn(blk[f"conv{j}"]["kernel"],
                                blk[f"bn{j}"]["bn"],
                                bst[f"bn{j}"]["bn"], cd) for j in (1, 2)]
        x = pool_fn(_conv_block(x, folded, conv_impl, cd, conv_pet,
                                pallas_max_weight_mb, interpret), pools[i])

    x = x.astype(jnp.float32).mean(axis=2).astype(cd)  # (B, T', C)

    if model.decoder == "conformer":
        for i in range(model.num_decoder_layers):
            x = _conformer_block(x, p["decoder"][f"layers_{i}"],
                                 st["decoder"][f"layers_{i}"],
                                 nh=8, cd=cd, ffn_barrier=ffn_barrier)

    # interpolate(ratio=8) + reshape-mean(pred_res) as one matmul
    m = jnp.asarray(_interp_mean_matrix(x.shape[1], 8, model.pred_res, T), cd)
    x = jnp.einsum("st,btc->bsc", m, x, preferred_element_type=jnp.float32)
    x = x.astype(cd)[:, :output_frames]

    out = _dense2d(x.reshape(B * output_frames, -1), p["fc"], cd)
    out = jnp.tanh(out.astype(jnp.float32)).astype(x.dtype)
    out = out.reshape(B, output_frames, -1)
    return {model.output_key: out}


def crnn_fused_forward_from_wav(model, variables, wav: jnp.ndarray,
                                compute_dtype: Dtype = jnp.bfloat16,
                                wav_scale=None, pool: str = "avg",
                                ffn_barrier: bool = True,
                                conv_out: str = "f32",
                                conv_impl: str = "xla",
                                interpret: bool = False,
                                **frontend_kwargs) -> Dict[str, jnp.ndarray]:
    """FOA waveform -> CRNN logits with the eval ScalarBN + compute-dtype
    cast folded into the frontend kernel (serving.folded_wav_features);
    ``wav_scale`` rides the prep concatenate. Equal to extractor ->
    model.apply(train=False) up to compute-dtype noise."""
    from .htsat import folded_wav_features

    feats = folded_wav_features(variables, wav, compute_dtype=compute_dtype,
                                wav_scale=wav_scale, interpret=interpret,
                                **frontend_kwargs)
    return crnn_fused_forward(model, variables, feats,
                              compute_dtype=compute_dtype, pool=pool,
                              ffn_barrier=ffn_barrier, conv_out=conv_out,
                              conv_impl=conv_impl, interpret=interpret,
                              pre_normalized=True)
