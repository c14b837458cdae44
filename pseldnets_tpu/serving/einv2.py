"""Fused-kernel EINV2 dual-HTSAT inference (reference einv2.py:237-327): both
encoder branches run their Swin blocks through the single-kernel Pallas block
(ops.pallas.swin_block), with the cross-stitch exchange between stages, patch
merging, scalar BN, embed/finalize and the tscam heads running through the
SAME flax submodules the training model uses via apply(method=...).

Eval only, no adapters/LoRA. Parity pinned in tests/test_serving_fused.py.
"""

from typing import Any, Dict

import jax.numpy as jnp

from ..models.common import interpolate
from ..models.einv2_heads import SED_IN_CHANNELS
from ..ops.pallas.swin_block import swin_block_fused

Dtype = Any


def _fused_stage(enc, i: int, x: jnp.ndarray, compute_dtype, interpret,
                 merge_fold=False, nomax=None):
    """Swin stage i of a bound HTSATEncoder: fused blocks + flax PatchMerging
    (or the merge folded into the last block kernel when ``merge_fold``)."""
    Hg = enc.spec_size // enc.patch_stride[0]
    Wg = enc.spec_size // enc.patch_stride[1]
    Hi, Wi = Hg // (2 ** i), Wg // (2 ** i)
    w_i, base_shift = enc.window_size, enc.window_size // 2
    if min(Hi, Wi) <= enc.window_size:
        w_i, base_shift = min(Hi, Wi), 0
    pstage = enc.variables["params"][f"layers_{i}"]
    has_merge = i < len(enc.depths) - 1
    for j in range(enc.depths[i]):  # per-block wins on-chip — serving/htsat.py
        shift = 0 if j % 2 == 0 else base_shift
        fold = merge_fold and has_merge and j == enc.depths[i] - 1
        x = swin_block_fused(x, pstage[f"blocks_{j}"], H=Hi, W=Wi,
                             nh=enc.num_heads[i], window=w_i, shift=shift,
                             attn_impl="auto", nomax=nomax,
                             compute_dtype=compute_dtype, interpret=interpret,
                             merge_params=pstage["downsample"] if fold
                             else None)
    if has_merge and not merge_fold:
        x = enc.layers[i].downsample_mod(x)
    return x


def einv2_htsat_fused_forward(model, variables, x: jnp.ndarray,
                              compute_dtype: Dtype = jnp.bfloat16,
                              interpret: bool = False,
                              merge_fold: bool = True,
                              nomax=None) -> Dict[str, jnp.ndarray]:
    """Eval-mode forward equal to ``model.apply(variables, x, train=False)``
    for models.einv2_heads.HTSAT."""

    def method(mdl, x):
        B, C, T, F = x.shape
        output_frames = T // mdl.pred_res
        five_sec = output_frames < mdl.tgt_output_frames
        if five_sec:
            # same guards as the flax __call__ (einv2_heads.py): fail loudly
            # on shapes the 5s-concat reshape would silently mispair
            assert output_frames == mdl.tgt_output_frames // 2
            assert B % 2 == 0
            x = jnp.concatenate([x[: B // 2, :, :-1], x[B // 2:, :, :-1]],
                                axis=2)
        elif output_frames > mdl.tgt_output_frames:
            raise NotImplementedError
        x = mdl.scalar(x, use_running_average=True)
        x_sed = mdl.sed_encoder.embed(x[:, :SED_IN_CHANNELS])
        x_doa = mdl.doa_encoder.embed(x)
        for i in range(len(mdl.sed_encoder.depths)):
            x_sed, x_doa = mdl.stitch1[i](x_sed, x_doa)
            x_sed = _fused_stage(mdl.sed_encoder, i, x_sed, compute_dtype,
                                 interpret, merge_fold, nomax=nomax)
            x_doa = _fused_stage(mdl.doa_encoder, i, x_doa, compute_dtype,
                                 interpret, merge_fold, nomax=nomax)
        x_sed = mdl.sed_encoder.finalize(x_sed)
        x_doa = mdl.doa_encoder.finalize(x_doa)

        def head(tok, conv, time_res):
            h = jnp.transpose(tok, (0, 2, 3, 1))
            h = conv(h).reshape(tok.shape[0], -1, conv.features)
            h = interpolate(h, ratio=time_res, method="bilinear")
            h = h[:, : mdl.tgt_output_frames * mdl.pred_res]
            if five_sec:
                half = output_frames * mdl.pred_res
                h = jnp.concatenate([h[:, :half], h[:, half:]], axis=0)
            return h.reshape(B, output_frames, mdl.pred_res, 3,
                             -1).mean(axis=2)

        pred_sed = head(x_sed, mdl.sed_tscam_conv, mdl.sed_encoder.time_res)
        pred_doa = jnp.tanh(head(x_doa, mdl.doa_tscam_conv,
                                 mdl.doa_encoder.time_res))
        return {"sed": pred_sed, "doa": pred_doa}

    return model.apply(variables, x, method=method)
