"""Fused-kernel PaSST inference: the eval forward of models.heads.PASST
(reference accdoa.py:249-329 / multi_accdoa.py:46-55) with every ViT block
executed by the single-kernel Pallas block (ops.pallas.vit_block).

The non-block pieces (scalar BN, patch embed + decomposed pos-embeds,
cls/dist concat, final norm + token-map head) run through the SAME flax
submodules the training model uses via apply(method=...), so there is no
re-implementation to drift — only the block stack is swapped for the kernel.
Parity pinned in tests/test_serving_fused.py.
"""

from typing import Any, Dict

import jax.numpy as jnp

from ..ops.pallas.vit_block import vit_block_fused

Dtype = Any


def passt_fused_forward(model, variables, x: jnp.ndarray,
                        compute_dtype: Dtype = jnp.bfloat16,
                        interpret: bool = False,
                        attn_impl: str = "exact",
                        nomax=None,
                        pre_normalized: bool = False,
                        **block_kwargs) -> Dict[str, jnp.ndarray]:
    """Eval-mode forward equal to ``model.apply(variables, x, train=False)``.

    ``pre_normalized``: ``x`` already carries the eval ScalarBN (folded into
    the frontend kernel — see :func:`passt_fused_forward_from_wav`).

    ``attn_impl="exp2"`` uses the folded exp2 softmax with sum_pv
    denominators and no row-max subtraction (the Swin kernel's measured
    wins); "exact" keeps the guarded softmax."""
    kw = dict(model.encoder_kwargs)
    depth = kw.get("depth", 7)
    nh = kw.get("num_heads", 12)

    def method(mdl, x):
        if not pre_normalized:
            x = mdl.scalar(x, use_running_average=True)
        h = mdl.encoder.forward_before(x, train=False)
        pb = mdl.encoder.variables["params"]
        for i in range(depth):
            h = vit_block_fused(h, pb[f"blocks_{i}"], nh=nh, eps=1e-6,
                                compute_dtype=compute_dtype,
                                attn_impl=attn_impl, nomax=nomax,
                                interpret=interpret, **block_kwargs)
        fm, _ = mdl.encoder.forward_after(h, train=False)
        return {mdl.output_key: jnp.tanh(mdl.fc(fm))}

    return model.apply(variables, x, method=method)


def passt_fused_forward_from_wav(model, variables, wav: jnp.ndarray,
                                 compute_dtype: Dtype = jnp.bfloat16,
                                 wav_scale=None, interpret: bool = False,
                                 attn_impl: str = "exact",
                                 block_kwargs=None,
                                 **frontend_kwargs) -> Dict[str, jnp.ndarray]:
    """FOA waveform -> PaSST logits with the eval ScalarBN + compute-dtype
    cast folded into the frontend kernel (serving.folded_wav_features);
    ``wav_scale`` rides the prep concatenate. Equal to extractor ->
    model.apply(train=False) up to compute-dtype noise."""
    from .htsat import folded_wav_features

    feats = folded_wav_features(variables, wav, compute_dtype=compute_dtype,
                                wav_scale=wav_scale, interpret=interpret,
                                **frontend_kwargs)
    return passt_fused_forward(model, variables, feats,
                               compute_dtype=compute_dtype,
                               interpret=interpret, attn_impl=attn_impl,
                               pre_normalized=True, **(block_kwargs or {}))
