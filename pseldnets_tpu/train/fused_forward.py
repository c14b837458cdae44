"""Fused-kernel TRAINING forward for HTSAT (round-5 review item #3).

The serving stack runs every Swin block as a single Pallas kernel
(ops.pallas.swin_block, 2.4x the flax eval forward); training stayed on the
flax path because the only fwd+bwd A/B (round 2, stage-0 shape only)
measured a wash. This wires the CURRENT kernel forward together with the
hand-written backward kernel (ops.pallas.swin_block_vjp.swin_block_train,
grads == jax.grad to 2e-4 f32) into the full train step behind the additive
``trainer.fused_forward`` knob, so the full-step A/B the round-4 review
asked for can be measured (bench_train --fused).

Math equals ``model.apply(variables, feats, train=True)`` for an HTSAT with
zero attn/proj/pos dropout (the production config) up to (a) kernel float
reassociation and (b) drop-path mask RNG draw order (per-block fold_in of the
dropout rng instead of flax's module-order make_rng — a different but
equally-distributed sample). AdapterBit bottleneck adapters ride the
dedicated adapter VJP kernel (ops.pallas.swin_block_adapt_vjp) when the
``adapter_scalar`` is a constant; learnable-scalar and LoRA configs stay on
flax (``supports_fused_train`` gates them).
"""

from typing import Any, Dict, Tuple

import jax
import jax.numpy as jnp
import numpy as np

from ..ops.pallas.swin_block_adapt_vjp import swin_block_train_adapt
from ..ops.pallas.swin_block_vjp import swin_block_train

Dtype = Any


def supports_fused_train(model) -> bool:
    from ..models import heads

    if not isinstance(model, heads.HTSAT):
        return False
    # LoRA, learnable-scalar / non-gelu / new_adapter bottlenecks: flax only
    if not model.adapt.kernels_support():
        return False
    kw = dict(model.encoder_kwargs)
    return (kw.get("drop_rate", 0.0) == 0.0
            and kw.get("attn_drop_rate", 0.0) == 0.0)


def _block_runner(mesh):
    """How to invoke a fused block under a data-parallel mesh.

    ``pallas_call`` is NOT GSPMD-partitionable: under a plain sharded jit
    XLA all-gathers the batch and runs the kernel REPLICATED on every device
    (verified on an 8-device CPU mesh — 20 all-gathers, no speedup), so on a
    multi-chip mesh each block must run under shard_map over the data axis
    (batch sharded, params replicated; shard_map's transpose psums the
    replicated-param cotangents, so grads match the single-device step —
    pinned in test_fused_train.py::test_fused_train_forward_sharded)."""
    if (mesh is None or "data" not in mesh.axis_names
            or mesh.shape["data"] == 1):
        return lambda fn, x, p, masks, *static: fn(x, p, masks, *static)
    from jax import shard_map
    from jax.sharding import PartitionSpec as P

    def run(fn, x, p, masks, *static):
        f = lambda x_, p_, m_: fn(x_, p_, m_, *static)
        # check_vma=False: pallas_call out_shapes carry no vma annotation
        # (same as the serving shard_map paths)
        return shard_map(f, mesh=mesh,
                         in_specs=(P("data"), P(), P("data")),
                         out_specs=P("data"), check_vma=False)(x, p, masks)

    return run


def htsat_fused_train_forward(model, variables: Dict, feats: jnp.ndarray,
                              dropout_rng, compute_dtype: Dtype = None,
                              interpret: bool = False, mesh=None
                              ) -> Tuple[Dict[str, jnp.ndarray], Dict]:
    """Train-mode forward with fused Swin block kernels (custom VJP).

    Returns ``(preds, new_batch_stats)`` like the flax apply with
    ``mutable=["batch_stats"]`` (the train-mode ScalarBN update runs through
    the model's own module). Pass the trainer's data mesh so the block
    kernels shard over it (see _block_runner)."""
    cd = compute_dtype or model.dtype
    run_block = _block_runner(mesh)
    kw = dict(model.encoder_kwargs)
    spec_size = kw.get("spec_size", 256)
    patch_stride = tuple(kw.get("patch_stride", (4, 4)))
    depths = tuple(kw.get("depths", (2, 2, 6, 2)))
    num_heads = tuple(kw.get("num_heads", (4, 8, 16, 32)))
    window = kw.get("window_size", 8)
    dpr_max = kw.get("drop_path_rate", 0.1)
    num_layers = len(depths)
    dpr = np.linspace(0, dpr_max, sum(depths))
    Hg = spec_size // patch_stride[0]
    Wg = spec_size // patch_stride[1]

    def method(mdl, x):
        B, C, T, F = x.shape
        output_frames = T // mdl.pred_res
        five_sec = output_frames < mdl.tgt_output_frames
        if five_sec:
            assert output_frames == mdl.tgt_output_frames // 2
            assert B % 2 == 0
            x = jnp.concatenate([x[: B // 2, :, :-1], x[B // 2:, :, :-1]],
                                axis=2)
        x = mdl.scalar(x, use_running_average=False)
        x = mdl.encoder.embed(x, deterministic=True)  # pos dropout == 0
        pe = mdl.encoder.variables["params"]
        Bp = x.shape[0]
        bi = 0
        for i in range(num_layers):
            Hi, Wi = Hg // (2 ** i), Wg // (2 ** i)
            w_i, base_shift = window, window // 2
            if min(Hi, Wi) <= window:
                w_i, base_shift = min(Hi, Wi), 0
            lp = pe[f"layers_{i}"]
            for j in range(depths[i]):
                shift = 0 if j % 2 == 0 else base_shift
                rate = float(dpr[bi])
                bi += 1
                if rate > 0.0:
                    keep = 1.0 - rate
                    m = jax.random.bernoulli(
                        jax.random.fold_in(dropout_rng, bi), keep, (Bp, 2))
                    masks = m.astype(jnp.float32) / keep
                else:
                    masks = jnp.ones((Bp, 2), jnp.float32)
                bp = lp[f"blocks_{j}"]
                if "adapter" in bp["attn"] or "adapter" in bp["mlp"]:
                    x = run_block(
                        swin_block_train_adapt, x, bp, masks, Hi, Wi,
                        num_heads[i], w_i, shift,
                        float(model.adapt.adapt_kwargs["adapter_scalar"]),
                        cd, interpret)
                else:
                    x = run_block(swin_block_train, x, bp, masks, Hi, Wi,
                                  num_heads[i], w_i, shift, cd, interpret)
            if i < num_layers - 1:
                x = mdl.encoder.layers[i].downsample_mod(x)
        x = mdl.encoder.finalize(x)  # norm + token map (B', C, cfb, ST')

        from ..models.common import interpolate

        x = jnp.transpose(x, (0, 2, 3, 1))
        x = mdl.tscam_conv(x)
        x = x.reshape(x.shape[0], -1, x.shape[-1])
        x = interpolate(x, ratio=mdl.encoder.time_res, method="bilinear")
        x = x[:, : mdl.tgt_output_frames * mdl.pred_res]
        if five_sec:
            half = output_frames * mdl.pred_res
            x = jnp.concatenate([x[:, :half], x[:, half:]], axis=0)
        x = x.reshape(B, output_frames, mdl.pred_res, -1).mean(axis=2)
        return {mdl.output_key: jnp.tanh(x)}

    preds, new_vars = model.apply(variables, feats, method=method,
                                  mutable=["batch_stats"])
    return preds, new_vars.get("batch_stats",
                               variables.get("batch_stats", {}))
