"""Fused 3x3 conv + bias + ReLU (and double-conv) Pallas TPU kernels.

Reference: the CNN trunk's ConvBlock (src/models/components/backbone.py:6-60
— conv3x3 no-bias + BN + ReLU, twice, then avg-pool). Serving folds the eval
BN into the conv kernel/bias (serving/crnn.py), but XLA still materializes a
separate f32 ReLU(x+bias)->bf16 pass after every conv — the r7c device
profile put ~25 ms of the 93 ms cnn14_accdoa step @B=128 in those
`maximum_convert_fusion` passes (the largest, 12.6 ms, reads the
(B,1001,64,64) f32 stage-1 activation), and the round-4 dtype knob
(conv_out="compute") measured a wash because the passes are latency-bound,
not byte-bound.

This kernel removes the pass entirely: conv (as ONE im2col dot per T-chunk:
9 shifted views of the in-VMEM zero-padded input, lane-concatenated to a
(rows, 9*Cin) patch matrix), bias add, ReLU and the bf16 store all happen
in VMEM — per conv, HBM traffic drops to one bf16 activation read + one
bf16 write. ``double=True`` fuses BOTH convs of a ConvBlock, eliminating
the mid activation's HBM round-trip too (conv1 is recomputed on a 2-row
halo per chunk so conv2's taps stay chunk-local).

Used for the big-spatial blocks (1-4) of CNN8/CNN12/CNN14 trunks; the late
blocks keep XLA convs (their 9*Cin x Cout weights outgrow VMEM and their
ReLU passes are byte-tiny). Parity pinned in tests/test_conv_block.py.
"""

from functools import partial
from typing import Any

import jax
import jax.numpy as jnp

Dtype = Any


def _pick_t_blk(T: int, target: int = 128) -> int:
    """Largest divisor of T that is <= target (static chunk shapes)."""
    best = 1
    for d in range(1, min(T, target) + 1):
        if T % d == 0:
            best = d
    return best


def _conv_chunk(xp, W, b, c0, tb, F, cd):
    """One T-chunk of conv3x3+bias+relu over the padded (T+2, F+2, Cin)
    VMEM-resident input. Returns (tb, F, Cout) in cd."""
    taps = []
    for dt in range(3):
        for df in range(3):
            taps.append(jax.lax.slice_in_dim(
                jax.lax.slice_in_dim(xp, c0 + dt, c0 + dt + tb, axis=0),
                df, df + F, axis=1))
    pat = jnp.concatenate(taps, axis=-1)  # (tb, F, 9*Cin)
    y = jax.lax.dot_general(pat, W, (((2,), (0,)), ((), ())),
                            preferred_element_type=jnp.float32)
    return jnp.maximum(y + b, 0.0).astype(cd)


def _kernel_single(x_ref, w_ref, b_ref, o_ref, *, T, F, t_blk, cd):
    x = x_ref[0]  # (T, F, Cin)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    W = w_ref[:]
    b = b_ref[0]
    for c0 in range(0, T, t_blk):
        o_ref[0, c0:c0 + t_blk] = _conv_chunk(xp, W, b, c0, t_blk, F, cd)


def _kernel_double(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                   T, F, t_blk, cd):
    """conv1+relu -> conv2+relu with the mid activation never leaving VMEM.
    conv1 runs per chunk on a 1-row halo each side (2 rows recomputed) so
    conv2's taps stay chunk-local."""
    x = x_ref[0]
    xp = jnp.pad(x, ((2, 2), (1, 1), (0, 0)))  # 2 = conv1 halo + conv2 pad
    W1, b1, W2, b2 = w1_ref[:], b1_ref[0], w2_ref[:], b2_ref[0]
    for c0 in range(0, T, t_blk):
        # conv1 over rows [c0-1, c0+tb+1) of the (pad-1) frame: with the
        # double pad, chunk row r of conv1's padded input is xp[c0 + r]
        mid = _conv_chunk(xp, W1, b1, c0, t_blk + 2, F, cd)
        # conv2's halo OUTSIDE the image must be zeros (SAME padding), not
        # conv1 evaluated past the edge (relu(b1 + edge taps) != 0)
        if c0 == 0:
            mid = jnp.concatenate([jnp.zeros_like(mid[:1]), mid[1:]], axis=0)
        if c0 + t_blk == T:
            mid = jnp.concatenate([mid[:-1], jnp.zeros_like(mid[-1:])],
                                  axis=0)
        midp = jnp.pad(mid, ((0, 0), (1, 1), (0, 0)))
        o_ref[0, c0:c0 + t_blk] = _conv_chunk(midp, W2, b2, 0, t_blk, F, cd)


def conv3x3_bias_relu(x: jnp.ndarray, w, b, w2=None, b2=None, *,
                      t_blk: int = 0, compute_dtype=jnp.bfloat16,
                      vmem_limit_mb: int = 100,
                      interpret: bool = False) -> jnp.ndarray:
    """relu(conv3x3(x, w) + b) — and, when ``w2``/``b2`` are given, the
    full ConvBlock pair relu(conv3x3(relu(conv3x3(x,w)+b), w2)+b2) — as one
    Pallas kernel per image.

    ``x`` (B, T, F, Cin) NHWC; ``w`` (3, 3, Cin, Cout) HWIO (eval BN already
    folded — serving/crnn._fold_conv_bn); SAME padding, stride 1. Output
    (B, T, F, Cout) in ``compute_dtype``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, F, Cin = x.shape
    double = w2 is not None
    Cout = (w2 if double else w).shape[-1]
    Cmid = w.shape[-1]
    tb = t_blk or _pick_t_blk(T)

    W1 = jnp.asarray(w, jnp.float32).reshape(9 * Cin, Cmid).astype(
        compute_dtype)
    b1 = jnp.asarray(b, jnp.float32).reshape(1, Cmid)
    args = [x.astype(compute_dtype), W1, b1]
    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bb: (0,) * len(shape), memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, T, F, Cin), lambda bb: (bb, 0, 0, 0),
                     memory_space=pltpu.VMEM),
        const(9 * Cin, Cmid), const(1, Cmid),
    ]
    if double:
        W2 = jnp.asarray(w2, jnp.float32).reshape(9 * Cmid, Cout).astype(
            compute_dtype)
        args += [W2, jnp.asarray(b2, jnp.float32).reshape(1, Cout)]
        in_specs += [const(9 * Cmid, Cout), const(1, Cout)]
        kern = partial(_kernel_double, T=T, F=F, t_blk=tb, cd=compute_dtype)
    else:
        kern = partial(_kernel_single, T=T, F=F, t_blk=tb, cd=compute_dtype)

    return pl.pallas_call(
        kern,
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, T, F, Cout), lambda bb: (bb, 0, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, T, F, Cout), compute_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(*args)
