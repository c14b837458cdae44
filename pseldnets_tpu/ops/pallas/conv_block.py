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

These kernels remove the pass entirely: conv, bias add, ReLU and the bf16
store all happen in VMEM — per conv, HBM traffic drops to one bf16
activation read + one bf16 write. ``w2``/``b2`` fuse BOTH convs of a
ConvBlock, eliminating the mid activation's HBM round-trip too (conv1 is
recomputed on a 2-row halo per chunk so conv2's taps stay chunk-local).

Mosaic legality (the round-5 r9b lesson): the classic im2col form — 9
shifted views lane-concatenated to a (rows, 9*Cin) patch matrix, one dot —
does NOT compile on-chip: `tpu.concatenate` requires every input's (sublane,
lane) vpad offset to match on non-concat dims, and the taps sit at lane
offsets {0, Cin, 2*Cin, ...} / sublane offsets {0, 1, 2} ("result/input
offset mismatch on non-concat dimension"). The legal form used here is
per-tap accumulation: 9 separate (rows, Cin) @ (Cin, Cout) dots summed into
one f32 accumulator — tap views are untiled-dim/sublane slices (free, r5h)
and the weight taps are sublane slices of the (9*Cin, Cout) buffer at
Cin-multiples. The MXU pads each dot's K to 128 lanes, so per-tap costs
extra padded MACs only when Cin % 128 != 0 (2x at Cin=64, ruinous at
Cin=7) — hence ``mode="relu_conv"`` for the trunk's first block: conv1
(Cin=7) stays an XLA conv emitting RAW (bias-free) bf16, and the kernel
fuses bias1+ReLU -> conv2 -> bias2+ReLU, which is where the bytes are.

VERDICT (round-5 r9b on-chip A/B, docs/PERF.md): the legal per-tap form
LOSES — 102.7 vs 75.3 ms full CNN14 @B=128 (trunk-only 79.6 vs 52.1) —
because the per-tap K/N lane padding (2-4x at the C=64 early blocks)
exceeds the ~20-25 ms of ReLU materialization passes it removes; XLA's
conv emitter needs no padding and out-schedules the kernel ~2x at these
shapes. serving/crnn keeps ``conv_impl="xla"`` as the default; this kernel
stays as the measured record of the alternative (opt-in, parity pinned in
tests/test_conv_block.py).
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


def _conv_chunk(xp, W, b, c0, tb, F, Cin, cd):
    """One T-chunk of conv3x3+bias+relu over the padded (rows, F+2, Cin)
    VMEM-resident input, as 9 per-tap dots accumulated in f32 (see module
    docstring for why not one im2col dot). Returns (tb, F, Cout) in cd."""
    acc = None
    for dt in range(3):
        rows = jax.lax.slice_in_dim(xp, c0 + dt, c0 + dt + tb, axis=0)
        for df in range(3):
            tap = jax.lax.slice_in_dim(rows, df, df + F, axis=1)
            wt = jax.lax.slice_in_dim(W, (dt * 3 + df) * Cin,
                                      (dt * 3 + df + 1) * Cin, axis=0)
            y = jax.lax.dot_general(tap, wt, (((2,), (0,)), ((), ())),
                                    preferred_element_type=jnp.float32)
            acc = y if acc is None else acc + y
    return jnp.maximum(acc + b, 0.0).astype(cd)


def _kernel_single(x_ref, w_ref, b_ref, o_ref, *, T, F, Cin, t_blk, cd):
    x = x_ref[0]  # (T, F, Cin)
    xp = jnp.pad(x, ((1, 1), (1, 1), (0, 0)))
    W = w_ref[:]
    b = b_ref[0]
    for c0 in range(0, T, t_blk):
        o_ref[0, c0:c0 + t_blk] = _conv_chunk(xp, W, b, c0, t_blk, F, Cin, cd)


def _zero_mid_halo(mid, c0, t_blk, T):
    """conv2's halo OUTSIDE the image must be zeros (SAME padding), not
    conv1 evaluated past the edge (relu(b1 + edge taps) != 0)."""
    if c0 == 0:
        mid = jnp.concatenate([jnp.zeros_like(mid[:1]), mid[1:]], axis=0)
    if c0 + t_blk == T:
        mid = jnp.concatenate([mid[:-1], jnp.zeros_like(mid[-1:])], axis=0)
    return mid


def _kernel_double(x_ref, w1_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                   T, F, Cin, Cmid, t_blk, cd):
    """conv1+relu -> conv2+relu with the mid activation never leaving VMEM.
    conv1 runs per chunk on a 1-row halo each side (2 rows recomputed) so
    conv2's taps stay chunk-local."""
    x = x_ref[0]
    xp = jnp.pad(x, ((2, 2), (1, 1), (0, 0)))  # 2 = conv1 halo + conv2 pad
    W1, b1, W2, b2 = w1_ref[:], b1_ref[0], w2_ref[:], b2_ref[0]
    for c0 in range(0, T, t_blk):
        # conv1 over rows [c0-1, c0+tb+1) of the (pad-1) frame: with the
        # double pad, chunk row r of conv1's padded input is xp[c0 + r]
        mid = _conv_chunk(xp, W1, b1, c0, t_blk + 2, F, Cin, cd)
        mid = _zero_mid_halo(mid, c0, t_blk, T)
        midp = jnp.pad(mid, ((0, 0), (1, 1), (0, 0)))
        o_ref[0, c0:c0 + t_blk] = _conv_chunk(midp, W2, b2, 0, t_blk, F,
                                              Cmid, cd)


def _kernel_relu_conv(x_ref, b1_ref, w2_ref, b2_ref, o_ref, *,
                      T, F, Cmid, t_blk, cd):
    """relu(x + b1) -> conv2 -> relu(+b2), where ``x`` is the RAW (bias-free)
    output of an XLA conv1 — used when conv1's Cin (e.g. the trunk's 7 input
    channels) would make per-tap dots pad K 7->128 lanes for nothing. Fusing
    the bias1+ReLU here still kills the big f32 materialization pass."""
    x = x_ref[0]  # (T, F, Cmid) raw conv1 output
    b1, W2, b2 = b1_ref[0], w2_ref[:], b2_ref[0]
    for c0 in range(0, T, t_blk):
        lo, hi = max(c0 - 1, 0), min(c0 + t_blk + 1, T)
        mid = jnp.maximum(
            jax.lax.slice_in_dim(x, lo, hi, axis=0).astype(jnp.float32) + b1,
            0.0).astype(cd)
        if c0 == 0:
            mid = jnp.concatenate([jnp.zeros_like(mid[:1]), mid], axis=0)
        if c0 + t_blk == T:
            mid = jnp.concatenate([mid, jnp.zeros_like(mid[:1])], axis=0)
        midp = jnp.pad(mid, ((0, 0), (1, 1), (0, 0)))
        o_ref[0, c0:c0 + t_blk] = _conv_chunk(midp, W2, b2, 0, t_blk, F,
                                              Cmid, cd)


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

    When ``w is None`` (``b``/``w2``/``b2`` given), ``x`` is instead the raw
    bias-free conv1 output and the kernel computes
    relu(conv3x3(relu(x + b), w2) + b2) — see ``_kernel_relu_conv``.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, T, F, Cin = x.shape
    relu_conv = w is None
    double = w2 is not None and not relu_conv
    Cout = (w2 if (double or relu_conv) else w).shape[-1]
    Cmid = Cin if relu_conv else w.shape[-1]
    tb = t_blk or _pick_t_blk(T)

    def wmat(k, C_in):
        return jnp.asarray(k, jnp.float32).reshape(9 * C_in, -1).astype(
            compute_dtype)

    const = lambda *shape: pl.BlockSpec(  # noqa: E731
        shape, lambda bb: (0,) * len(shape), memory_space=pltpu.VMEM)
    args = [x.astype(compute_dtype)]
    in_specs = [pl.BlockSpec((1, T, F, Cin), lambda bb: (bb, 0, 0, 0),
                             memory_space=pltpu.VMEM)]
    if relu_conv:
        args += [jnp.asarray(b, jnp.float32).reshape(1, Cmid),
                 wmat(w2, Cmid),
                 jnp.asarray(b2, jnp.float32).reshape(1, Cout)]
        in_specs += [const(1, Cmid), const(9 * Cmid, Cout), const(1, Cout)]
        kern = partial(_kernel_relu_conv, T=T, F=F, Cmid=Cmid, t_blk=tb,
                       cd=compute_dtype)
    else:
        args += [wmat(w, Cin), jnp.asarray(b, jnp.float32).reshape(1, Cmid)]
        in_specs += [const(9 * Cin, Cmid), const(1, Cmid)]
        if double:
            args += [wmat(w2, Cmid),
                     jnp.asarray(b2, jnp.float32).reshape(1, Cout)]
            in_specs += [const(9 * Cmid, Cout), const(1, Cout)]
            kern = partial(_kernel_double, T=T, F=F, Cin=Cin, Cmid=Cmid,
                           t_blk=tb, cd=compute_dtype)
        else:
            kern = partial(_kernel_single, T=T, F=F, Cin=Cin, t_blk=tb,
                           cd=compute_dtype)

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
