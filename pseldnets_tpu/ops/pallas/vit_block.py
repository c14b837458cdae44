"""Fused plain-ViT transformer block as a single Pallas TPU kernel.

The PaSST encoder (reference src/models/components/passt.py:50-130) is a
stack of pre-LN ViT blocks:

    LN1 -> qkv -> full MHSA -> proj -> residual -> LN2 -> MLP (GELU) -> residual

Like the Swin kernel (ops/pallas/swin_block.py), device profiling shows the
flax forward is dominated by LayerNorm/softmax convert+reduce and unfused
elementwise chains, not matmuls — running the whole block per image group in
VMEM leaves one activation read + one write of HBM traffic per block.

Differences vs the Swin kernel: no window partition / shift / masks /
relative-position bias, LayerNorm eps is 1e-6 (timm ViT) instead of 1e-5,
and attention is one (N, N) score matrix per head over the full token
sequence (cls+dist tokens included).
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from . import swin_block as _sb
from .swin_block import (_gelu_exact, _gelu_poly, _mlp_chunks, _softmax,
                         _ln as _ln_eps)

Dtype = Any


def _ln(xf, scale, bias, eps, fast=False):
    return _ln_eps(xf, scale, bias, fast, eps)


def _vit_kernel(x_ref, ln1s, ln1b, qkvw, qkvb, projw, projb,
                ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, out_ref, *,
                N, C, nh, hidden, eps, compute_dtype, attn_impl="exact",
                sum_pv=False, nomax=False, mlp_min_rows=256):
    hd = C // nh
    scale = hd ** -0.5
    cd = compute_dtype
    G = x_ref.shape[0]

    fast = False  # measured slower on v5e — see swin_block._block_kernel
    x0 = x_ref[:].astype(cd)  # (G, N, C)
    h = _ln(x0.astype(jnp.float32), ln1s[0], ln1b[0], eps, fast).astype(cd)

    qkv = jnp.dot(h.reshape(G * N, C), qkvw[:].astype(cd),
                  preferred_element_type=jnp.float32) + qkvb[0]
    qkv = qkv.astype(cd)

    heads = []
    hv = hd + 1 if sum_pv else hd  # v block width (+1 = ones column)
    for hh in range(nh):
        q = qkv[:, hh * hd:(hh + 1) * hd].reshape(G, N, hd)
        k = qkv[:, C + hh * hd: C + (hh + 1) * hd].reshape(G, N, hd)
        v = qkv[:, 2 * C + hh * hv: 2 * C + hh * hv + hv].reshape(G, N, hv)
        if attn_impl == "exp2":
            # caller folded scale * log2(e) into the q weight/bias columns
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            if nomax:  # shift-invariant; see swin_block._exp2_softmax
                d = s
            else:
                d = s - jnp.max(s, axis=-1, keepdims=True)
            if "softmax" in _sb._ABLATE:  # probe-only: raw scores as e
                e = d
            else:
                e = jnp.exp2(d)
            o = jax.lax.dot_general(e.astype(cd), v,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            if sum_pv:
                # denominator rides the PV dot (lane hd = e @ ones): at
                # PaSST's N~1000 the (N, N) divide pass this replaces is
                # ~16x the post-PV (N, hd) one
                o = o[..., :hd] / o[..., hd:]
            else:
                # sum the SAME bf16-cast e the PV dot consumes (f32 acc) —
                # an f32-e denominator would leave rows renormalizing to
                # slightly != 1 in bf16 (the mismatch sum_pv fixes by design)
                o = o / jnp.sum(e.astype(cd), axis=-1, keepdims=True,
                                dtype=s.dtype)
        else:
            s = jax.lax.dot_general(q * jnp.asarray(scale, cd), k,
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            p = _softmax(s, fast).astype(cd)  # (G, N, N)
            o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
        heads.append(o.reshape(G * N, hd))
    attn = jnp.concatenate(heads, axis=-1).astype(cd)

    attn = (jnp.dot(attn, projw[:].astype(cd),
                    preferred_element_type=jnp.float32) + projb[0]).astype(cd)
    y = (x0 + attn.reshape(G, N, C)).reshape(G * N, C)

    def mlp(yc):
        h2 = _ln(yc.astype(jnp.float32), ln2s[0], ln2b[0], eps, fast).astype(cd)
        f = jnp.dot(h2, fc1w[:].astype(cd),
                    preferred_element_type=jnp.float32) + fc1b[0]
        f = (_gelu_poly(f) if cd == jnp.bfloat16 else _gelu_exact(f)).astype(cd)
        return (jnp.dot(f, fc2w[:].astype(cd),
                        preferred_element_type=jnp.float32)
                + fc2b[0]).astype(cd)

    # chunk the MLP so the (rows, hidden) f32 intermediate stays small
    n_chunks = _mlp_chunks(G * N, min_rows=mlp_min_rows)
    rows = (G * N) // n_chunks
    outs = [(y[c * rows:(c + 1) * rows]
             + mlp(y[c * rows:(c + 1) * rows])).astype(out_ref.dtype)
            for c in range(n_chunks)]
    out_ref[:] = jnp.concatenate(outs, axis=0).reshape(G, N, C)


def vit_block_fused(x: jnp.ndarray, p: Dict, *, nh: int, eps: float = 1e-6,
                    compute_dtype=jnp.bfloat16, group: int = 0,
                    attn_impl: str = "exact", sum_pv=None, nomax=None,
                    mlp_min_rows: int = 0,
                    interpret: bool = False) -> jnp.ndarray:
    """x (B, N, C) + the block's flax param subtree -> (B, N, C).

    Equivalent to models.passt.Block in eval mode (no dropout / drop-path).

    ``attn_impl="exp2"`` transplants the Swin kernel's measured softmax
    wins (swin_block.py): the q-scale and log2(e) fold into the qkv params
    (no in-kernel q multiply), ``sum_pv`` rides the denominator on the PV
    dot via a zero-weight/bias-1 ones column per head, and ``nomax`` skips
    the shift-invariant row-max subtraction — at PaSST's N~1000 the (N, N)
    subtract/divide passes these remove dwarf Swin's NP=128 ones.

    ``group`` defaults to 1 (one image per grid cell) and ``mlp_min_rows``
    to N (one MLP chunk per image): the round-5 r9a/r9c on-chip A/B at the
    production shape (N=602, C=768, B=128) measured G=1 at 10.28 vs G=2's
    11.99 ms/block (-14%; the block is ~97% dot schedule and the smaller
    live set pipelines better) and the unchunked MLP worth another ~0.8%
    — together 265.3 -> 318.9 clips/s for the PaSST bench config. Both
    knobs stay overridable for probes.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    import math

    B, N, C = x.shape

    G = group or 1
    while B % G:
        G -= 1
    if not mlp_min_rows:
        mlp_min_rows = N

    def dense(d):
        return d["base"] if "base" in d else d

    qkv_p = dense(p["attn"]["qkv"])
    proj_p = dense(p["attn"]["proj"])
    fc1_p = dense(p["mlp"]["fc1"])
    fc2_p = dense(p["mlp"]["fc2"])
    hidden = fc1_p["kernel"].shape[1]

    if sum_pv is None:
        sum_pv = True
    sum_pv = bool(sum_pv) and attn_impl == "exp2"
    if nomax is None:
        nomax = True
    nomax = bool(nomax) and attn_impl == "exp2"

    qkv_w = jnp.asarray(qkv_p["kernel"], jnp.float32)
    qkv_b = jnp.asarray(qkv_p["bias"], jnp.float32)
    if attn_impl == "exp2":
        # fold the q-scale and exp2's log2(e) into the q columns (exact at
        # the f32 param level — same fold as swin_block_fused)
        scale = (C // nh) ** -0.5 * math.log2(math.e)
        qs = jnp.concatenate([jnp.full((C,), scale, jnp.float32),
                              jnp.ones((2 * C,), jnp.float32)])
        qkv_w = qkv_w * qs[None, :]
        qkv_b = qkv_b * qs
    if sum_pv:
        hd_ = C // nh
        wv = qkv_w[:, 2 * C:].reshape(C, nh, hd_)
        bv = qkv_b[2 * C:].reshape(nh, hd_)
        wv2 = jnp.concatenate([wv, jnp.zeros((C, nh, 1), jnp.float32)],
                              axis=2)
        bv2 = jnp.concatenate([bv, jnp.ones((nh, 1), jnp.float32)], axis=1)
        qkv_w = jnp.concatenate(
            [qkv_w[:, :2 * C], wv2.reshape(C, nh * (hd_ + 1))], axis=1)
        qkv_b = jnp.concatenate([qkv_b[:2 * C], bv2.reshape(-1)])
    qkv_cols = qkv_w.shape[1]

    # big weight matrices go to VMEM pre-cast to the compute dtype (flax
    # Dense with dtype=bf16 casts f32 params to bf16 anyway) — halves their
    # VMEM footprint; 1-D params stay f32 for the f32 LN/bias adds
    wd = compute_dtype

    def v1(a):
        return jnp.asarray(a, jnp.float32).reshape(1, -1)

    args = [
        x,
        v1(p["norm1"]["scale"]), v1(p["norm1"]["bias"]),
        qkv_w.astype(wd), v1(qkv_b),
        jnp.asarray(proj_p["kernel"], wd), v1(proj_p["bias"]),
        v1(p["norm2"]["scale"]), v1(p["norm2"]["bias"]),
        jnp.asarray(fc1_p["kernel"], wd), v1(fc1_p["bias"]),
        jnp.asarray(fc2_p["kernel"], wd), v1(fc2_p["bias"]),
    ]

    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((G, N, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        const(1, C), const(1, C),
        const(C, qkv_cols), const(1, qkv_cols),
        const(C, C), const(1, C),
        const(1, C), const(1, C),
        const(C, hidden), const(1, hidden),
        const(hidden, C), const(1, C),
    ]
    return pl.pallas_call(
        partial(_vit_kernel, N=N, C=C, nh=nh, hidden=hidden, eps=eps,
                compute_dtype=compute_dtype, attn_impl=attn_impl,
                sum_pv=sum_pv, nomax=nomax, mlp_min_rows=mlp_min_rows),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=96 * 1024 * 1024),
        interpret=interpret,
    )(*args)
