"""Fused Swin block with bottleneck adapters: custom VJP for AdapterBit
training (round-5 follow-up to the r9d fused-train default flip).

The plain fused train path (swin_block_vjp) excludes AdapterBit because its
adapters live INSIDE the block (reference model_utilities_adapt.py:7-42,
htsat.py:105-143, model_utilities.py:149-170):

* SpatialAdapter — ``a' = a + s * fc2(gelu(fc1(a)))`` applied to the
  attention-proj output on the window rows, before window-reverse and the
  drop-path residual;
* MlpAdapter — a parallel bottleneck on the MLP input:
  ``mlp'(h2) = fc2(gelu(fc1(h2))) + s * afc2(gelu(afc1(h2)))``.

Both are row-wise bottleneck MLPs (C -> C*mlp_ratio -> C, constant scalar
``s`` in the shipped configs), so they fuse into the same per-image kernels:
forward recomputes the swin_block_vjp form plus four small dots; backward
extends the hand-written kernel with the adapter chains and their parameter
grads (accumulated across the sequential grid like every other dW).

A block whose param tree carries only ONE of the two adapters runs with
zero-filled params for the other (exact no-op: gelu(0) @ W2 + 0 == 0); the
wrapper drops the unused grads. Learnable ``adapter_scalar`` is NOT fused —
train/fused_forward gates those configs back to flax.

Numerics follow swin_block_vjp: matmul operands in ``compute_dtype`` with f32
accumulation, LN/softmax/grad chains f32, exact-erf GELU (Abramowitz-Stegun
fast erf under bf16).
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .swin_block import _erf
from .swin_block_vjp import _dense, _ln_bwd, _ln_fwd, _partition, _reverse

Dtype = Any

# compile-bisect ablations (scripts/perf_r10b_compilecheck.py): "nosa"/"noma"
# drop the spatial/mlp adapter ops from the kernels (NOT math-preserving —
# debugging only, mirrors swin_block._ABLATE)
import os as _os

_ABLATE = set(filter(None, _os.environ.get("ADAPT_VJP_ABLATE", "").split(",")))

_INV_SQRT2 = np.float32(1 / np.sqrt(2))
_INV_SQRT2PI = np.float32(1 / np.sqrt(2 * np.pi))


def _gelu_pair(f1: jnp.ndarray, fast: bool):
    """(gelu(f1), d gelu/d f1) sharing one erf evaluation; f1 is f32."""
    cdf = 0.5 * (1.0 + _erf(f1 * _INV_SQRT2, fast=fast))
    val = f1 * cdf
    grad = cdf + f1 * (jnp.exp(-0.5 * f1 * f1) * _INV_SQRT2PI)
    return val, grad


def _fwd_kernel(x_ref, dp_ref,
                ln1s, ln1b, qkvw, qkvb, projw, projb, ln2s, ln2b,
                fc1w, fc1b, fc2w, fc2b,
                sa1w, sa1b, sa2w, sa2b, ma1w, ma1b, ma2w, ma2b,
                bias_ref, mask_ref, out_ref, *,
                H, W, C, nh, w, shift, scale, has_mask, compute_dtype):
    from jax.experimental import pallas as pl

    N = w * w
    nW = (H // w) * (W // w)
    hd = C // nh
    qscale = np.float32(hd ** -0.5)
    cd = compute_dtype
    fast = cd == jnp.bfloat16
    L = H * W
    s_ad = np.float32(scale)

    pid = pl.program_id(0)
    m0 = dp_ref[pid, 0]
    m1 = dp_ref[pid, 1]

    x0 = x_ref[0].astype(cd)  # (L, C)
    xf = x0.astype(jnp.float32)
    xhat1, _ = _ln_fwd(xf)
    h = (xhat1 * ln1s[0] + ln1b[0]).astype(cd)
    img = h.reshape(H, W, C)
    if shift:
        img = jnp.roll(img, shift=(-shift, -shift), axis=(0, 1))
    win = _partition(img, H, W, w, C)  # (nW*N, C)

    qkv = (jnp.dot(win, qkvw[:].astype(cd),
                   preferred_element_type=jnp.float32) + qkvb[0]).astype(cd)
    outs = []
    for hh in range(nh):
        q = qkv[:, hh * hd:(hh + 1) * hd].reshape(nW, N, hd)
        k = qkv[:, C + hh * hd: C + (hh + 1) * hd].reshape(nW, N, hd)
        v = qkv[:, 2 * C + hh * hd: 2 * C + (hh + 1) * hd].reshape(nW, N, hd)
        s = jax.lax.dot_general(q * jnp.asarray(qscale, cd), k,
                                (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[hh][None]
        if has_mask:
            s = s + mask_ref[:]
        p = jax.nn.softmax(s, axis=-1).astype(cd)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        outs.append(o.reshape(nW * N, hd))
    attn = jnp.concatenate(outs, axis=-1).astype(cd)

    a_pre = (jnp.dot(attn, projw[:].astype(cd),
                     preferred_element_type=jnp.float32) + projb[0]).astype(cd)
    img2 = _reverse(a_pre, H, W, w, C)
    if shift:
        img2 = jnp.roll(img2, shift=(shift, shift), axis=(0, 1))
    a2d = img2.reshape(L, C)
    if "nosa" in _ABLATE:
        branch = a2d.astype(jnp.float32)
    else:
        # spatial adapter: a' = a + s*fc2(gelu(fc1(a))) — row-wise, so it
        # commutes with window-reverse/roll; applying it AFTER the
        # permutation keeps the transpose input a plain dot output (the
        # pre-reverse form hangs the Mosaic compile — r10b bisect)
        f1s = jnp.dot(a2d, sa1w[:].astype(cd),
                      preferred_element_type=jnp.float32) + sa1b[0]
        gs, _ = _gelu_pair(f1s, fast)
        branch = a2d.astype(jnp.float32) + s_ad * (
            jnp.dot(gs.astype(cd), sa2w[:].astype(cd),
                    preferred_element_type=jnp.float32) + sa2b[0])
    y = xf + m0 * branch
    yhat2, _ = _ln_fwd(y)
    h2 = (yhat2 * ln2s[0] + ln2b[0]).astype(cd)

    n_chunks = max(1, min(4, L // 512))
    rows = L // n_chunks
    pieces = []
    for c in range(n_chunks):
        h2c = h2[c * rows:(c + 1) * rows]
        f1 = jnp.dot(h2c, fc1w[:].astype(cd),
                     preferred_element_type=jnp.float32) + fc1b[0]
        fg, _ = _gelu_pair(f1, fast)
        mo = jnp.dot(fg.astype(cd), fc2w[:].astype(cd),
                     preferred_element_type=jnp.float32) + fc2b[0]
        if "noma" not in _ABLATE:
            # parallel MLP adapter on the same LN2 rows
            f1m = jnp.dot(h2c, ma1w[:].astype(cd),
                          preferred_element_type=jnp.float32) + ma1b[0]
            gm, _ = _gelu_pair(f1m, fast)
            mo = mo + s_ad * (jnp.dot(gm.astype(cd), ma2w[:].astype(cd),
                                      preferred_element_type=jnp.float32)
                              + ma2b[0])
        pieces.append((y[c * rows:(c + 1) * rows]
                       + m1 * mo).astype(out_ref.dtype))
    out_ref[0] = jnp.concatenate(pieces, axis=0)


def _bwd_kernel(x_ref, dp_ref, dout_ref,
                ln1s, ln1b, qkvw, qkvb, projw, projb, ln2s, ln2b,
                fc1w, fc1b, fc2w, fc2b,
                sa1w, sa1b, sa2w, sa2b, ma1w, ma1b, ma2w, ma2b,
                bias_ref, mask_ref,
                dx_ref, dln1s, dln1b, dqkvw, dqkvb, dprojw, dprojb,
                dln2s, dln2b, dfc1w, dfc1b, dfc2w, dfc2b,
                dsa1w, dsa1b, dsa2w, dsa2b, dma1w, dma1b, dma2w, dma2b,
                dbias_ref, *,
                H, W, C, nh, w, shift, scale, has_mask, compute_dtype):
    from jax.experimental import pallas as pl

    N = w * w
    nW = (H // w) * (W // w)
    hd = C // nh
    qscale = np.float32(hd ** -0.5)
    cd = compute_dtype
    fast = cd == jnp.bfloat16
    L = H * W
    s_ad = np.float32(scale)

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in (dln1s, dln1b, dqkvw, dqkvb, dprojw, dprojb, dln2s, dln2b,
                    dfc1w, dfc1b, dfc2w, dfc2b,
                    dsa1w, dsa1b, dsa2w, dsa2b, dma1w, dma1b, dma2w, dma2b,
                    dbias_ref):
            ref[...] = jnp.zeros_like(ref)

    pid = pl.program_id(0)
    m0 = dp_ref[pid, 0]
    m1 = dp_ref[pid, 1]

    # ---- recompute forward -------------------------------------------------
    x0 = x_ref[0].astype(cd)  # (L, C)
    xf = x0.astype(jnp.float32)
    xhat1, r1 = _ln_fwd(xf)
    h = (xhat1 * ln1s[0] + ln1b[0]).astype(cd)
    img = h.reshape(H, W, C)
    if shift:
        img = jnp.roll(img, shift=(-shift, -shift), axis=(0, 1))
    win = _partition(img, H, W, w, C)  # (nW*N, C)

    qkv = (jnp.dot(win, qkvw[:].astype(cd),
                   preferred_element_type=jnp.float32) + qkvb[0]).astype(cd)

    ps, vs, qs_s, ks, outs = [], [], [], [], []
    for hh in range(nh):
        q = qkv[:, hh * hd:(hh + 1) * hd].reshape(nW, N, hd)
        k = qkv[:, C + hh * hd: C + (hh + 1) * hd].reshape(nW, N, hd)
        v = qkv[:, 2 * C + hh * hd: 2 * C + (hh + 1) * hd].reshape(nW, N, hd)
        qsc = q * jnp.asarray(qscale, cd)
        s = jax.lax.dot_general(qsc, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s + bias_ref[hh][None]
        if has_mask:
            s = s + mask_ref[:]
        p = jax.nn.softmax(s, axis=-1).astype(cd)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        ps.append(p)
        vs.append(v)
        qs_s.append(qsc)
        ks.append(k)
        outs.append(o.reshape(nW * N, hd))
    attn = jnp.concatenate(outs, axis=-1).astype(cd)

    a_pre = (jnp.dot(attn, projw[:].astype(cd),
                     preferred_element_type=jnp.float32) + projb[0]).astype(cd)
    img2 = _reverse(a_pre, H, W, w, C)
    if shift:
        img2 = jnp.roll(img2, shift=(shift, shift), axis=(0, 1))
    a2d = img2.reshape(L, C)
    # spatial adapter AFTER the reverse/roll permutation (row-wise — exact;
    # the pre-reverse form hangs the Mosaic compile, r10b bisect)
    f1s = jnp.dot(a2d, sa1w[:].astype(cd),
                  preferred_element_type=jnp.float32) + sa1b[0]
    gs, dgelus = _gelu_pair(f1s, fast)
    branch = a2d.astype(jnp.float32) + s_ad * (
        jnp.dot(gs.astype(cd), sa2w[:].astype(cd),
                preferred_element_type=jnp.float32) + sa2b[0])
    y = xf + m0 * branch
    yhat2, r2 = _ln_fwd(y)
    h2 = (yhat2 * ln2s[0] + ln2b[0]).astype(cd)

    # ---- backward ----------------------------------------------------------
    dout = dout_ref[0].astype(jnp.float32)  # (L, C)

    # MLP branch + parallel adapter (chunked rows like swin_block_vjp)
    n_chunks = max(1, min(4, L // 512))
    rows = L // n_chunks
    dh2_parts = []
    for c in range(n_chunks):
        h2c = h2[c * rows:(c + 1) * rows]
        f1 = jnp.dot(h2c, fc1w[:].astype(cd),
                     preferred_element_type=jnp.float32) + fc1b[0]
        fgf, dgelu = _gelu_pair(f1, fast)
        fg = fgf.astype(cd)
        df2f = m1 * dout[c * rows:(c + 1) * rows]
        df2 = df2f.astype(cd)
        dfc2w[...] += jax.lax.dot_general(
            fg, df2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dfc2b[...] += jnp.sum(df2f, axis=0, keepdims=True)
        dfg = jax.lax.dot_general(df2, fc2w[:].astype(cd),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        df1 = (dfg * dgelu).astype(cd)
        dfc1w[...] += jax.lax.dot_general(
            h2c, df1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dfc1b[...] += jnp.sum(df1.astype(jnp.float32), axis=0, keepdims=True)
        dh2_c = jax.lax.dot_general(df1, fc1w[:].astype(cd),
                                    (((1,), (1,)), ((), ())),
                                    preferred_element_type=jnp.float32)
        # adapter chain: mlp' = mlp + s*afc2(gelu(afc1(h2)))
        f1m = jnp.dot(h2c, ma1w[:].astype(cd),
                      preferred_element_type=jnp.float32) + ma1b[0]
        gmf, dgelum = _gelu_pair(f1m, fast)
        gm = gmf.astype(cd)
        g2m = (s_ad * df2f).astype(cd)
        dma2w[...] += jax.lax.dot_general(
            gm, g2m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dma2b[...] += jnp.sum(s_ad * df2f, axis=0, keepdims=True)
        dgm = jax.lax.dot_general(g2m, ma2w[:].astype(cd),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        df1m = (dgm * dgelum).astype(cd)
        dma1w[...] += jax.lax.dot_general(
            h2c, df1m, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dma1b[...] += jnp.sum(df1m.astype(jnp.float32), axis=0, keepdims=True)
        dh2_c = dh2_c + jax.lax.dot_general(
            df1m, ma1w[:].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32)
        dh2_parts.append(dh2_c)
    dh2 = jnp.concatenate(dh2_parts, axis=0)  # (L, C) f32

    dln2s[...] += jnp.sum(dh2 * yhat2, axis=0, keepdims=True)
    dln2b[...] += jnp.sum(dh2, axis=0, keepdims=True)
    dy = dout + _ln_bwd(dh2, yhat2, r2, ln2s[0])

    # attention branch (grad arrives at branch = a2d + s*adapter(a2d), in
    # the post-reverse row order)
    dbranch = m0 * dy  # (L, C) f32
    # spatial adapter backward on the reversed rows
    g2s = (s_ad * dbranch).astype(cd)
    dsa2w[...] += jax.lax.dot_general(
        gs.astype(cd), g2s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dsa2b[...] += jnp.sum(s_ad * dbranch, axis=0, keepdims=True)
    dgs = jax.lax.dot_general(g2s, sa2w[:].astype(cd),
                              (((1,), (1,)), ((), ())),
                              preferred_element_type=jnp.float32)
    df1s = (dgs * dgelus).astype(cd)
    dsa1w[...] += jax.lax.dot_general(
        a2d, df1s, (((0,), (0,)), ((), ())),
        preferred_element_type=jnp.float32)
    dsa1b[...] += jnp.sum(df1s.astype(jnp.float32), axis=0, keepdims=True)
    da2d = dbranch + jax.lax.dot_general(
        df1s, sa1w[:].astype(cd), (((1,), (1,)), ((), ())),
        preferred_element_type=jnp.float32)

    dbr = da2d.reshape(H, W, C)
    if shift:
        dbr = jnp.roll(dbr, shift=(-shift, -shift), axis=(0, 1))
    dA = _partition(dbr, H, W, w, C).astype(cd)  # grad at a_pre, window rows

    dprojw[...] += jax.lax.dot_general(attn, dA, (((0,), (0,)), ((), ())),
                                       preferred_element_type=jnp.float32)
    dprojb[...] += jnp.sum(dA.astype(jnp.float32), axis=0, keepdims=True)
    dattn = jax.lax.dot_general(dA, projw[:].astype(cd),
                                (((1,), (1,)), ((), ())),
                                preferred_element_type=jnp.float32).astype(cd)

    dqs, dks, dvs = [], [], []
    for hh in range(nh):
        dO = dattn[:, hh * hd:(hh + 1) * hd].reshape(nW, N, hd)
        p, v, qsc, k = ps[hh], vs[hh], qs_s[hh], ks[hh]
        dP = jax.lax.dot_general(dO, v, (((2,), (2,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dV = jax.lax.dot_general(p, dO, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        pf = p.astype(jnp.float32)
        dS = pf * (dP - jnp.sum(dP * pf, axis=-1, keepdims=True))
        dbias_ref[hh] += jnp.sum(dS, axis=0)
        dSc = dS.astype(cd)
        dq = jax.lax.dot_general(dSc, k, (((2,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32) * qscale
        dk = jax.lax.dot_general(dSc, qsc, (((1,), (1,)), ((0,), (0,))),
                                 preferred_element_type=jnp.float32)
        dqs.append(dq.reshape(nW * N, hd))
        dks.append(dk.reshape(nW * N, hd))
        dvs.append(dV.reshape(nW * N, hd))
    dqkv = jnp.concatenate(dqs + dks + dvs, axis=-1).astype(cd)  # (nW*N, 3C)

    dqkvw[...] += jax.lax.dot_general(win, dqkv, (((0,), (0,)), ((), ())),
                                      preferred_element_type=jnp.float32)
    dqkvb[...] += jnp.sum(dqkv.astype(jnp.float32), axis=0, keepdims=True)
    dwin = jax.lax.dot_general(dqkv, qkvw[:].astype(cd),
                               (((1,), (1,)), ((), ())),
                               preferred_element_type=jnp.float32)

    dh_img = _reverse(dwin.astype(cd), H, W, w, C)
    if shift:
        dh_img = jnp.roll(dh_img, shift=(shift, shift), axis=(0, 1))
    dh = dh_img.reshape(L, C).astype(jnp.float32)

    dln1s[...] += jnp.sum(dh * xhat1, axis=0, keepdims=True)
    dln1b[...] += jnp.sum(dh, axis=0, keepdims=True)
    dx = dy + _ln_bwd(dh, xhat1, r1, ln1s[0])
    dx_ref[0] = dx.astype(dx_ref.dtype)


def _adapter_mats(p: Dict, where: str, C: int, ch: int):
    """(fc1w, fc1b, fc2w, fc2b) f32 arrays; zeros when the subtree is absent
    (exact no-op in the kernel: gelu(0) @ W2 + 0 == 0)."""
    sub = p[where].get("adapter") if isinstance(p.get(where), dict) else None
    if sub is None:
        return (jnp.zeros((C, ch), jnp.float32), jnp.zeros((1, ch), jnp.float32),
                jnp.zeros((ch, C), jnp.float32), jnp.zeros((1, C), jnp.float32))
    if "scale" in sub:
        raise NotImplementedError(
            "learnable adapter_scalar is not fused — gate to flax "
            "(train/fused_forward.supports_fused_train)")
    return (jnp.asarray(sub["fc1"]["kernel"], jnp.float32),
            jnp.asarray(sub["fc1"]["bias"], jnp.float32).reshape(1, -1),
            jnp.asarray(sub["fc2"]["kernel"], jnp.float32),
            jnp.asarray(sub["fc2"]["bias"], jnp.float32).reshape(1, -1))


def _adapter_hidden(p: Dict) -> int:
    for where in ("attn", "mlp"):
        sub = p[where].get("adapter") if isinstance(p.get(where), dict) else None
        if sub is not None:
            return sub["fc1"]["kernel"].shape[1]
    raise ValueError("no adapter subtree in block params — use swin_block_train")


def _common_args_specs(x, p, H, W, nh, window, shift):
    """Shared (param args, const specs) for fwd and bwd pallas calls."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .swin_block import _rel_bias
    from ...models.htsat import shift_attn_mask

    B, L, C = x.shape
    w = window
    N = w * w
    ch = _adapter_hidden(p)
    qkv_p, proj_p = _dense(p["attn"]["qkv"]), _dense(p["attn"]["proj"])
    fc1_p, fc2_p = _dense(p["mlp"]["fc1"]), _dense(p["mlp"]["fc2"])
    hidden = fc1_p["kernel"].shape[1]

    bias = _rel_bias(p["attn"]["relative_position_bias_table"], w, nh)
    if shift > 0:
        mask = jnp.asarray(shift_attn_mask(H, W, w, shift))
        has_mask = True
    else:
        mask = jnp.zeros((1, N, N), jnp.float32)
        has_mask = False

    def v1(a):
        return jnp.asarray(a, jnp.float32).reshape(1, -1)

    sa = _adapter_mats(p, "attn", C, ch)
    ma = _adapter_mats(p, "mlp", C, ch)
    args = [
        v1(p["norm1"]["scale"]), v1(p["norm1"]["bias"]),
        jnp.asarray(qkv_p["kernel"], jnp.float32), v1(qkv_p["bias"]),
        jnp.asarray(proj_p["kernel"], jnp.float32), v1(proj_p["bias"]),
        v1(p["norm2"]["scale"]), v1(p["norm2"]["bias"]),
        jnp.asarray(fc1_p["kernel"], jnp.float32), v1(fc1_p["bias"]),
        jnp.asarray(fc2_p["kernel"], jnp.float32), v1(fc2_p["bias"]),
        *sa, *ma,
        bias, mask,
    ]
    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    const_specs = [
        const(1, C), const(1, C),
        const(C, 3 * C), const(1, 3 * C),
        const(C, C), const(1, C),
        const(1, C), const(1, C),
        const(C, hidden), const(1, hidden),
        const(hidden, C), const(1, C),
        const(C, ch), const(1, ch), const(ch, C), const(1, C),
        const(C, ch), const(1, ch), const(ch, C), const(1, C),
        const(nh, N, N), const(mask.shape[0], N, N),
    ]
    return args, const_specs, const, has_mask, hidden, ch


def _fwd_call(x, p, dp_masks, *, H, W, nh, window, shift, scale,
              compute_dtype, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, C = x.shape
    args, const_specs, _, has_mask, _, _ = _common_args_specs(
        x, p, H, W, nh, window, shift)
    in_specs = [
        pl.BlockSpec((1, L, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 2), lambda b: (0, 0), memory_space=pltpu.SMEM),
    ] + const_specs
    out = pl.pallas_call(
        partial(_fwd_kernel, H=H, W=W, C=C, nh=nh, w=window, shift=shift,
                scale=scale, has_mask=has_mask, compute_dtype=compute_dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, L, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, jnp.asarray(dp_masks, jnp.float32), *args)
    return out


def _bwd_call(x, p, dp_masks, dout, *, H, W, nh, window, shift, scale,
              compute_dtype, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from ...models.htsat import relative_position_index

    B, L, C = x.shape
    w = window
    N = w * w
    args, const_specs, const, has_mask, hidden, ch = _common_args_specs(
        x, p, H, W, nh, window, shift)
    in_specs = [
        pl.BlockSpec((1, L, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 2), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, L, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
    ] + const_specs
    f32 = jnp.float32
    out_shape = [
        jax.ShapeDtypeStruct((B, L, C), x.dtype),        # dx
        jax.ShapeDtypeStruct((1, C), f32),               # dln1s
        jax.ShapeDtypeStruct((1, C), f32),               # dln1b
        jax.ShapeDtypeStruct((C, 3 * C), f32),           # dqkvw
        jax.ShapeDtypeStruct((1, 3 * C), f32),           # dqkvb
        jax.ShapeDtypeStruct((C, C), f32),               # dprojw
        jax.ShapeDtypeStruct((1, C), f32),               # dprojb
        jax.ShapeDtypeStruct((1, C), f32),               # dln2s
        jax.ShapeDtypeStruct((1, C), f32),               # dln2b
        jax.ShapeDtypeStruct((C, hidden), f32),          # dfc1w
        jax.ShapeDtypeStruct((1, hidden), f32),          # dfc1b
        jax.ShapeDtypeStruct((hidden, C), f32),          # dfc2w
        jax.ShapeDtypeStruct((1, C), f32),               # dfc2b
        jax.ShapeDtypeStruct((C, ch), f32),              # dsa1w
        jax.ShapeDtypeStruct((1, ch), f32),              # dsa1b
        jax.ShapeDtypeStruct((ch, C), f32),              # dsa2w
        jax.ShapeDtypeStruct((1, C), f32),               # dsa2b
        jax.ShapeDtypeStruct((C, ch), f32),              # dma1w
        jax.ShapeDtypeStruct((1, ch), f32),              # dma1b
        jax.ShapeDtypeStruct((ch, C), f32),              # dma2w
        jax.ShapeDtypeStruct((1, C), f32),               # dma2b
        jax.ShapeDtypeStruct((nh, N, N), f32),           # dbias
    ]
    out_specs = [
        pl.BlockSpec((1, L, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        const(1, C), const(1, C),
        const(C, 3 * C), const(1, 3 * C),
        const(C, C), const(1, C),
        const(1, C), const(1, C),
        const(C, hidden), const(1, hidden),
        const(hidden, C), const(1, C),
        const(C, ch), const(1, ch), const(ch, C), const(1, C),
        const(C, ch), const(1, ch), const(ch, C), const(1, C),
        const(nh, N, N),
    ]
    res = pl.pallas_call(
        partial(_bwd_kernel, H=H, W=W, C=C, nh=nh, w=w, shift=shift,
                scale=scale, has_mask=has_mask, compute_dtype=compute_dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(x, jnp.asarray(dp_masks, jnp.float32), dout, *args)
    (dx, dln1s, dln1b, dqkvw, dqkvb, dprojw, dprojb, dln2s, dln2b,
     dfc1w, dfc1b, dfc2w, dfc2b,
     dsa1w, dsa1b, dsa2w, dsa2b, dma1w, dma1b, dma2w, dma2b, dbias) = res

    idx = jnp.asarray(relative_position_index(w).reshape(-1))
    tbl = p["attn"]["relative_position_bias_table"]
    dtable = jax.ops.segment_sum(dbias.transpose(1, 2, 0).reshape(N * N, nh),
                                 idx, num_segments=tbl.shape[0])

    def wrap(d, grad_k, grad_b):
        if "base" in d:
            return {"base": {"kernel": grad_k, "bias": grad_b}}
        return {"kernel": grad_k, "bias": grad_b}

    def ad_tree(grad1w, grad1b, grad2w, grad2b):
        return {"fc1": {"kernel": grad1w, "bias": grad1b[0]},
                "fc2": {"kernel": grad2w, "bias": grad2b[0]}}

    dp_tree = {
        "norm1": {"scale": dln1s[0], "bias": dln1b[0]},
        "norm2": {"scale": dln2s[0], "bias": dln2b[0]},
        "attn": {
            "qkv": wrap(p["attn"]["qkv"], dqkvw, dqkvb[0]),
            "proj": wrap(p["attn"]["proj"], dprojw, dprojb[0]),
            "relative_position_bias_table": dtable.astype(tbl.dtype),
        },
        "mlp": {
            "fc1": wrap(p["mlp"]["fc1"], dfc1w, dfc1b[0]),
            "fc2": wrap(p["mlp"]["fc2"], dfc2w, dfc2b[0]),
        },
    }
    if "adapter" in p["attn"]:
        dp_tree["attn"]["adapter"] = ad_tree(dsa1w, dsa1b, dsa2w, dsa2b)
    if "adapter" in p["mlp"]:
        dp_tree["mlp"]["adapter"] = ad_tree(dma1w, dma1b, dma2w, dma2b)
    return dx, dp_tree


def swin_block_adapt_eval(x, p, *, H, W, nh, window, shift, scale,
                          compute_dtype=jnp.bfloat16, interpret=False):
    """Eval-mode fused block with bottleneck adapters (drop-path masks = 1;
    no VJP). Serving path for AdapterBit-tuned checkpoints
    (serving/htsat.htsat_fused_forward routes here when the param tree
    carries adapters)."""
    masks = jnp.ones((x.shape[0], 2), jnp.float32)
    return _fwd_call(x, p, masks, H=H, W=W, nh=nh, window=window,
                     shift=shift, scale=scale, compute_dtype=compute_dtype,
                     interpret=interpret)


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9, 10))
def swin_block_train_adapt(x, p, dp_masks, H, W, nh, window, shift, scale,
                           compute_dtype, interpret=False):
    """Differentiable fused Swin block with bottleneck adapters.

    ``p`` may carry ``attn.adapter`` and/or ``mlp.adapter`` subtrees
    (fc1/fc2 each); ``scale`` is the constant ``adapter_scalar``.
    """
    return _fwd_call(x, p, dp_masks, H=H, W=W, nh=nh, window=window,
                     shift=shift, scale=scale, compute_dtype=compute_dtype,
                     interpret=interpret)


def _train_fwd(x, p, dp_masks, H, W, nh, window, shift, scale, compute_dtype,
               interpret):
    out = swin_block_train_adapt(x, p, dp_masks, H, W, nh, window, shift,
                                 scale, compute_dtype, interpret)
    return out, (x, p, dp_masks)


def _train_bwd(H, W, nh, window, shift, scale, compute_dtype, interpret,
               res, dout):
    x, p, dp_masks = res
    dx, dp_tree = _bwd_call(x, p, dp_masks, dout, H=H, W=W, nh=nh,
                            window=window, shift=shift, scale=scale,
                            compute_dtype=compute_dtype, interpret=interpret)
    return dx, dp_tree, jnp.zeros_like(dp_masks)


swin_block_train_adapt.defvjp(_train_fwd, _train_bwd)
