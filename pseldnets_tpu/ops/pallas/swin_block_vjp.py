"""Training-mode fused Swin block: custom VJP with a hand-written Pallas
backward kernel.

Forward = the serving block kernel plus per-sample drop-path masks
(reference model_utilities.py:216-231: y = x + m0*attn(x); out = y + m1*mlp(y)
with m in {0, 1/keep}). Backward recomputes the forward inside one kernel per
image and produces dX plus all parameter gradients, accumulated across the
sequential TPU grid into constant-index output blocks — activations never
round-trip HBM between ops, the same property that makes the serving forward
2.4x the flax one.

Matmul operands run in ``compute_dtype`` with f32 accumulation — the same
numerics XLA uses for flax training at DEFAULT precision; LN/softmax/grad
chains are f32.
"""

from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .swin_block import _erf, _gelu_exact, _ln

Dtype = Any


def _gelu_grad(x: jnp.ndarray) -> jnp.ndarray:
    """d/dx gelu(x) = Phi(x) + x*phi(x), exact erf form."""
    xf = x.astype(jnp.float32)
    cdf = 0.5 * (1.0 + _erf(xf * np.float32(1 / np.sqrt(2))))
    pdf = jnp.exp(-0.5 * xf * xf) * np.float32(1 / np.sqrt(2 * np.pi))
    return cdf + xf * pdf


def _ln_fwd(xf):
    m = jnp.mean(xf, axis=-1, keepdims=True)
    c = xf - m
    v = jnp.mean(c * c, axis=-1, keepdims=True)
    r = jax.lax.rsqrt(v + 1e-5)
    return c * r, r  # xhat, rstd


def _ln_bwd(dout, xhat, r, gamma):
    dxhat = dout * gamma
    dx = r * (dxhat - jnp.mean(dxhat, axis=-1, keepdims=True)
              - xhat * jnp.mean(dxhat * xhat, axis=-1, keepdims=True))
    return dx


def _partition(img, H, W, w, C):
    v = img.reshape(H // w, w, W // w, w, C)
    return jnp.transpose(v, (0, 2, 1, 3, 4)).reshape(-1, C)


def _reverse(win, H, W, w, C):
    v = win.reshape(H // w, W // w, w, w, C)
    return jnp.transpose(v, (0, 2, 1, 3, 4)).reshape(H, W, C)


def _bwd_kernel(x_ref, dp_ref, dout_ref,
                ln1s, ln1b, qkvw, qkvb, projw, projb, ln2s, ln2b,
                fc1w, fc1b, fc2w, fc2b, bias_ref, mask_ref,
                dx_ref, dln1s, dln1b, dqkvw, dqkvb, dprojw, dprojb,
                dln2s, dln2b, dfc1w, dfc1b, dfc2w, dfc2b, dbias_ref, *,
                H, W, C, nh, w, shift, hidden, has_mask, compute_dtype):
    from jax.experimental import pallas as pl

    N = w * w
    nW = (H // w) * (W // w)
    hd = C // nh
    scale = np.float32(hd ** -0.5)
    cd = compute_dtype
    L = H * W

    @pl.when(pl.program_id(0) == 0)
    def _zero():
        for ref in (dln1s, dln1b, dqkvw, dqkvb, dprojw, dprojb, dln2s, dln2b,
                    dfc1w, dfc1b, dfc2w, dfc2b, dbias_ref):
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

    ps, vs, qs_s, ks = [], [], [], []
    outs = []
    for hh in range(nh):
        q = qkv[:, hh * hd:(hh + 1) * hd].reshape(nW, N, hd)
        k = qkv[:, C + hh * hd: C + (hh + 1) * hd].reshape(nW, N, hd)
        v = qkv[:, 2 * C + hh * hd: 2 * C + (hh + 1) * hd].reshape(nW, N, hd)
        qsc = q * jnp.asarray(scale, cd)
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

    a_out = (jnp.dot(attn, projw[:].astype(cd),
                     preferred_element_type=jnp.float32) + projb[0]).astype(cd)
    img2 = _reverse(a_out, H, W, w, C)
    if shift:
        img2 = jnp.roll(img2, shift=(shift, shift), axis=(0, 1))
    y = x0.astype(jnp.float32) + m0 * img2.reshape(L, C).astype(jnp.float32)
    yhat2, r2 = _ln_fwd(y)
    h2 = (yhat2 * ln2s[0] + ln2b[0]).astype(cd)

    # ---- backward ----------------------------------------------------------
    dout = dout_ref[0].astype(jnp.float32)  # (L, C)

    # MLP branch (chunked rows to bound f32 hidden live range)
    n_chunks = max(1, min(4, L // 512))
    rows = L // n_chunks
    dh2_parts = []
    for c in range(n_chunks):
        h2c = h2[c * rows:(c + 1) * rows]
        f1 = jnp.dot(h2c, fc1w[:].astype(cd),
                     preferred_element_type=jnp.float32) + fc1b[0]
        # gelu value and derivative share one erf evaluation
        cdf = 0.5 * (1.0 + _erf(f1 * np.float32(1 / np.sqrt(2)),
                                fast=(cd == jnp.bfloat16)))
        fg = (f1 * cdf).astype(cd)
        dgelu = cdf + f1 * (jnp.exp(-0.5 * f1 * f1)
                            * np.float32(1 / np.sqrt(2 * np.pi)))
        df2 = (m1 * dout[c * rows:(c + 1) * rows]).astype(cd)
        dfc2w[...] += jax.lax.dot_general(
            fg, df2, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dfc2b[...] += jnp.sum(df2.astype(jnp.float32), axis=0, keepdims=True)
        dfg = jax.lax.dot_general(df2, fc2w[:].astype(cd),
                                  (((1,), (1,)), ((), ())),
                                  preferred_element_type=jnp.float32)
        df1 = (dfg * dgelu).astype(cd)
        dfc1w[...] += jax.lax.dot_general(
            h2c, df1, (((0,), (0,)), ((), ())),
            preferred_element_type=jnp.float32)
        dfc1b[...] += jnp.sum(df1.astype(jnp.float32), axis=0, keepdims=True)
        dh2_parts.append(jax.lax.dot_general(
            df1, fc1w[:].astype(cd), (((1,), (1,)), ((), ())),
            preferred_element_type=jnp.float32))
    dh2 = jnp.concatenate(dh2_parts, axis=0)  # (L, C) f32

    dln2s[...] += jnp.sum(dh2 * yhat2, axis=0, keepdims=True)
    dln2b[...] += jnp.sum(dh2, axis=0, keepdims=True)
    dy = dout + _ln_bwd(dh2, yhat2, r2, ln2s[0])

    # attention branch
    dbr = (m0 * dy).reshape(H, W, C)
    if shift:
        dbr = jnp.roll(dbr, shift=(-shift, -shift), axis=(0, 1))
    dA = _partition(dbr, H, W, w, C).astype(cd)  # (nW*N, C)

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
                                 preferred_element_type=jnp.float32) * scale
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


def _dense(d: Dict) -> Dict:
    return d["base"] if "base" in d else d


def _bwd_call(x, p, dp_masks, dout, *, H, W, nh, window, shift,
              compute_dtype, interpret):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from .swin_block import _rel_bias
    from ...models.htsat import relative_position_index, shift_attn_mask

    B, L, C = x.shape
    w = window
    N = w * w
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

    args = [
        x, jnp.asarray(dp_masks, jnp.float32), dout,
        v1(p["norm1"]["scale"]), v1(p["norm1"]["bias"]),
        jnp.asarray(qkv_p["kernel"], jnp.float32), v1(qkv_p["bias"]),
        jnp.asarray(proj_p["kernel"], jnp.float32), v1(proj_p["bias"]),
        v1(p["norm2"]["scale"]), v1(p["norm2"]["bias"]),
        jnp.asarray(fc1_p["kernel"], jnp.float32), v1(fc1_p["bias"]),
        jnp.asarray(fc2_p["kernel"], jnp.float32), v1(fc2_p["bias"]),
        bias, mask,
    ]
    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((1, L, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 2), lambda b: (0, 0), memory_space=pltpu.SMEM),
        pl.BlockSpec((1, L, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        const(1, C), const(1, C),
        const(C, 3 * C), const(1, 3 * C),
        const(C, C), const(1, C),
        const(1, C), const(1, C),
        const(C, hidden), const(1, hidden),
        const(hidden, C), const(1, C),
        const(nh, N, N), const(mask.shape[0], N, N),
    ]
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
        const(nh, N, N),
    ]
    res = pl.pallas_call(
        partial(_bwd_kernel, H=H, W=W, C=C, nh=nh, w=w, shift=shift,
                hidden=hidden, has_mask=has_mask, compute_dtype=compute_dtype),
        grid=(B,),
        in_specs=in_specs,
        out_specs=out_specs,
        out_shape=out_shape,
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)
    (dx, dln1s, dln1b, dqkvw, dqkvb, dprojw, dprojb, dln2s, dln2b,
     dfc1w, dfc1b, dfc2w, dfc2b, dbias) = res

    # fold the (nh, N, N) bias grad back onto the (table, nh) parameter
    idx = jnp.asarray(relative_position_index(w).reshape(-1))
    tbl = p["attn"]["relative_position_bias_table"]
    dtable = jax.ops.segment_sum(dbias.transpose(1, 2, 0).reshape(N * N, nh),
                                 idx, num_segments=tbl.shape[0])

    def wrap(d, grad_k, grad_b):
        if "base" in d:
            return {"base": {"kernel": grad_k, "bias": grad_b}}
        return {"kernel": grad_k, "bias": grad_b}

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
    return dx, dp_tree


@partial(jax.custom_vjp, nondiff_argnums=(3, 4, 5, 6, 7, 8, 9))
def swin_block_train(x, p, dp_masks, H, W, nh, window, shift,
                     compute_dtype, interpret=False):
    """Differentiable fused Swin block with drop-path masks (B, 2)."""
    from .swin_block import swin_block_fused

    return swin_block_fused(x, p, H=H, W=W, nh=nh, window=window, shift=shift,
                            compute_dtype=compute_dtype, group=1,
                            dp_masks=dp_masks, interpret=interpret)


def _train_fwd(x, p, dp_masks, H, W, nh, window, shift, compute_dtype,
               interpret):
    out = swin_block_train(x, p, dp_masks, H, W, nh, window, shift,
                           compute_dtype, interpret)
    return out, (x, p, dp_masks)


def _train_bwd(H, W, nh, window, shift, compute_dtype, interpret, res, dout):
    x, p, dp_masks = res
    dx, dp_tree = _bwd_call(x, p, dp_masks, dout, H=H, W=W, nh=nh,
                            window=window, shift=shift,
                            compute_dtype=compute_dtype, interpret=interpret)
    return dx, dp_tree, jnp.zeros_like(dp_masks)


swin_block_train.defvjp(_train_fwd, _train_bwd)
