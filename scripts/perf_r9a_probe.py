#!/usr/bin/env python
"""Probe R9A (round 5): bucket the PaSST fused ViT block (VERDICT #1).

r7d put 93% of the 79.7 ms passt step inside 7 x 10.6 ms block kernels and
PERF.md called it "~16% MXU" by rough math. Correct padded-MAC arithmetic
(every dot's K/N padded to 128 lanes, N=602 C=768 nh=12 hd=64 hidden=3072,
sum_pv v width 65 -> 128; PatchEmbed pads, so the grid is (6,100) -> 602
tokens with cls+dist):
    qkv   602*768*2432          = 1.124G
    s+PV  2 * 12*602^2*128      = 1.113G
    proj  602*768*768           = 355M
    mlp   2 * 602*768*3072      = 2841M
  = 5.43G padded MACs/image -> x128 = 695G/block. The calib kernel measures
the in-Pallas dense ceiling directly (first run: 600G MACs in 2.933 ms =
204.6 T padded-MACs/s), putting the block's dot floor at ~3.4 ms vs the
10.6 ms measured — the kernel runs at ~32% of its achievable rate. This probe buckets the remaining ~5 ms/block and compile-checks the
candidate reformulations on-chip (r4h lesson: interpret parity does not
validate Mosaic legality):

  baseline    production vit_block_fused exp2 (sum_pv+nomax, G=4)
  abl:*       _ABLATE nulls of softmax / gelu / ln (r5f methodology)
  dots        exact dot schedule, ALL elementwise removed (r7b methodology)
  calib       dense (R,768)x(768,3072) matmul-only kernel, same grid
  G=2/G=8     group sweep (VMEM pressure vs pipelining)
  mlp512      MLP chunk rows 497 -> 994
  batched     heads ride the dot_general batch dim (hd=64 head-split
              reshape — the hd=24 Swin version was Mosaic-illegal; 64 may
              be a legal granule)
  pairqk      per-head [q|k] DIRECT dots (nh dots of (768,128), zero pad
              waste = exactly the packed qk MACs) + v per-head 128-lane
              blocks -> every in-kernel slice tile-aligned
  pairqk_ph   pairqk + per-head proj fold (no concat; +293M padded MACs)
  vpad        production layout but v blocks padded 65 -> 128 lanes
              (qkv buffer slices of v become tile-aligned)

Quiet box required.
"""

import sys
import time
from functools import partial
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp
import numpy as np

from jax.experimental import pallas as pl
from jax.experimental.pallas import tpu as pltpu

from pseldnets_tpu.ops.pallas import swin_block as sb
from pseldnets_tpu.ops.pallas.vit_block import vit_block_fused
from pseldnets_tpu.ops.pallas.swin_block import (_gelu_poly, _ln as _ln_eps)

import math

import os as _os

INTERPRET = _os.environ.get("R9A_INTERPRET") == "1"
B = int(_os.environ.get("R9A_B", "128"))
N = int(_os.environ.get("R9A_N", "602"))  # PaSST grid (6,100) + cls/dist
C = 768
NH = 12
HD = C // NH
HID = 4 * C
EPS = 1e-6
K = int(_os.environ.get("R9A_K", "32"))
ITERS = int(_os.environ.get("R9A_ITERS", "3"))
CD = jnp.bfloat16


def k_time(fn, args, K=K, iters=ITERS):
    @jax.jit
    def step(k0, *a):
        return jax.lax.fori_loop(
            0, K, lambda i, acc: acc + fn(k0 * K + i, *a), jnp.float32(0))

    _ = float(step(jnp.int32(0), *args))
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(jnp.int32(i + 1), *args))
    return (time.perf_counter() - t0) / (iters * K)


def make_params(rng):
    r = np.random.default_rng(rng)

    def d(*shape, s=0.02):
        return jnp.asarray(r.normal(0, s, shape), jnp.float32)

    return {
        "norm1": {"scale": jnp.ones((C,)), "bias": d(C)},
        "attn": {"qkv": {"kernel": d(C, 3 * C), "bias": d(3 * C)},
                 "proj": {"kernel": d(C, C), "bias": d(C)}},
        "norm2": {"scale": jnp.ones((C,)), "bias": d(C)},
        "mlp": {"fc1": {"kernel": d(C, HID), "bias": d(HID)},
                "fc2": {"kernel": d(HID, C), "bias": d(C)}},
    }


# ---------------------------------------------------------------- variants

def vary(k0, xx):
    """per-iteration input variation that PRESERVES xx's dtype (a concrete
    f32 scalar would promote bf16 inputs to f32)."""
    s = (1.0 + 1e-4 * k0.astype(jnp.float32)).astype(xx.dtype)
    return xx * s


def _mlp_prod(y, ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, chunk_rows):
    R = y.shape[0]
    nck = max(1, R // chunk_rows)
    while R % nck:
        nck -= 1
    rows = R // nck

    def mlp(yc):
        h2 = _ln_eps(yc.astype(jnp.float32), ln2s[0], ln2b[0], False,
                     EPS).astype(CD)
        f = jnp.dot(h2, fc1w[:].astype(CD),
                    preferred_element_type=jnp.float32) + fc1b[0]
        f = _gelu_poly(f).astype(CD)
        return (jnp.dot(f, fc2w[:].astype(CD),
                        preferred_element_type=jnp.float32) + fc2b[0]).astype(CD)

    return jnp.concatenate(
        [(y[c * rows:(c + 1) * rows] + mlp(y[c * rows:(c + 1) * rows]))
         for c in range(nck)], axis=0)


def _kern_dots(x_ref, qkvw, projw, fc1w, fc2w, out_ref, *, G):
    """r7b 'dots': exact production dot schedule, all elementwise removed."""
    x0 = x_ref[:].astype(CD)
    hv = HD + 1
    qkv = jnp.dot(x0.reshape(G * N, C), qkvw[:],
                  preferred_element_type=jnp.float32).astype(CD)
    heads = []
    for hh in range(NH):
        q = qkv[:, hh * HD:(hh + 1) * HD].reshape(G, N, HD)
        k = qkv[:, C + hh * HD: C + (hh + 1) * HD].reshape(G, N, HD)
        v = qkv[:, 2 * C + hh * hv: 2 * C + hh * hv + hv].reshape(G, N, hv)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = jax.lax.dot_general(s.astype(CD), v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        heads.append(o[..., :HD].reshape(G * N, HD).astype(CD))
    attn = jnp.concatenate(heads, axis=-1)
    y = jnp.dot(attn, projw[:], preferred_element_type=jnp.float32).astype(CD)
    nck = 4 if (G * N) % 4 == 0 else 1
    rows = (G * N) // nck
    outs = []
    for c2 in range(nck):
        f = jnp.dot(y[c2 * rows:(c2 + 1) * rows], fc1w[:],
                    preferred_element_type=jnp.float32).astype(CD)
        outs.append(jnp.dot(f, fc2w[:],
                            preferred_element_type=jnp.float32).astype(CD))
    out_ref[:] = jnp.concatenate(outs, axis=0).reshape(G, N, C)


def _kern_calib(x_ref, w_ref, out_ref, *, G, reps):
    acc = x_ref[:].reshape(G * N, C).astype(CD)
    for _ in range(reps):
        f = jnp.dot(acc, w_ref[:], preferred_element_type=jnp.float32)
        acc = f[:, :C].astype(CD)
    out_ref[:] = acc.reshape(G, N, C)


def _kern_batched(x_ref, ln1s, ln1b, qkvw, qkvb, projw, projb,
                  ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, out_ref, *, G,
                  chunk_rows=512):
    """heads on the dot_general batch dim via one head-split reshape."""
    x0 = x_ref[:].astype(CD)
    h = _ln_eps(x0.astype(jnp.float32), ln1s[0], ln1b[0], False,
                EPS).astype(CD)
    qkv = (jnp.dot(h.reshape(G * N, C), qkvw[:].astype(CD),
                   preferred_element_type=jnp.float32) + qkvb[0]).astype(CD)

    def hsplit(cols):  # (G*N, C) -> (G*NH, N, HD)
        t = cols.reshape(G, N, NH, HD)
        return jnp.transpose(t, (0, 2, 1, 3)).reshape(G * NH, N, HD)

    q = hsplit(qkv[:, :C])
    k = hsplit(qkv[:, C:2 * C])
    v = hsplit(qkv[:, 2 * C:])
    s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    e = jnp.exp2(s)
    ec = e.astype(CD)
    o = jax.lax.dot_general(ec, v, (((2,), (1,)), ((0,), (0,))),
                            preferred_element_type=jnp.float32)
    o = o / jnp.sum(ec, axis=-1, keepdims=True, dtype=s.dtype)
    o = o.reshape(G, NH, N, HD)
    attn = jnp.transpose(o, (0, 2, 1, 3)).reshape(G * N, C).astype(CD)
    attn = (jnp.dot(attn, projw[:].astype(CD),
                    preferred_element_type=jnp.float32) + projb[0]).astype(CD)
    y = (x0.reshape(G * N, C) + attn)
    out = _mlp_prod(y, ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, chunk_rows)
    out_ref[:] = out.reshape(G, N, C).astype(out_ref.dtype)


def _kern_pairqk(x_ref, ln1s, ln1b, qkw, qkb, vw, vb, projw, projb,
                 ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, out_ref, *, G,
                 proj_head, chunk_rows=512):
    """per-head [q|k] direct dots + per-head 128-lane v blocks: every slice
    tile-aligned. proj_head=True folds proj per head (no concat)."""
    x0 = x_ref[:].astype(CD)
    h2 = _ln_eps(x0.astype(jnp.float32), ln1s[0], ln1b[0], False,
                 EPS).astype(CD).reshape(G * N, C)
    vbuf = (jnp.dot(h2, vw[:].astype(CD),
                    preferred_element_type=jnp.float32) + vb[0]).astype(CD)
    acc = None
    heads = []
    for hh in range(NH):
        pair = (jnp.dot(h2, qkw[hh].astype(CD),
                        preferred_element_type=jnp.float32)
                + qkb[hh]).astype(CD)
        q = pair[:, :HD].reshape(G, N, HD)
        k = pair[:, HD:].reshape(G, N, HD)
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        e = jnp.exp2(s)
        v = vbuf[:, 128 * hh:128 * (hh + 1)].reshape(G, N, 128)
        o = jax.lax.dot_general(e.astype(CD), v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o[..., :HD] / o[..., HD:HD + 1]
        if proj_head:
            oh = o.reshape(G * N, HD).astype(CD)
            ph = jnp.dot(oh, projw[hh].astype(CD),
                         preferred_element_type=jnp.float32)
            acc = ph if acc is None else acc + ph
        else:
            heads.append(o.reshape(G * N, HD).astype(CD))
    if proj_head:
        attn = (acc + projb[0]).astype(CD)
    else:
        attn = jnp.concatenate(heads, axis=-1)
        attn = (jnp.dot(attn, projw[:].astype(CD),
                        preferred_element_type=jnp.float32)
                + projb[0]).astype(CD)
    y = x0.reshape(G * N, C) + attn
    out = _mlp_prod(y, ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, chunk_rows)
    out_ref[:] = out.reshape(G, N, C).astype(out_ref.dtype)


def _const(*shape):
    return pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                        memory_space=pltpu.VMEM)


def _call(kern, args, specs, G, x, **kw):
    return pl.pallas_call(
        partial(kern, G=G, **kw),
        grid=(B // G,),
        in_specs=[pl.BlockSpec((G, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM)] + specs,
        out_specs=pl.BlockSpec((G, N, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, N, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=96 * 1024 * 1024),
        interpret=INTERPRET,
    )(x, *args)


def build_pairqk_args(p, proj_head):
    """weight layouts for _kern_pairqk (exp2 scale/log2e folded into q)."""
    scale = HD ** -0.5 * math.log2(math.e)
    qkvw = np.asarray(p["attn"]["qkv"]["kernel"], np.float32)
    qkvb = np.asarray(p["attn"]["qkv"]["bias"], np.float32)
    wq = qkvw[:, :C].reshape(C, NH, HD) * scale
    bq = qkvb[:C].reshape(NH, HD) * scale
    wk = qkvw[:, C:2 * C].reshape(C, NH, HD)
    bk = qkvb[C:2 * C].reshape(NH, HD)
    wv = qkvw[:, 2 * C:].reshape(C, NH, HD)
    bv = qkvb[2 * C:].reshape(NH, HD)
    qkw = np.stack([np.concatenate([wq[:, h], wk[:, h]], axis=1)
                    for h in range(NH)])  # (NH, C, 128)
    qkb = np.stack([np.concatenate([bq[h], bk[h]])[None]
                    for h in range(NH)])  # (NH, 1, 128)
    vw = np.zeros((C, NH * 128), np.float32)
    vb = np.zeros((NH * 128,), np.float32)
    for h in range(NH):
        vw[:, 128 * h:128 * h + HD] = wv[:, h]
        vb[128 * h:128 * h + HD] = bv[h]
        vb[128 * h + HD] = 1.0  # sum_pv ones column at lane HD
    args = [
        jnp.asarray(p["norm1"]["scale"]).reshape(1, C),
        jnp.asarray(p["norm1"]["bias"]).reshape(1, C),
        jnp.asarray(qkw, CD), jnp.asarray(qkb, jnp.float32),
        jnp.asarray(vw, CD), jnp.asarray(vb, jnp.float32).reshape(1, -1),
    ]
    if proj_head:
        pw = np.asarray(p["attn"]["proj"]["kernel"],
                        np.float32).reshape(NH, HD, C)
        args += [jnp.asarray(pw, CD)]
        pspec = _const(NH, HD, C)
    else:
        args += [jnp.asarray(p["attn"]["proj"]["kernel"], CD)]
        pspec = _const(C, C)
    args += [
        jnp.asarray(p["attn"]["proj"]["bias"]).reshape(1, C),
        jnp.asarray(p["norm2"]["scale"]).reshape(1, C),
        jnp.asarray(p["norm2"]["bias"]).reshape(1, C),
        jnp.asarray(p["mlp"]["fc1"]["kernel"], CD),
        jnp.asarray(p["mlp"]["fc1"]["bias"]).reshape(1, HID),
        jnp.asarray(p["mlp"]["fc2"]["kernel"], CD),
        jnp.asarray(p["mlp"]["fc2"]["bias"]).reshape(1, C),
    ]
    specs = [_const(1, C), _const(1, C), _const(NH, C, 128),
             _const(NH, 1, 128), _const(C, NH * 128), _const(1, NH * 128),
             pspec, _const(1, C), _const(1, C), _const(1, C),
             _const(C, HID), _const(1, HID), _const(HID, C), _const(1, C)]
    return args, specs


def main():
    if not INTERPRET:
        from bench import _wait_for_backend
        _wait_for_backend()
    t0 = time.time()
    p = make_params(0)
    x = (jax.random.normal(jax.random.PRNGKey(3), (B, N, C), jnp.float32)
         * 0.3).astype(CD)
    jax.block_until_ready(x)

    def run(tag, fn):
        try:
            dt = k_time(fn, (x,))
            print(f"{tag:>28}: {dt*1000:7.3f} ms/block", flush=True)
            return dt
        except Exception as e:  # noqa: BLE001
            print(f"{tag:>28}: FAILED {str(e).splitlines()[0][:160]}",
                  flush=True)
            return None

    def prod(k0, xx, **kw):
        y = vit_block_fused(vary(k0, xx), p, nh=NH, attn_impl="exp2",
                            interpret=INTERPRET, **kw)
        return y.astype(jnp.float32).mean()

    base = run("baseline exp2 G=2", prod)

    for abl in ("softmax", "gelu", "ln"):
        sb._ABLATE.clear()
        sb._ABLATE.add(abl)
        run(f"ablate {abl}", prod)
    sb._ABLATE.update({"softmax", "gelu", "ln"})
    run("ablate all3", prod)
    sb._ABLATE.clear()

    run("G=1", partial(prod, group=1))
    run("G=4", partial(prod, group=4))
    run("mlp rows 602", partial(prod, mlp_min_rows=602))

    # dots-only (r7b): exact schedule, no elementwise
    G = 2
    dots_args = [jnp.asarray(np.concatenate(
        [np.asarray(p["attn"]["qkv"]["kernel"]),
         np.zeros((C, NH), np.float32)], axis=1)[:, :2 * C + NH * (HD + 1)],
        CD)]
    # rebuild the sum_pv-layout qkv weight: q|k then per-head v+ones col
    qkvw = np.asarray(p["attn"]["qkv"]["kernel"], np.float32)
    wv = qkvw[:, 2 * C:].reshape(C, NH, HD)
    wv2 = np.concatenate([wv, np.zeros((C, NH, 1), np.float32)], axis=2)
    qkvw_pv = np.concatenate([qkvw[:, :2 * C],
                              wv2.reshape(C, NH * (HD + 1))], axis=1)
    dots_args = [jnp.asarray(qkvw_pv, CD),
                 jnp.asarray(p["attn"]["proj"]["kernel"], CD),
                 jnp.asarray(p["mlp"]["fc1"]["kernel"], CD),
                 jnp.asarray(p["mlp"]["fc2"]["kernel"], CD)]
    dots_specs = [_const(C, qkvw_pv.shape[1]), _const(C, C),
                  _const(C, HID), _const(HID, C)]
    run("dots-only", lambda k0, xx: _call(
        _kern_dots, dots_args, dots_specs, G,
        vary(k0, xx)).astype(
            jnp.float32).mean())

    # calib: pure dense matmuls, ~the same padded MACs as one block
    # (reps x 497*768*3072 = reps x 1.173G; block = 4.33G -> reps=4 ~ 4.7G)
    wcal = jnp.asarray(np.random.default_rng(1).normal(
        0, 0.02, (C, HID)), CD)
    run("calib dense x4", lambda k0, xx: _call(
        _kern_calib, [wcal], [_const(C, HID)], G,
        vary(k0, xx), reps=4).astype(
            jnp.float32).mean())

    # batched heads (Mosaic legality check at hd=64 + perf)
    bargs = [
        jnp.asarray(p["norm1"]["scale"]).reshape(1, C),
        jnp.asarray(p["norm1"]["bias"]).reshape(1, C),
    ]
    scale = HD ** -0.5 * math.log2(math.e)
    qs = np.concatenate([np.full((C,), scale, np.float32),
                         np.ones((2 * C,), np.float32)])
    bargs += [jnp.asarray(qkvw * qs[None, :], CD),
              jnp.asarray(np.asarray(p["attn"]["qkv"]["bias"]) * qs,
                          jnp.float32).reshape(1, -1),
              jnp.asarray(p["attn"]["proj"]["kernel"], CD),
              jnp.asarray(p["attn"]["proj"]["bias"]).reshape(1, C),
              jnp.asarray(p["norm2"]["scale"]).reshape(1, C),
              jnp.asarray(p["norm2"]["bias"]).reshape(1, C),
              jnp.asarray(p["mlp"]["fc1"]["kernel"], CD),
              jnp.asarray(p["mlp"]["fc1"]["bias"]).reshape(1, HID),
              jnp.asarray(p["mlp"]["fc2"]["kernel"], CD),
              jnp.asarray(p["mlp"]["fc2"]["bias"]).reshape(1, C)]
    bspecs = [_const(1, C), _const(1, C), _const(C, 3 * C), _const(1, 3 * C),
              _const(C, C), _const(1, C), _const(1, C), _const(1, C),
              _const(C, HID), _const(1, HID), _const(HID, C), _const(1, C)]
    run("batched heads", lambda k0, xx: _call(
        _kern_batched, bargs, bspecs, G,
        vary(k0, xx)).astype(
            jnp.float32).mean())

    # pairqk / pairqk+projhead
    for ph in (False, True):
        args, specs = build_pairqk_args(p, ph)
        tag = "pairqk+projhead" if ph else "pairqk"
        run(tag, lambda k0, xx, args=args, specs=specs, ph=ph: _call(
            _kern_pairqk, args, specs, G,
            vary(k0, xx),
            proj_head=ph).astype(jnp.float32).mean())

    # parity spot-check of pairqk vs production (bf16, on-chip)
    try:
        args, specs = build_pairqk_args(p, True)
        y1 = jax.jit(lambda xx: _call(_kern_pairqk, args, specs, G, xx,
                                      proj_head=True))(x)
        y0 = jax.jit(lambda xx: vit_block_fused(xx, p, nh=NH,
                                                attn_impl="exp2",
                                                interpret=INTERPRET))(x)
        dev = float(jnp.max(jnp.abs(y1.astype(jnp.float32)
                                    - y0.astype(jnp.float32))))
        print(f"pairqk+projhead vs production parity (bf16): {dev:.3e}",
              flush=True)
    except Exception as e:  # noqa: BLE001
        print(f"pairqk parity FAILED: {str(e).splitlines()[0][:160]}",
              flush=True)

    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
