"""Fused Swin transformer block as a single Pallas TPU kernel.

Device profiling of the flax HTSAT forward (reference architecture,
src/models/components/htsat.py:152-268) showed matmuls are ~5% of step time;
the rest is HBM traffic from window-partition copies, LayerNorm/softmax
convert+reduce fusions, and unfused elementwise chains. This kernel runs the
ENTIRE block per image tile in VMEM:

    LN1 -> (cyclic shift) -> window partition -> qkv -> per-head windowed
    attention (+ relative-position bias, + shift mask) -> proj -> reverse
    -> residual -> LN2 -> MLP (exact erf GELU) -> residual

so the only HBM traffic per block is one read and one write of the token
activations. Attention uses batched ``dot_general`` over windows (one MXU
call per head per projection). Numerics: matmul operands in ``compute_dtype``
with f32 accumulation; LayerNorm, softmax, and residual adds in f32 — the
same contract as the flax bf16 path.
"""

import math
from functools import partial
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np

from .frontend import EPS_F32  # noqa: F401  (shared eps convention)

Dtype = Any

# auto-group payload target: images per grid cell are chosen so each cell
# carries ~this many token-channels (~1.5 MB bf16). Grid-cell dispatch has a
# fixed ~30 us overhead on v5e; sweepable module knob (scripts/perf_r4i).
PAYLOAD_TOKEN_CHANNELS = 8192 * 96


def _erf(x: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """Abramowitz-Stegun 7.1.26 rational erf (|err| < 1.5e-7); Mosaic has no
    native erf/erfc lowering. fast=True swaps the divide for the VPU's
    approximate reciprocal (adds ~1e-4 abs err — below bf16 noise)."""
    a1, a2, a3, a4, a5 = (0.254829592, -0.284496736, 1.421413741,
                          -1.453152027, 1.061405429)
    s = jnp.sign(x)
    z = jnp.abs(x)
    denom = 1.0 + 0.3275911 * z
    if fast:
        from jax.experimental import pallas as pl

        t = pl.reciprocal(denom, approx=True)
    else:
        t = 1.0 / denom
    poly = t * (a1 + t * (a2 + t * (a3 + t * (a4 + t * a5))))
    return s * (1.0 - poly * jnp.exp(-z * z))


def _gelu_exact(x: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    xf = x.astype(jnp.float32)
    e = _erf(xf * np.float32(1 / np.sqrt(2)), fast)
    return (0.5 * xf * (1.0 + e)).astype(x.dtype)


# odd minimax fit of erf(u) ~= u*P(u^2) on [0, 3.2] (u-weighted so the GELU
# error 0.5*|x|*err is equiripple): max |gelu_poly - gelu_exact| = 5.2e-5
# over all x — two orders below bf16 activation rounding (~0.4% relative).
# ~18 cheap VPU madds vs the A&S erf's sign/abs/reciprocal/Horner-5/exp chain.
_ERF_POLY = (1.1274634720360315, -0.37247318975773086, 0.10760827076380255,
             -0.02304370824603688, 0.003558730840648696,
             -0.0003814308901475312, 2.66667333015962e-05,
             -1.08585897381995e-06, 1.944008265638895e-08)


# DEBUG-ONLY ablation set, consulted at trace time by perf probes (e.g.
# scripts/perf_r5f_probe.py) to bucket in-kernel VPU cost: members of
# {"gelu", "ln", "softmax"} null the corresponding computation (WRONG
# outputs — never set outside a probe).
_ABLATE: set = set()


def _gelu_poly(x: jnp.ndarray) -> jnp.ndarray:
    """bf16-accuracy GELU: clamped odd polynomial erf, no exp/divide."""
    if "gelu" in _ABLATE:
        return x
    xf = x.astype(jnp.float32)
    u = jnp.clip(xf * np.float32(1 / np.sqrt(2)), -3.2, 3.2)
    u2 = u * u
    p = jnp.float32(_ERF_POLY[-1])
    for c in _ERF_POLY[-2::-1]:
        p = p * u2 + np.float32(c)
    return (0.5 * xf * (1.0 + u * p)).astype(x.dtype)


def _ln(xf: jnp.ndarray, scale, bias, fast: bool = False,
        eps: float = 1e-5) -> jnp.ndarray:
    if "ln" in _ABLATE:
        return xf * scale + bias
    m = jnp.mean(xf, axis=-1, keepdims=True)
    if fast:
        # single-pass E[x^2]-m^2 (bf16 path only: the ~1e-7 f32 cancellation
        # noise is far under bf16 rounding; saves a full subtract pass)
        v = jnp.maximum(jnp.mean(xf * xf, axis=-1, keepdims=True) - m * m, 0.0)
    else:
        v = jnp.mean((xf - m) ** 2, axis=-1, keepdims=True)
    return (xf - m) * jax.lax.rsqrt(v + eps) * scale + bias


def _mlp_chunks(total_rows: int, min_rows: int = 512) -> int:
    """Largest chunk count in {4, 2, 1} that DIVIDES total_rows with chunks
    of >= min_rows (non-divisible counts would drop rows — the auto-group
    can pick G=7, making G*L indivisible by 3/4)."""
    for cand in (4, 2):
        if total_rows % cand == 0 and total_rows // cand >= min_rows:
            return cand
    return 1


def _exp2_softmax(s: jnp.ndarray, ecd=None, nomax: bool = False):
    """Unnormalized exp2 softmax: returns (e, denom) so the divide can ride
    the smaller post-PV rows (hd lanes instead of N). ``ecd`` (optional)
    evaluates the exp2 at that dtype — the PV dot consumes e at the compute
    dtype anyway, so exp2-at-bf16 trades one cast for a (possibly) cheaper
    transcendental; the denom sum stays f32.

    ``nomax`` skips the row-max subtraction (one cross-lane reduce plus one
    full elementwise pass over the (NP, NP) scores): e/denom is invariant to
    the shift, exp2 only overflows past 2^127 (window-attention logits in
    log2 units sit orders of magnitude below), and the -1e5 pairing/shift
    masks underflow to exactly 0 with or without the shift.

    NOTE nomax is AUTO-ON for exp2/headdot serving (swin_block_fused's
    nomax=None default) — a measured win on every validated checkpoint. The
    overflow threshold is a raw attention logit > 127 in log2 units (~88
    natural-log): past it exp2 -> inf and the row goes NaN via inf/inf,
    where the guarded form is safe. Every shipped SELD checkpoint sits two
    orders of magnitude below (max |logit| ~ O(10)); pass nomax=False from
    the serving layer when deploying an unvalidated external checkpoint.
    nomax is ignored when ``ecd`` (exp2-at-bf16) is set: casting UNSHIFTED
    scores to bf16 quantizes d with step |d| * 2^-8 (~8% relative exp2
    error at |d|~30), so the shifted form is forced there."""
    if "softmax" in _ABLATE:
        return s, jnp.ones_like(s[..., :1])
    if nomax and ecd is None:
        d = s
    else:
        m = jnp.max(s, axis=-1, keepdims=True)
        d = s - m
    if ecd is not None and ecd != s.dtype:
        d = d.astype(ecd)
    e = jnp.exp2(d)
    return e, jnp.sum(e, axis=-1, keepdims=True, dtype=s.dtype)


def _softmax(s: jnp.ndarray, fast: bool = False) -> jnp.ndarray:
    """f32 softmax; fast=True uses the VPU's approximate reciprocal for the
    normalization (~1e-4 relative — under bf16 rounding) instead of a divide."""
    if "softmax" in _ABLATE:
        return s
    m = jnp.max(s, axis=-1, keepdims=True)
    e = jnp.exp(s - m)
    denom = jnp.sum(e, axis=-1, keepdims=True)
    if fast:
        from jax.experimental import pallas as pl

        return e * pl.reciprocal(denom, approx=True)
    return e / denom


def _block_kernel(x_ref, dp_ref, ln1s, ln1b, qkvw, qkvb, projw, projb,
                  ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, bias_ref, mask_ref,
                  *rest, H, W, C, nh, w, shift, hidden, has_mask,
                  has_dp, compute_dtype, attn_impl="exact", merge=False,
                  pair=1, hidden_cd=False, sum_pv=False, exp_bf16=False,
                  nomax=False):
    if merge:
        # PatchMerging folded into the stage's LAST block (eval serving):
        # the 2x2 neighbor concat + LN + 4C->2C reduction run on the tokens
        # already in VMEM, so the XLA-side strided-slice copies (~3.5 ms of
        # the B=128 step, r4g profile) and the merge's extra HBM round-trip
        # disappear. out_ref is (G, L//4, 2C).
        mns, mnb, redw, out_ref = rest
    else:
        (out_ref,) = rest
    N = w * w
    nW = (H // w) * (W // w)
    hd = C // nh
    # window pairing (pair=2): consecutive windows ride ONE scores/PV dot —
    # (2N, 2N) scores fill a full 128-lane tile instead of half, and the
    # tiny-batched-matmul count halves (r5h showed the per-window dots, not
    # the partition transposes, are the stage-0 structural cost). The
    # cross-window score blocks are killed by -1e5 baked into the caller's
    # block-diagonal bias table: exp/exp2 underflow to exactly 0, so the
    # result is bit-equal in math to the unpaired form.
    NP = pair * N
    nWp = nW // pair
    # the q-scale (and exp2's log2(e)) is folded into the qkv weight/bias by
    # the caller — no in-kernel q multiply
    cd = compute_dtype
    G, L = x_ref.shape[0], H * W  # G images per grid cell

    # fast LN/softmax (single-pass stats, approx reciprocal) MEASURED SLOWER
    # on v5e (54 vs 38 ms fused fwd @B=128) — Mosaic's lowering of the
    # variants breaks fusions the standard forms get. Keep them off.
    fast = False
    x0 = x_ref[:].astype(cd)  # (G, L, C); residual adds stay in compute dtype
    # exactly like the flax path (f32 only inside LN/softmax/accumulators)

    # LN1 + shift + window partition (windows of all G images batch together)
    h = _ln(x0.astype(jnp.float32), ln1s[0], ln1b[0], fast).astype(cd)
    if "winpart" in _ABLATE:  # probe-only: contiguous rows as fake windows
        win = h.reshape(G * nW * N, C)
    else:
        img = h.reshape(G, H, W, C)
        if shift:
            img = jnp.roll(img, shift=(-shift, -shift), axis=(1, 2))
        win = img.reshape(G, H // w, w, W // w, w, C)
        win = jnp.transpose(win, (0, 1, 3, 2, 4, 5)).reshape(G * nW * N, C)

    if attn_impl != "headdot":
        qkv = jnp.dot(win, qkvw[:].astype(cd),
                      preferred_element_type=jnp.float32) + qkvb[0]
        qkv = qkv.astype(cd)

    if attn_impl == "headdot":
        # per-head DIRECT dots + proj folded into v (caller layouts:
        # qkvw (2, nh, C, hd) q|k weights, qkvb (2, nh, 1, hd), projw
        # (nh, C, C) = W_v_h @ W_proj_h, projb (1, C) = total folded bias).
        # Rationale (r5a profile): the per-head lane slices of the (R, 3C)
        # qkv buffer sit at hd*h offsets (hd=24) — every slice is a VPU
        # relayout of an activation-sized array. Leading-axis indexing of
        # per-head WEIGHTS is free, and the MXU pads dot N-dims to 128
        # lanes anyway, so (C, hd) dots cost the same tiles as (C, 128);
        # softmax rows sum to 1, so the v bias folds into one post-sum add.
        # exp2 softmax semantics (caller folds log2(e) into scale/bias/mask).
        acc = None
        for hh in range(nh):
            q = (jnp.dot(win, qkvw[0, hh].astype(cd),
                         preferred_element_type=jnp.float32)
                 + qkvb[0, hh]).astype(cd).reshape(G * nWp, NP, hd)
            k = (jnp.dot(win, qkvw[1, hh].astype(cd),
                         preferred_element_type=jnp.float32)
                 + qkvb[1, hh]).astype(cd).reshape(G * nWp, NP, hd)
            vp = jnp.dot(win, projw[hh].astype(cd),
                         preferred_element_type=jnp.float32
                         ).astype(cd).reshape(G * nWp, NP, C)
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[hh][None]
            if has_mask:
                s = (s.reshape(G, nWp, NP, NP)
                     + mask_ref[:][None]).reshape(G * nWp, NP, NP)
            e, denom = _exp2_softmax(s, cd if exp_bf16 else None, nomax)
            o = jax.lax.dot_general(e.astype(cd), vp,
                                    (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            o = o / denom
            acc = o if acc is None else acc + o
        attn = (acc.reshape(G * nW * N, C) + projb[0]).astype(cd)
    elif attn_impl == "batched":
        # heads ride the dot_general BATCH dim: one relayout per q/k/v and
        # two flat batched dots, instead of nh unaligned lane-slice chains
        # (q at lane offsets hd*h with hd=24 — every slice is a relayout;
        # nh reaches 32 at stage 3)
        def hsplit(cols):  # (G*nW*N, C) -> (G*nW*nh, N, hd)
            t = cols.reshape(G * nW, N, nh, hd)
            return jnp.transpose(t, (0, 2, 1, 3)).reshape(G * nW * nh, N, hd)

        q = hsplit(qkv[:, :C])
        k = hsplit(qkv[:, C:2 * C])
        v = hsplit(qkv[:, 2 * C:])
        s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        s = s.reshape(G * nW, nh, N, N) + bias_ref[:][None]
        if has_mask:
            s = (s.reshape(G, nW, nh, N, N)
                 + mask_ref[:][None, :, None]).reshape(G * nW, nh, N, N)
        p = _softmax(s.reshape(G * nW * nh, N, N), fast).astype(cd)
        o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                preferred_element_type=jnp.float32)
        o = o.reshape(G * nW, nh, N, hd)
        attn = jnp.transpose(o, (0, 2, 1, 3)).reshape(G * nW * N, C)
        attn = attn.astype(cd)
    else:
        heads = []
        hv = hd + 1 if sum_pv else hd  # v block width (+1 = ones column)
        for hh in range(nh):
            q = qkv[:, hh * hd:(hh + 1) * hd].reshape(G * nWp, NP, hd)
            k = qkv[:, C + hh * hd: C + (hh + 1) * hd].reshape(G * nWp,
                                                               NP, hd)
            v = qkv[:, 2 * C + hh * hv: 2 * C + hh * hv + hv].reshape(
                G * nWp, NP, hv)
            s = jax.lax.dot_general(q, k, (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[hh][None]
            if has_mask:
                s = (s.reshape(G, nWp, NP, NP)
                     + mask_ref[:][None]).reshape(G * nWp, NP, NP)
            if attn_impl == "exp2" and sum_pv:
                # denominator rides the PV dot: the caller appends a
                # zero-weight/bias-1 column per head to the v section, so
                # o[..., hd] = sum(e) — the cross-lane sum reduction
                # disappears (and the denom matches the bf16 e the PV dot
                # actually consumes)
                if nomax and not exp_bf16:
                    # exp_bf16 forces the shift: bf16-quantizing UNSHIFTED
                    # scores errs with step |d|*2^-8 (see _exp2_softmax)
                    d = s
                else:
                    m = jnp.max(s, axis=-1, keepdims=True)
                    d = s - m
                e = jnp.exp2(d.astype(cd) if exp_bf16 else d)
                o = jax.lax.dot_general(e.astype(cd), v,
                                        (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                o = o[..., :hd] / o[..., hd:]
            elif attn_impl == "exp2":
                e, denom = _exp2_softmax(s, cd if exp_bf16 else None, nomax)
                o = jax.lax.dot_general(e.astype(cd), v,
                                        (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
                o = o / denom
            else:
                p = _softmax(s, fast).astype(cd)  # (G*nWp, NP, NP)
                o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                        preferred_element_type=jnp.float32)
            heads.append(o.reshape(G * nW * N, hd))
        attn = jnp.concatenate(heads, axis=-1).astype(cd)  # (G*nW*N, C)

    if attn_impl != "headdot":  # headdot folded proj into the v weights
        attn = (jnp.dot(attn, projw[:].astype(cd),
                        preferred_element_type=jnp.float32)
                + projb[0]).astype(cd)

    # window reverse + unshift + residual
    if "winpart" in _ABLATE:
        img2 = attn.reshape(G, H, W, C)
    else:
        img2 = attn.reshape(G, H // w, W // w, w, w, C)
        img2 = jnp.transpose(img2, (0, 1, 3, 2, 4, 5)).reshape(G, H, W, C)
        if shift:
            img2 = jnp.roll(img2, shift=(shift, shift), axis=(1, 2))
    # per-sample drop-path masks (1 at eval — path skipped entirely;
    # 0 or 1/keep at train, reference model_utilities.py:216-231). The full
    # (B, 2) mask array lives in SMEM, indexed by grid position; Mosaic only
    # supports SCALAR use of SMEM reads, so the masked path multiplies each
    # image slice by its scalar instead of building a mask vector.
    from jax.experimental import pallas as pl

    base = pl.program_id(0) * G
    img2 = img2.reshape(G, L, C)
    if has_dp:
        y = jnp.stack([x0[g] + dp_ref[base + g, 0].astype(cd) * img2[g]
                       for g in range(G)]).reshape(G * L, C)
    else:
        y = (x0 + img2).reshape(G * L, C)

    def mlp(yc):
        h2 = _ln(yc.astype(jnp.float32), ln2s[0], ln2b[0], fast).astype(cd)
        if hidden_cd:
            # hidden activations stored in compute dtype: the f32->cd cast
            # rides the matmul epilogue (Mosaic requires a 32-bit matmul
            # ACC, so preferred_element_type must stay f32 — asking for a
            # bf16 dot output fails verification: 'Expected matmul acc to
            # be 32-bit'), bias-add and GELU run on cd pre-activations (one
            # extra rounding vs the f32 form — under the serving band)
            f = jnp.dot(h2, fc1w[:].astype(cd),
                        preferred_element_type=jnp.float32).astype(cd)
            f = f + fc1b[0].astype(cd)
            f = _gelu_poly(f) if cd == jnp.bfloat16 else _gelu_exact(f)
        else:
            f = jnp.dot(h2, fc1w[:].astype(cd),
                        preferred_element_type=jnp.float32) + fc1b[0]
            f = (_gelu_poly(f) if cd == jnp.bfloat16
                 else _gelu_exact(f)).astype(cd)
        return (jnp.dot(f, fc2w[:].astype(cd),
                        preferred_element_type=jnp.float32)
                + fc2b[0]).astype(cd)

    # LN2 + MLP (exact erf GELU, reference model_utilities.py:129-171),
    # chunked over row groups so the f32 hidden activations never hold the
    # whole (G*L, hidden) buffer in VMEM at once
    outs = []
    if has_dp:
        n_chunks = _mlp_chunks(L)
        rows = L // n_chunks
        for g in range(G):
            m1g = dp_ref[base + g, 1].astype(cd)
            for c in range(n_chunks):
                yc = y[g * L + c * rows: g * L + (c + 1) * rows]
                outs.append((yc + m1g * mlp(yc)).astype(out_ref.dtype))
    else:
        n_chunks = _mlp_chunks(G * L)
        rows = (G * L) // n_chunks
        for c in range(n_chunks):
            yc = y[c * rows:(c + 1) * rows]
            outs.append((yc + mlp(yc)).astype(cd if merge else out_ref.dtype))
    out = jnp.concatenate(outs, axis=0)
    if merge:
        # 2x2 neighbor select, Mosaic-legal formulation (probe_merge_ops*.py):
        # the naive strided 6-D views + lane-concat are rejected ("offset
        # mismatch on non-concat dimension" / "unsupported shape cast") —
        # instead lane-pad each token row to Cp = ceil(C/128)*128 so the
        # (R, Cp) -> (R/2, 2Cp) w-pair merge reshape and every lane slice are
        # tile-aligned, then split h-parity as alternating W//2-row blocks.
        # Tokens are row-major in (h, w), so w-parity = adjacent-row parity.
        # The caller pads norm scale/bias + reduction rows per piece to Cp
        # with ZEROS, so pad lanes normalize to exactly 0 and contribute
        # nothing to the reduction dot. LN runs cross-piece with explicit
        # moments over the 4C REAL lanes (two-pass, eps matching _ln).
        Cp = -(-C // 128) * 128
        xp = out  # (G*L, C) in cd
        if Cp != C:
            xp = jnp.concatenate(
                [xp, jnp.zeros((G * L, Cp - C), xp.dtype)], axis=-1)
        a = xp.reshape(G * H * (W // 2), 2 * Cp)
        w0 = a[:, :Cp].reshape(G * (H // 2), 2, (W // 2), Cp)
        w1 = a[:, Cp:].reshape(G * (H // 2), 2, (W // 2), Cp)
        R4 = G * L // 4
        # reference PatchMerging concat order: (h0,w0), (h1,w0), (h0,w1),
        # (h1,w1) — models/htsat.py PatchMerging
        ps = [p.reshape(R4, Cp).astype(jnp.float32)
              for p in (w0[:, 0], w0[:, 1], w1[:, 0], w1[:, 1])]
        n = 4 * C  # real lanes only; pad lanes are zero and drop out of sums
        mean = sum(jnp.sum(p, -1, keepdims=True) for p in ps) / n
        var = sum(jnp.sum((p - mean) ** 2, -1, keepdims=True)
                  for p in ps) / n
        # pad lanes: (0-mean)^2 pollutes var — remove their contribution
        if Cp != C:
            var = var - (Cp - C) * 4 * (mean * mean) / n
        inv = jax.lax.rsqrt(var + 1e-5)
        acc = jnp.zeros((R4, 2 * C), jnp.float32)
        for i, p in enumerate(ps):
            ln_i = ((p - mean) * inv * mns[0, i * Cp:(i + 1) * Cp]
                    + mnb[0, i * Cp:(i + 1) * Cp]).astype(cd)
            acc = acc + jnp.dot(ln_i, redw[i * Cp:(i + 1) * Cp].astype(cd),
                                preferred_element_type=jnp.float32)
        out_ref[:] = acc.astype(out_ref.dtype).reshape(G, L // 4, 2 * C)
    else:
        out_ref[:] = out.reshape(G, L, C)


def _rel_bias(table: jnp.ndarray, w: int, nh: int) -> jnp.ndarray:
    from ...models.htsat import relative_position_index

    idx = relative_position_index(w).reshape(-1)
    n = w * w
    return table[idx].reshape(n, n, nh).transpose(2, 0, 1).astype(jnp.float32)


def swin_block_fused(x: jnp.ndarray, p: Dict, *, H: int, W: int, nh: int,
                     window: int, shift: int, compute_dtype=jnp.bfloat16,
                     group: int = 0, dp_masks=None, attn_impl: str = "exact",
                     merge_params: Dict = None, vmem_limit_mb: int = 80,
                     pair_windows=None, hidden_cd: bool = False,
                     sum_pv=None, exp_bf16: bool = False, nomax=None,
                     interpret: bool = False) -> jnp.ndarray:
    """x (B, H*W, C) + the block's flax param subtree -> (B, H*W, C).

    Equivalent to models.htsat.SwinTransformerBlock in eval mode (no adapters,
    no dropout). ``shift`` and the window-size clamp must already follow the
    reference rule (shift=0 and window=min(H,W) when min(H,W) <= window).

    ``group`` = images per grid cell (0 = auto). Grid-cell dispatch has a
    fixed ~30 us overhead on v5e, so small late-stage tiles are batched up to
    a ~8k-token payload per cell.

    ``merge_params`` (eval only): the stage's PatchMerging param subtree
    ({norm: {scale, bias}, reduction: {kernel}}) — the 2x2 concat + LN +
    4C->2C reduction run in-kernel on the VMEM-resident tokens and the
    output becomes (B, H*W//4, 2C), equal to models.htsat.PatchMerging of
    the block output.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, C = x.shape
    w = window
    N = w * w
    nW = (H // w) * (W // w)

    if attn_impl == "auto":
        # measured per-stage on v5e (scripts/perf_r5d_probe.py, B=128): the
        # per-head-dot variant wins 1.14x at stage-0 shapes (nh=4: the qkv
        # lane-slice relayouts dominate) and loses at nh>=8 (the folded
        # per-head v weights multiply the proj MXU work by nh*hd/C)
        attn_impl = "headdot" if nh <= 4 else "exp2"

    G = group or max(1, PAYLOAD_TOKEN_CHANNELS // (L * C))
    while B % G:
        G -= 1

    def dense(d):  # AdaptDense wraps the plain Dense as 'base'
        return d["base"] if "base" in d else d

    qkv_p = dense(p["attn"]["qkv"])
    proj_p = dense(p["attn"]["proj"])
    fc1_p = dense(p["mlp"]["fc1"])
    fc2_p = dense(p["mlp"]["fc2"])
    hidden = fc1_p["kernel"].shape[1]

    # fold the attention q-scale (and exp2's log2(e)) into the q columns of
    # the qkv weight AND bias — exact at the f32 param level, and the kernel
    # drops its per-head (N, hd) multiply
    scale = (C // nh) ** -0.5
    if attn_impl in ("exp2", "headdot"):
        scale = scale * math.log2(math.e)
    qs = jnp.concatenate([jnp.full((C,), scale, jnp.float32),
                          jnp.ones((2 * C,), jnp.float32)])
    qkv_w = jnp.asarray(qkv_p["kernel"], jnp.float32) * qs[None, :]
    qkv_b = jnp.asarray(qkv_p["bias"], jnp.float32) * qs
    if sum_pv is None:
        # measured win at every exp2 stage (scripts/perf_r5k_probe.py:
        # stage1 4.043 -> 3.996, stage2 2.836 -> 2.663 ms/block @B=128)
        sum_pv = True
    sum_pv = bool(sum_pv) and attn_impl == "exp2"
    if nomax is None:
        # skipping the row-max subtraction is shift-invariant math (see
        # _exp2_softmax docstring) and a measured win at every exp2 stage
        # (scripts/perf_r6b_probe.py @B=128: stage1 4.249 -> 3.851, stage2
        # 2.839 -> 2.281 ms/block; stage0 headdot 6.185 -> 6.159)
        nomax = True
    nomax = bool(nomax) and attn_impl in ("exp2", "headdot")
    if sum_pv:
        # per-head zero-weight/bias-1 ones column in the v section: the PV
        # dot then emits sum(e) in lane hd and the kernel's cross-lane sum
        # reduction disappears (see the exp2 branch of _block_kernel)
        hd_ = C // nh
        wv = qkv_w[:, 2 * C:].reshape(C, nh, hd_)
        bv = qkv_b[2 * C:].reshape(nh, hd_)
        wv2 = jnp.concatenate([wv, jnp.zeros((C, nh, 1), jnp.float32)],
                              axis=2)
        bv2 = jnp.concatenate([bv, jnp.ones((nh, 1), jnp.float32)], axis=1)
        qkv_w = jnp.concatenate(
            [qkv_w[:, :2 * C], wv2.reshape(C, nh * (hd_ + 1))], axis=1)
        qkv_b = jnp.concatenate([qkv_b[:2 * C], bv2.reshape(-1)])

    bias = _rel_bias(p["attn"]["relative_position_bias_table"], w, nh)
    if shift > 0:
        from ...models.htsat import shift_attn_mask

        mask = jnp.asarray(shift_attn_mask(H, W, w, shift))  # (nW, N, N)
        has_mask = True
    else:
        mask = jnp.zeros((1, N, N), jnp.float32)
        has_mask = False
    if attn_impl in ("exp2", "headdot"):
        # pre-scale the additive logit terms by log2(e) to match the folded
        # q-scale (exp2(log2e*x) == exp(x) exactly in math; fp dev ~1 ulp)
        log2e = math.log2(math.e)
        bias = bias * log2e
        mask = mask * log2e

    # window pairing: consecutive windows share one scores/PV dot — the
    # (2N, 2N) scores fill a 128-lane tile and the tiny-dot count halves
    # (r5h: the per-window dots are stage0's 3.9 ms structural cost, not the
    # partition transposes). Cross-window blocks get -1e5 in the bias table:
    # exp/exp2 underflow to exactly 0, so the math is unchanged.
    if pair_windows is None:
        pair_windows = (N <= 64 and nW % 2 == 0
                        and attn_impl in ("exp2", "headdot", "exact"))
    pair = 2 if pair_windows else 1
    if pair == 2:
        offb = jnp.full((nh, N, N), -1e5, jnp.float32)
        bias = jnp.concatenate(
            [jnp.concatenate([bias, offb], axis=2),
             jnp.concatenate([offb, bias], axis=2)], axis=1)  # (nh, 2N, 2N)
        if has_mask:
            m2 = mask.reshape(nW // 2, 2, N, N)
            z = jnp.zeros((nW // 2, N, N), jnp.float32)
            mask = jnp.concatenate(
                [jnp.concatenate([m2[:, 0], z], axis=2),
                 jnp.concatenate([z, m2[:, 1]], axis=2)], axis=1)
        else:
            mask = jnp.zeros((1, 2 * N, 2 * N), jnp.float32)

    def v1(a):  # 1-D param -> (1, D) for 2-D VMEM layout
        return jnp.asarray(a, jnp.float32).reshape(1, -1)

    has_dp = dp_masks is not None
    if dp_masks is None:
        dp_masks = jnp.ones((B, 2), jnp.float32)

    hd = C // nh
    proj_w = jnp.asarray(proj_p["kernel"], jnp.float32)
    if attn_impl == "headdot":
        # per-head weight layouts (leading-axis indexing is free in-kernel;
        # lane slicing the (R, 3C) qkv activation at hd*h offsets is not):
        # q|k (2, nh, C, hd); v and proj folded: (nh, C, C); total folded
        # bias = projb + sum_h bv_h @ proj_h (softmax rows sum to 1, so the
        # v bias passes through attention unchanged and adds once post-sum)
        wq3 = qkv_w[:, :C].reshape(C, nh, hd).transpose(1, 0, 2)
        wk3 = qkv_w[:, C:2 * C].reshape(C, nh, hd).transpose(1, 0, 2)
        bq3 = qkv_b[:C].reshape(nh, 1, hd)
        bk3 = qkv_b[C:2 * C].reshape(nh, 1, hd)
        qkv_b3 = jnp.stack([bq3, bk3])                     # (2, nh, 1, hd)
        wv3 = qkv_w[:, 2 * C:].reshape(C, nh, hd).transpose(1, 0, 2)
        bv3 = qkv_b[2 * C:].reshape(nh, hd)
        qkv_w = jnp.stack([wq3, wk3])                      # (2, nh, C, hd)
        pr3 = proj_w.reshape(nh, hd, C)
        proj_w = jnp.einsum("ncd,nde->nce", wv3, pr3)      # (nh, C, C)
        proj_b = (jnp.einsum("nd,nde->e", bv3, pr3)
                  + jnp.asarray(proj_p["bias"], jnp.float32)).reshape(1, C)
    else:
        qkv_b3 = qkv_b.reshape(1, -1)
        proj_b = v1(proj_p["bias"])

    args = [
        x, dp_masks,
        v1(p["norm1"]["scale"]), v1(p["norm1"]["bias"]),
        qkv_w, qkv_b3,
        proj_w, proj_b,
        v1(p["norm2"]["scale"]), v1(p["norm2"]["bias"]),
        jnp.asarray(fc1_p["kernel"], jnp.float32), v1(fc1_p["bias"]),
        jnp.asarray(fc2_p["kernel"], jnp.float32), v1(fc2_p["bias"]),
        bias, mask,
    ]

    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    if attn_impl == "headdot":
        qkv_specs = [const(2, nh, C, hd), const(2, nh, 1, hd),
                     const(nh, C, C), const(1, C)]
    else:
        qkv_specs = [const(*qkv_w.shape), const(1, qkv_w.shape[1]),
                     const(C, C), const(1, C)]
    in_specs = [
        pl.BlockSpec((G, L, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        pl.BlockSpec((B, 2), lambda b: (0, 0), memory_space=pltpu.SMEM),
        const(1, C), const(1, C),
        *qkv_specs,
        const(1, C), const(1, C),
        const(C, hidden), const(1, hidden),
        const(hidden, C), const(1, C),
        const(*bias.shape), const(*mask.shape),
    ]
    merge = merge_params is not None
    if merge:
        assert not has_dp, "merge fold is eval-only (no drop-path)"
        red_p = dense(merge_params["reduction"])
        # per-piece zero-pad to Cp lanes/rows so the kernel's 128-aligned
        # slices pick them up and pad lanes normalize to exactly 0 (see the
        # merge branch of _block_kernel)
        Cp = -(-C // 128) * 128
        lane_pad = ((0, 0), (0, Cp - C))
        mns_ = jnp.pad(jnp.asarray(merge_params["norm"]["scale"],
                                   jnp.float32).reshape(4, C),
                       lane_pad).reshape(1, 4 * Cp)
        mnb_ = jnp.pad(jnp.asarray(merge_params["norm"]["bias"],
                                   jnp.float32).reshape(4, C),
                       lane_pad).reshape(1, 4 * Cp)
        redw_ = jnp.pad(jnp.asarray(red_p["kernel"],
                                    jnp.float32).reshape(4, C, 2 * C),
                        ((0, 0), (0, Cp - C), (0, 0))).reshape(4 * Cp, 2 * C)
        args += [mns_, mnb_, redw_]
        in_specs += [const(1, 4 * Cp), const(1, 4 * Cp),
                     const(4 * Cp, 2 * C)]
        out_spec = pl.BlockSpec((G, L // 4, 2 * C), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, L // 4, 2 * C), x.dtype)
    else:
        out_spec = pl.BlockSpec((G, L, C), lambda b: (b, 0, 0),
                                memory_space=pltpu.VMEM)
        out_shape = jax.ShapeDtypeStruct((B, L, C), x.dtype)
    return pl.pallas_call(
        partial(_block_kernel, H=H, W=W, C=C, nh=nh, w=w, shift=shift,
                hidden=hidden, has_mask=has_mask, has_dp=has_dp,
                compute_dtype=compute_dtype, attn_impl=attn_impl,
                merge=merge, pair=pair, hidden_cd=hidden_cd,
                sum_pv=sum_pv, exp_bf16=exp_bf16, nomax=nomax),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=out_spec,
        out_shape=out_shape,
        # the big stage-0 tile (4096 tokens) peaks ~21 MB of live VMEM —
        # above XLA's conservative 16 MB scoped default, well under the
        # chip's 128 MB; larger groups need a higher cap (vmem_limit_mb)
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=vmem_limit_mb * 1024 * 1024),
        interpret=interpret,
    )(*args)


# --------------------------------------------------------------------------
# Whole-stage fusion: all blocks of a Swin stage in ONE kernel invocation.
# Eval-only (no drop-path). Saves the per-block HBM round-trip of the token
# activations plus (depth-1) kernel launches; blocks within a stage share
# every shape, so their params stack on a leading depth axis.
# --------------------------------------------------------------------------


def _stage_kernel(x_ref, ln1s, ln1b, qkvw, qkvb, projw, projb,
                  ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, bias_ref, mask_ref,
                  out_ref, *, H, W, C, nh, w, shifts, hidden, has_mask,
                  compute_dtype):
    N = w * w
    nW = (H // w) * (W // w)
    hd = C // nh
    scale = hd ** -0.5
    cd = compute_dtype
    G, L = x_ref.shape[0], H * W
    fast = False  # see _block_kernel

    x0 = x_ref[:].astype(cd)  # (G, L, C)
    for d, shift in enumerate(shifts):
        h = _ln(x0.astype(jnp.float32), ln1s[d, 0], ln1b[d, 0],
                fast).astype(cd)
        img = h.reshape(G, H, W, C)
        if shift:
            img = jnp.roll(img, shift=(-shift, -shift), axis=(1, 2))
        win = img.reshape(G, H // w, w, W // w, w, C)
        win = jnp.transpose(win, (0, 1, 3, 2, 4, 5)).reshape(G * nW * N, C)

        qkv = jnp.dot(win, qkvw[d].astype(cd),
                      preferred_element_type=jnp.float32) + qkvb[d]
        qkv = qkv.astype(cd)

        heads = []
        for hh in range(nh):
            q = qkv[:, hh * hd:(hh + 1) * hd].reshape(G * nW, N, hd)
            k = qkv[:, C + hh * hd: C + (hh + 1) * hd].reshape(G * nW, N, hd)
            v = qkv[:, 2 * C + hh * hd: 2 * C + (hh + 1) * hd].reshape(
                G * nW, N, hd)
            s = jax.lax.dot_general(q * jnp.asarray(scale, cd), k,
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[d, hh][None]
            if has_mask and shift:
                s = (s.reshape(G, nW, N, N)
                     + mask_ref[:][None]).reshape(G * nW, N, N)
            p = _softmax(s, fast).astype(cd)
            o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            heads.append(o.reshape(G * nW * N, hd))
        attn = jnp.concatenate(heads, axis=-1).astype(cd)
        attn = (jnp.dot(attn, projw[d].astype(cd),
                        preferred_element_type=jnp.float32)
                + projb[d]).astype(cd)

        img2 = attn.reshape(G, H // w, W // w, w, w, C)
        img2 = jnp.transpose(img2, (0, 1, 3, 2, 4, 5)).reshape(G, H, W, C)
        if shift:
            img2 = jnp.roll(img2, shift=(shift, shift), axis=(1, 2))
        y = (x0 + img2.reshape(G, L, C)).reshape(G * L, C)

        def mlp(yc, d=d):
            h2 = _ln(yc.astype(jnp.float32), ln2s[d, 0], ln2b[d, 0],
                     fast).astype(cd)
            f = jnp.dot(h2, fc1w[d].astype(cd),
                        preferred_element_type=jnp.float32) + fc1b[d]
            f = (_gelu_poly(f) if cd == jnp.bfloat16
                 else _gelu_exact(f)).astype(cd)
            return (jnp.dot(f, fc2w[d].astype(cd),
                            preferred_element_type=jnp.float32)
                    + fc2b[d]).astype(cd)

        n_chunks = _mlp_chunks(G * L)
        rows = (G * L) // n_chunks
        x0 = jnp.concatenate(
            [y[c * rows:(c + 1) * rows] + mlp(y[c * rows:(c + 1) * rows])
             for c in range(n_chunks)], axis=0).reshape(G, L, C)
    out_ref[:] = x0.astype(out_ref.dtype)


def swin_stage_fused(x: jnp.ndarray, blocks, *, H: int, W: int, nh: int,
                     window: int, shifts, compute_dtype=jnp.bfloat16,
                     group: int = 0, interpret: bool = False) -> jnp.ndarray:
    """x (B, H*W, C) + a list of block param subtrees -> (B, H*W, C).

    STATUS (settled round 3): kept as a spare, NOT on the serving path.
    This v1 (fully-unrolled multi-block body) compile-hangs on Mosaic for
    the 6-deep stage; v2 below compiles fine but measured SLOWER than the
    per-block kernel at runtime on a quiet box (49.2 vs 43.7 ms for the
    full fused HTSAT forward @B=128 — docs/PERF.md round 3), so serving
    uses swin_block_fused.

    Equivalent to running ``swin_block_fused`` sequentially over ``blocks``
    with the given per-block shifts (eval mode). ``shifts`` must already
    follow the reference clamp rule.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, C = x.shape
    w = window
    N = w * w
    nW = (H // w) * (W // w)
    depth = len(blocks)
    shifts = tuple(shifts)
    assert len(shifts) == depth

    G = group or max(1, PAYLOAD_TOKEN_CHANNELS // (L * C))
    while B % G:
        G -= 1

    def dense(d):
        return d["base"] if "base" in d else d

    wd = compute_dtype  # big matrices pre-cast (flax casts params anyway)

    def stack(get, dtype):
        return jnp.stack([jnp.asarray(get(p), dtype) for p in blocks])

    def stack1(get):  # 1-D params -> (depth, 1, D) f32
        return jnp.stack([jnp.asarray(get(p), jnp.float32).reshape(1, -1)
                          for p in blocks])

    hidden = dense(blocks[0]["mlp"]["fc1"])["kernel"].shape[1]
    bias = jnp.stack([_rel_bias(p["attn"]["relative_position_bias_table"],
                                w, nh) for p in blocks])
    base_shift = max(shifts)
    if base_shift > 0:
        from ...models.htsat import shift_attn_mask

        mask = jnp.asarray(shift_attn_mask(H, W, w, base_shift))
        has_mask = True
    else:
        mask = jnp.zeros((1, N, N), jnp.float32)
        has_mask = False

    args = [
        x,
        stack1(lambda p: p["norm1"]["scale"]),
        stack1(lambda p: p["norm1"]["bias"]),
        stack(lambda p: dense(p["attn"]["qkv"])["kernel"], wd),
        stack1(lambda p: dense(p["attn"]["qkv"])["bias"]),
        stack(lambda p: dense(p["attn"]["proj"])["kernel"], wd),
        stack1(lambda p: dense(p["attn"]["proj"])["bias"]),
        stack1(lambda p: p["norm2"]["scale"]),
        stack1(lambda p: p["norm2"]["bias"]),
        stack(lambda p: dense(p["mlp"]["fc1"])["kernel"], wd),
        stack1(lambda p: dense(p["mlp"]["fc1"])["bias"]),
        stack(lambda p: dense(p["mlp"]["fc2"])["kernel"], wd),
        stack1(lambda p: dense(p["mlp"]["fc2"])["bias"]),
        bias, mask,
    ]

    const = lambda *shape: pl.BlockSpec(shape, lambda b: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((G, L, C), lambda b: (b, 0, 0), memory_space=pltpu.VMEM),
        const(depth, 1, C), const(depth, 1, C),
        const(depth, C, 3 * C), const(depth, 1, 3 * C),
        const(depth, C, C), const(depth, 1, C),
        const(depth, 1, C), const(depth, 1, C),
        const(depth, C, hidden), const(depth, 1, hidden),
        const(depth, hidden, C), const(depth, 1, C),
        const(depth, nh, N, N), const(mask.shape[0], N, N),
    ]
    return pl.pallas_call(
        partial(_stage_kernel, H=H, W=W, C=C, nh=nh, w=w, shifts=shifts,
                hidden=hidden, has_mask=has_mask,
                compute_dtype=compute_dtype),
        grid=(B // G,),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, L, C), lambda b: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024),
        interpret=interpret,
    )(*args)


# --------------------------------------------------------------------------
# Stage fusion v2: grid over (batch, depth) with the token activations
# CARRIED in the revisited output block, instead of a Python-unrolled
# depth loop. The unrolled _stage_kernel compiles one Mosaic program with
# depth copies of the block body — stage 2 (6 blocks) reproducibly hung
# Mosaic for 35+ min on v5e. Here the kernel body contains exactly TWO
# block instances (unshifted / shifted, selected by pl.when on d % 2, so
# every jnp.roll shift stays static), and per-block weights stream in via
# depth-indexed BlockSpecs, which also caps weight VMEM at one block.
# --------------------------------------------------------------------------


def _stage2_kernel(x_ref, ln1s, ln1b, qkvw, qkvb, projw, projb,
                   ln2s, ln2b, fc1w, fc1b, fc2w, fc2b, bias_ref, mask_ref,
                   out_ref, *, H, W, C, nh, w, base_shift, hidden, has_mask,
                   compute_dtype):
    from jax.experimental import pallas as pl

    N = w * w
    nW = (H // w) * (W // w)
    hd = C // nh
    scale = hd ** -0.5
    cd = compute_dtype
    G, L = x_ref.shape[0], H * W
    fast = False  # see _block_kernel

    d = pl.program_id(1)
    # carry: block 0 reads the kernel input; later blocks read the
    # revisited output block (same index map -> still resident)
    x0 = jnp.where(d == 0, x_ref[:], out_ref[:]).astype(cd)

    def block_body(x0, shift):
        h = _ln(x0.astype(jnp.float32), ln1s[0, 0], ln1b[0, 0],
                fast).astype(cd)
        img = h.reshape(G, H, W, C)
        if shift:
            img = jnp.roll(img, shift=(-shift, -shift), axis=(1, 2))
        win = img.reshape(G, H // w, w, W // w, w, C)
        win = jnp.transpose(win, (0, 1, 3, 2, 4, 5)).reshape(G * nW * N, C)

        qkv = jnp.dot(win, qkvw[0].astype(cd),
                      preferred_element_type=jnp.float32) + qkvb[0]
        qkv = qkv.astype(cd)
        heads = []
        for hh in range(nh):
            q = qkv[:, hh * hd:(hh + 1) * hd].reshape(G * nW, N, hd)
            k = qkv[:, C + hh * hd: C + (hh + 1) * hd].reshape(G * nW, N, hd)
            v = qkv[:, 2 * C + hh * hd: 2 * C + (hh + 1) * hd].reshape(
                G * nW, N, hd)
            s = jax.lax.dot_general(q * jnp.asarray(scale, cd), k,
                                    (((2,), (2,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            s = s + bias_ref[0, hh][None]
            if has_mask and shift:
                s = (s.reshape(G, nW, N, N)
                     + mask_ref[:][None]).reshape(G * nW, N, N)
            p = _softmax(s, fast).astype(cd)
            o = jax.lax.dot_general(p, v, (((2,), (1,)), ((0,), (0,))),
                                    preferred_element_type=jnp.float32)
            heads.append(o.reshape(G * nW * N, hd))
        attn = jnp.concatenate(heads, axis=-1).astype(cd)
        attn = (jnp.dot(attn, projw[0].astype(cd),
                        preferred_element_type=jnp.float32)
                + projb[0]).astype(cd)

        img2 = attn.reshape(G, H // w, W // w, w, w, C)
        img2 = jnp.transpose(img2, (0, 1, 3, 2, 4, 5)).reshape(G, H, W, C)
        if shift:
            img2 = jnp.roll(img2, shift=(shift, shift), axis=(1, 2))
        y = (x0 + img2.reshape(G, L, C)).reshape(G * L, C)

        def mlp(yc):
            h2 = _ln(yc.astype(jnp.float32), ln2s[0, 0], ln2b[0, 0],
                     fast).astype(cd)
            f = jnp.dot(h2, fc1w[0].astype(cd),
                        preferred_element_type=jnp.float32) + fc1b[0]
            f = (_gelu_poly(f) if cd == jnp.bfloat16
                 else _gelu_exact(f)).astype(cd)
            return (jnp.dot(f, fc2w[0].astype(cd),
                            preferred_element_type=jnp.float32)
                    + fc2b[0]).astype(cd)

        n_chunks = _mlp_chunks(G * L)
        rows = (G * L) // n_chunks
        return jnp.concatenate(
            [y[c * rows:(c + 1) * rows] + mlp(y[c * rows:(c + 1) * rows])
             for c in range(n_chunks)], axis=0).reshape(G, L, C)

    if base_shift == 0:
        out_ref[:] = block_body(x0, 0).astype(out_ref.dtype)
    else:
        @pl.when(d % 2 == 0)
        def _():
            out_ref[:] = block_body(x0, 0).astype(out_ref.dtype)

        @pl.when(d % 2 == 1)
        def _():
            out_ref[:] = block_body(x0, base_shift).astype(out_ref.dtype)


def swin_stage_fused_v2(x: jnp.ndarray, blocks, *, H: int, W: int, nh: int,
                        window: int, shifts, compute_dtype=jnp.bfloat16,
                        group: int = 0, interpret: bool = False) -> jnp.ndarray:
    """Grid-over-depth whole-stage kernel; semantics == swin_stage_fused.

    ``shifts`` must follow the reference pattern (0 for even blocks,
    a single base shift for odd blocks)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, L, C = x.shape
    w = window
    N = w * w
    depth = len(blocks)
    shifts = tuple(shifts)
    base_shift = max(shifts)
    assert all(s == (0 if j % 2 == 0 else base_shift)
               for j, s in enumerate(shifts)), shifts

    G = group or max(1, PAYLOAD_TOKEN_CHANNELS // (L * C))
    while B % G:
        G -= 1

    def dense(d):
        return d["base"] if "base" in d else d

    wd = compute_dtype

    def stack(get, dtype):
        return jnp.stack([jnp.asarray(get(p), dtype) for p in blocks])

    def stack1(get):
        return jnp.stack([jnp.asarray(get(p), jnp.float32).reshape(1, -1)
                          for p in blocks])

    hidden = dense(blocks[0]["mlp"]["fc1"])["kernel"].shape[1]
    bias = jnp.stack([_rel_bias(p["attn"]["relative_position_bias_table"],
                                w, nh) for p in blocks])
    if base_shift > 0:
        from ...models.htsat import shift_attn_mask

        mask = jnp.asarray(shift_attn_mask(H, W, w, base_shift))
        has_mask = True
    else:
        mask = jnp.zeros((1, N, N), jnp.float32)
        has_mask = False

    args = [
        x,
        stack1(lambda p: p["norm1"]["scale"]),
        stack1(lambda p: p["norm1"]["bias"]),
        stack(lambda p: dense(p["attn"]["qkv"])["kernel"], wd),
        stack1(lambda p: dense(p["attn"]["qkv"])["bias"]),
        stack(lambda p: dense(p["attn"]["proj"])["kernel"], wd),
        stack1(lambda p: dense(p["attn"]["proj"])["bias"]),
        stack1(lambda p: p["norm2"]["scale"]),
        stack1(lambda p: p["norm2"]["bias"]),
        stack(lambda p: dense(p["mlp"]["fc1"])["kernel"], wd),
        stack1(lambda p: dense(p["mlp"]["fc1"])["bias"]),
        stack(lambda p: dense(p["mlp"]["fc2"])["kernel"], wd),
        stack1(lambda p: dense(p["mlp"]["fc2"])["bias"]),
        bias, mask,
    ]

    perd = lambda *shape: pl.BlockSpec(  # noqa: E731  depth-indexed block
        (1,) + shape, lambda b, d: (d,) + (0,) * len(shape),
        memory_space=pltpu.VMEM)
    in_specs = [
        pl.BlockSpec((G, L, C), lambda b, d: (b, 0, 0),
                     memory_space=pltpu.VMEM),
        perd(1, C), perd(1, C),
        perd(C, 3 * C), perd(1, 3 * C),
        perd(C, C), perd(1, C),
        perd(1, C), perd(1, C),
        perd(C, hidden), perd(1, hidden),
        perd(hidden, C), perd(1, C),
        perd(nh, N, N),
        pl.BlockSpec((mask.shape[0], N, N), lambda b, d: (0, 0, 0),
                     memory_space=pltpu.VMEM),
    ]
    return pl.pallas_call(
        partial(_stage2_kernel, H=H, W=W, C=C, nh=nh, w=w,
                base_shift=base_shift, hidden=hidden, has_mask=has_mask,
                compute_dtype=compute_dtype),
        grid=(B // G, depth),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((G, L, C), lambda b, d: (b, 0, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, L, C), x.dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024,
            dimension_semantics=("arbitrary", "arbitrary")),
        interpret=interpret,
    )(*args)
