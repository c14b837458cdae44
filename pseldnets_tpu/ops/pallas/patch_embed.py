"""Fused HTSAT patch embed: wav2img + 4x4/4 conv + bias + LN in ONE kernel.

Reference chain (src/models/components/htsat.py reshape_wav2img :493-511 +
model_utilities.py PatchEmbed): features (B, C, T, F) -> spec "image"
(H = g*F + f, W = t'') -> 4x4 stride-4 conv -> flatten -> LayerNorm. At
B=128 the XLA formulations (conv or einsum) spend ~2 ms/batch in layout
copies around a ~0.03 ms matmul (docs/PERF.md r5a/r5b/r5c): the token order
interleaves the time-group axis g (trailing-T blocks) with the freq axis, so
XLA materializes a transposed copy whichever way it's written. A kernel
reads each feature byte once and writes each token byte once.

Mechanics (Mosaic-legal, no lane splits below 128):
- grid (B, fr time groups); in tile (1, C, tg, F) — one wav2img time group,
  exactly the frontend kernel's t_blk=256 tile at production shapes.
- the f->(fp, df) split never happens on lanes: the conv folds into
  C*sw block-diagonal weights W2[(c,dt)] of shape (F, Fp*Ep) with
  W2[fp*sh+df, fp*Ep+e] = kern[df, dt, c, e]; the MXU does the gather
  (the block-diagonal padding costs ~0.6 ms of MXU at B=128 vs the ~2 ms
  of VPU copies it replaces).
- per-token LN runs on the (tp, Fp, Ep) view (lane split at Ep=128
  multiples is legal); pad lanes are zero so sums over them vanish, and
  moments divide by the REAL width E explicitly (the merge-fold pattern,
  swin_block.py).
- the (tp, fp) -> (fp, tp) token-order transpose happens on sublanes in
  VMEM, then one aligned store.
"""

from functools import partial
from typing import Dict

import jax
import jax.numpy as jnp
import numpy as np

__all__ = ["patch_embed_tokens"]


def _kernel(x_ref, w2_ref, b_ref, lns_ref, lnb_ref, out_ref, *,
            G, C, tg, F, sh, sw, E, Ep, compute_dtype, eps=1e-5):
    cd = compute_dtype
    tp_n = tg // sw
    fp_n = F // sh
    acc = jnp.zeros((G * tp_n, fp_n * Ep), jnp.float32)
    xt = x_ref[:]  # (G, C, tg, F)
    for c in range(C):
        fc = xt[:, c].reshape(G * tp_n, sw, F)  # sublane time-axis split
        for dt in range(sw):
            acc = acc + jnp.dot(fc[:, dt, :].astype(cd),
                                w2_ref[c * sw + dt].astype(cd),
                                preferred_element_type=jnp.float32)
    acc = acc + b_ref[0]  # bias broadcast, zero on pad lanes
    t4 = acc.reshape(G, tp_n, fp_n, Ep)
    # masked LN over the E real lanes (pad lanes are exactly 0: they add
    # nothing to the sums; divide by E, not Ep)
    m = jnp.sum(t4, axis=-1, keepdims=True) / E
    var = jnp.sum(t4 * t4, axis=-1, keepdims=True) / E - m * m
    y = (t4 - m) * jax.lax.rsqrt(var + eps) * lns_ref[0] + lnb_ref[0]
    y = jnp.transpose(y, (0, 2, 1, 3)).reshape(G, fp_n * tp_n, Ep)
    out_ref[:] = y[:, :, :E].astype(out_ref.dtype)


def patch_embed_tokens(x: jnp.ndarray, kern: jnp.ndarray, bias: jnp.ndarray,
                       ln_scale: jnp.ndarray, ln_bias: jnp.ndarray, *,
                       spec_size: int, freq_ratio: int,
                       patch_stride=(4, 4),
                       compute_dtype=jnp.bfloat16,
                       group: int = 8,
                       interpret: bool = False) -> jnp.ndarray:
    """(B, C, T, F) features -> (B, L, E) HTSAT stage-0 tokens.

    Equal to reshape_wav2img + conv(kern HWIO, stride=patch_stride, VALID) +
    bias + LayerNorm(ln_scale, ln_bias), token order row-major (g, fp, tp).
    T must already be padded to spec_size*freq_ratio (the fused frontend's
    ``full_frames`` output). patch_size must equal the stride (no overlap —
    the reference's production config).
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, T, F = x.shape
    fr = freq_ratio
    target_T = spec_size * fr
    assert T == target_T, (T, target_T)
    sh, sw = patch_stride
    kh, kw, kc, E = kern.shape
    assert (kh, kw) == (sh, sw) and kc == C, (kern.shape, C)
    tg = target_T // fr
    tp_n, fp_n = tg // sw, F // sh
    Ep = -(-E // 128) * 128

    # block-diagonal fold weights W2[(c,dt)][fp*sh+df, fp*Ep+e]: scatter the
    # conv kernel through a constant one-hot placement tensor so the build
    # is traced (kern is a jit arg — serving keeps params as arguments)
    place = np.zeros((F, fp_n, sh), np.float32)  # [f, fp, df] = [fp*sh+df]
    for fp in range(fp_n):
        for df in range(sh):
            place[fp * sh + df, fp, df] = 1.0
    w2 = jnp.einsum("xpv,vuce->cuxpe", jnp.asarray(place),
                    jnp.asarray(kern, jnp.float32))   # (C, sw, F, fp_n, E)
    w2 = jnp.pad(w2, ((0, 0),) * 4 + ((0, Ep - E),))
    # store in the compute dtype: the first r5e run kept w2 f32 (14.7 MB of
    # VMEM const re-streamed per grid cell) and lost 1.7 ms/batch
    w2 = w2.reshape(C * sw, F, fp_n * Ep).astype(compute_dtype)

    def padE(a):  # (E,) -> (1, fp_n*Ep) broadcast-per-block, zero pads
        row = jnp.pad(jnp.asarray(a, jnp.float32), (0, Ep - E))
        return jnp.tile(row, fp_n).reshape(1, fp_n * Ep)

    def padE1(a):  # (E,) -> (1, 1, Ep)
        return jnp.pad(jnp.asarray(a, jnp.float32),
                       (0, Ep - E)).reshape(1, 1, Ep)

    G = max(1, min(group, B))
    while B % G:
        G -= 1

    const = lambda *shape: pl.BlockSpec(shape, lambda b, g: (0,) * len(shape),
                                        memory_space=pltpu.VMEM)
    out = pl.pallas_call(
        partial(_kernel, G=G, C=C, tg=tg, F=F, sh=sh, sw=sw, E=E, Ep=Ep,
                compute_dtype=compute_dtype),
        grid=(B // G, fr),
        in_specs=[
            pl.BlockSpec((G, C, tg, F), lambda b, g: (b, 0, g, 0),
                         memory_space=pltpu.VMEM),
            const(C * sw, F, fp_n * Ep),
            const(1, fp_n * Ep),
            const(1, 1, Ep), const(1, 1, Ep),
        ],
        out_specs=pl.BlockSpec((G, fp_n * tp_n, E), lambda b, g: (b, g, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, fr * fp_n * tp_n, E),
                                       compute_dtype),
        compiler_params=pltpu.CompilerParams(
            vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(x, w2, padE(bias), padE1(ln_scale), padE1(ln_bias))
    return out
