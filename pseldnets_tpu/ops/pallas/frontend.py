"""Fused logmel+IV frontend as a single Pallas TPU kernel.

One kernel fuses the feature chain the reference spreads over torchaudio ops
(reference src/utils/feature.py:20-56):

    hop-decomposed windowed DFT (MXU) -> power -> mel (MXU) -> dB
    -> FOA intensity vector -> L2-normalize -> mel (MXU)

Framing never materializes: the signal is reshaped into hop-length rows
(~3% duplicated at block boundaries) and the windowed DFT is decomposed over
row shifts — with n_fft = k*hop + rem,

    spec[i] = sum_j  rows[i+j] @ D_j ,  D_j = (window (.) DFT)[j*hop:(j+1)*hop]

so each (batch, time-block) grid cell computes ceil(n_fft/hop) small MXU
matmuls over VMEM-resident rows instead of gathering overlapping frames
(Mosaic rejects unaligned hop-strided vector loads, and materializing frames
in HBM costs ~4x the signal bandwidth — it was half the serving step).

Per-cell VMEM at the production config (n_fft=1024, hop=240, T_BLK=128):
rows (4, 132, 240) 0.5 MB + D matrices (5, 240, 1026) 4.9 MB + spectra
scratch (8, 128, 513) 2.1 MB + outputs ~= 8 MB.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..mel import mel_filterbank
from ..stft import dft_matrices
from ..windows import get_window

EPS_F32 = float(np.finfo(np.float32).eps)


def _bnd_blk(bnd: int, t_blk: int) -> int:
    """Boundary-block height: smallest multiple of 8 >= bnd that DIVIDES
    t_blk — the boundary BlockSpec's index map offsets in units of
    t_blk // bnd_blk, so a non-divisor would silently read wrong rows
    (e.g. bnd=18..24 with t_blk=256 would round to 24, and 256//24
    truncates)."""
    cand = max(8, -(-bnd // 8) * 8)
    while cand <= t_blk and t_blk % cand:
        cand += 8
    assert cand <= t_blk and t_blk % cand == 0, \
        f"no boundary block height for bnd={bnd}, t_blk={t_blk}"
    return cand


def _kernel(rows_main, rows_bnd, dft_ref, mel_ref, out_ref, spectra, *,
            n_freqs, n_ch, t_blk, n_parts, precision, split3,
            iv_norm="exact"):
    # The t_blk main rows and the n_parts-1 boundary rows arrive as two
    # blocks of the SAME un-duplicated HBM array (boundary offsets are
    # multiples of the boundary block height), so the host never
    # materializes the ~4x-duplicated slab tensor.
    bnd = n_parts - 1
    slab_full = jnp.concatenate([rows_main[0], rows_bnd[0][:, :bnd]], axis=1)

    # batch all channels into one (C*T_BLK, hop) operand per shift — 4x the
    # matmul M-dim keeps the MXU full instead of four skinny dots; the
    # leading-dims merge is a free view, not a copy
    def shifted(slab, j):
        return slab[:, j:j + t_blk].reshape(n_ch * t_blk, slab.shape[-1])

    if split3:
        # hand-rolled bf16_3x (Mosaic has no Precision.HIGH). The DFT matrix
        # arrives pre-split into bf16 hi/lo planes (host-side, bit-identical
        # to splitting here), and the row slab is split once per grid cell —
        # boundary rows would otherwise be re-converted for every shift j.
        slab = slab_full  # (C, rpb, hop) f32
        slab_hi = slab.astype(jnp.bfloat16)
        slab_lo = (slab - slab_hi.astype(jnp.float32)).astype(jnp.bfloat16)
        spec = None
        for j in range(n_parts):
            a_hi = shifted(slab_hi, j)
            a_lo = shifted(slab_lo, j)
            s = (jnp.dot(a_hi, dft_ref[0, j], preferred_element_type=jnp.float32)
                 + jnp.dot(a_hi, dft_ref[1, j], preferred_element_type=jnp.float32)
                 + jnp.dot(a_lo, dft_ref[0, j], preferred_element_type=jnp.float32))
            spec = s if spec is None else spec + s
    else:
        slab = slab_full
        spec = None
        for j in range(n_parts):
            s = jnp.dot(shifted(slab, j), dft_ref[j], precision=precision,
                        preferred_element_type=jnp.float32)
            spec = s if spec is None else spec + s
    spec = spec.reshape(n_ch, t_blk, 2 * n_freqs)
    spectra[0:n_ch, :, :] = spec[:, :, :n_freqs]          # real
    spectra[n_ch:2 * n_ch, :, :] = spec[:, :, n_freqs:]   # imag

    re = spectra[0:n_ch, :, :]
    im = spectra[n_ch:2 * n_ch, :, :]
    power = re * re + im * im  # (4, T_BLK, F)

    def mel_of(v):
        lead = v.shape[:-1]
        flat = jnp.dot(v.reshape(-1, v.shape[-1]), mel_ref[:, :],
                       precision=precision, preferred_element_type=jnp.float32)
        return flat.reshape(lead + (mel_ref.shape[1],))

    out_ref[0, 0:n_ch, :, :] = 10.0 * jnp.log10(jnp.maximum(mel_of(power), 1e-10))

    # FOA intensity vector (W conj-cross with X/Y/Z), L2-normalized per TF bin
    w_re, w_im = re[0], im[0]
    iv = re[1:4] * w_re[None] + im[1:4] * w_im[None]  # (3, T_BLK, F)
    out_ref[0, n_ch:n_ch + 3, :, :] = mel_of(_iv_normalize(iv, iv_norm))


def _iv_normalize(iv, iv_norm):
    """IV unit-normalization: reference semantics are iv / (sqrt(s) + eps).

    iv_norm='rsqrt' uses the EXACT identity 1/(sqrt(s)+eps) =
    rsqrt(s) / (1 + eps*rsqrt(s)) — same value to f32 rounding, but the
    divide volume drops from 3*T*F to T*F (the remaining divide's operand is
    in [1, 2], so no precision is lost) and sqrt becomes the cheaper rsqrt."""
    s2 = jnp.sum(iv * iv, axis=0, keepdims=True)
    if iv_norm == "rsqrt":
        inv0 = jax.lax.rsqrt(jnp.maximum(s2, 1e-38))
        return iv * (inv0 / (1.0 + EPS_F32 * inv0))
    return iv / (jnp.sqrt(s2) + EPS_F32)


# window -> exact 3-tap frequency response (periodic cosine-sum windows):
# w[n] = a0 + b*cos(2*pi*n/N)  =>  X_w[k] = a0*X[k] + (b/2)*(X[k-1] + X[k+1])
_WIN_3TAP = {"hann": (0.5, -0.25), "hamming": (0.54, -0.23)}


def _kernel_dif(rows_main, rows_bnd, dft_ref, mel_ref, out_ref, *, nfh, hh,
                n_ch, t_blk, n_parts, precision, split3, win_a0, win_a1,
                iv_norm="exact"):
    """Radix-2 DIF variant: sum/diff half-frame streams + frequency-domain
    window.

    Unlike DIT (which decimates the SIGNAL into even/odd sample streams —
    an XLA interleave transpose, ~4.5 ms/batch at B=128), DIF combines the
    two halves of each frame: u[n] = x[n] + x[n+N/2] gives the even bins,
    v[n] = x[n] - x[n+N/2] (twiddled) the odd bins. Both are hop-shifted
    views of GLOBAL sum/diff signals y±[p] = padded[p] ± padded[p+N/2] —
    pure elementwise prep. The N/2-point sub-DFTs decompose over rows of
    height hh = hop/2; frame f needs hh-rows 2f+j, which are stride-1 lane
    slices [(j&1)*hh : +hh] of hop-height rows at sublane offset f + j//2 —
    no strided access anywhere. Same MAC count as DIT.

    The window cannot be folded into the DFT matrices (the butterfly must
    happen pre-matmul on unwindowed samples), so it is applied EXACTLY in
    the frequency domain: periodic cosine-sum windows are 3-tap there
    (X_w[k] = a0*X[k] + a1*(X[k-1]+X[k+1])), with conjugate-symmetry edge
    fixups X[-1] = conj(X[1]), X[N/2+1] = conj(X[N/2-1]) for real input.
    """
    moff = (n_parts - 1) // 2  # boundary hop-rows beyond the t_blk mains

    def chain(stream):
        slab = rows_main[0, stream]
        if moff:
            slab = jnp.concatenate(
                [slab, rows_bnd[0, stream][:, :moff]], axis=1)
        spec = None
        if split3:
            s_hi = slab.astype(jnp.bfloat16)
            s_lo = (slab - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            for j in range(n_parts):
                off, lo = j // 2, (j & 1) * hh
                a_hi = s_hi[:, off:off + t_blk, lo:lo + hh]
                a_lo = s_lo[:, off:off + t_blk, lo:lo + hh]
                a3 = jnp.concatenate([a_hi, a_hi, a_lo], axis=-1).reshape(
                    n_ch * t_blk, 3 * hh)
                s = jnp.dot(a3, dft_ref[stream, j],
                            preferred_element_type=jnp.float32)
                spec = s if spec is None else spec + s
        else:
            for j in range(n_parts):
                off, lo = j // 2, (j & 1) * hh
                a = slab[:, off:off + t_blk, lo:lo + hh].reshape(
                    n_ch * t_blk, hh)
                s = jnp.dot(a, dft_ref[stream, j], precision=precision,
                            preferred_element_type=jnp.float32)
                spec = s if spec is None else spec + s
        return spec.reshape(n_ch, t_blk, 2 * nfh)

    u = chain(0)   # even bins: U[k] = X[2k], k = 0..nfh-1
    v = chain(1)   # odd bins:  V[k] = X[2k+1], k = 0..nfh-2 (last col zero)
    ur, ui = u[:, :, :nfh], u[:, :, nfh:]
    vr, vi = v[:, :, :nfh], v[:, :, nfh:]

    # V[k-1] with the bin -1 fixup conj(V[0]); V[k]+... at k = nfh-1 (bin
    # N/2) needs V[nfh-1] := conj(V[nfh-2]) in place of the zero column
    vprev_r = jnp.concatenate([vr[:, :, :1], vr[:, :, :-1]], axis=-1)
    vprev_i = jnp.concatenate([-vi[:, :, :1], vi[:, :, :-1]], axis=-1)
    vfix_r = jnp.concatenate([vr[:, :, :-1], vr[:, :, -2:-1]], axis=-1)
    vfix_i = jnp.concatenate([vi[:, :, :-1], -vi[:, :, -2:-1]], axis=-1)
    # U[k+1] for the odd bins; the trailing garbage lane pairs with the
    # zero mel row but must stay finite
    unext_r = jnp.concatenate(
        [ur[:, :, 1:], jnp.zeros_like(ur[:, :, :1])], axis=-1)
    unext_i = jnp.concatenate(
        [ui[:, :, 1:], jnp.zeros_like(ui[:, :, :1])], axis=-1)

    even_r = win_a0 * ur + win_a1 * (vprev_r + vfix_r)
    even_i = win_a0 * ui + win_a1 * (vprev_i + vfix_i)
    odd_r = win_a0 * vr + win_a1 * (ur + unext_r)
    odd_i = win_a0 * vi + win_a1 * (ui + unext_i)

    # lane-packed halves from here on, exactly like _kernel_r2's pack path
    re2 = jnp.concatenate([even_r, odd_r], axis=-1)
    im2 = jnp.concatenate([even_i, odd_i], axis=-1)

    def melp(v):
        lead = v.shape[:-1]
        if split3:
            vf = v.reshape(-1, 2 * nfh)
            v_hi = vf.astype(jnp.bfloat16)
            v_lo = (vf - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            vv = jnp.concatenate([v_hi, v_hi, v_lo], axis=-1)
            flat = jnp.dot(vv, mel_ref[:, :],
                           preferred_element_type=jnp.float32)
        else:
            flat = jnp.dot(v.reshape(-1, 2 * nfh), mel_ref[:, :],
                           precision=precision,
                           preferred_element_type=jnp.float32)
        return flat.reshape(lead + (mel_ref.shape[-1],))

    power = re2 * re2 + im2 * im2
    out_ref[0, 0:n_ch, :, :] = 10.0 * jnp.log10(
        jnp.maximum(melp(power), 1e-10))
    iv = re2[1:4] * re2[0][None] + im2[1:4] * im2[0][None]
    out_ref[0, n_ch:n_ch + 3, :, :] = melp(_iv_normalize(iv, iv_norm))


def _kernel_r2(rows_main, rows_bnd, dft_ref, mel_ref, *rest, nfh, n_ch,
               t_blk, n_parts, precision, nsplit, mel_precision=None,
               pack=False, iv_norm="exact", has_affine=False, n_frames=None):
    """Radix-2 DIT variant: two half-size sub-DFT chains + butterfly.

    With E = DFT_{n/2}(even·w_even) and O' = twiddled DFT_{n/2}(odd·w_odd),
    S = E+O' gives spectrum bins 0..n/4 and D = E-O' gives bins n/2..n/4 in
    REVERSED order, conjugated (X[n/2-j] = conj(D[j])). Power and the FOA
    intensity vector are invariant under conjugation, and the mel projection
    absorbs the bin reversal into a host-built reversed mel matrix — so no
    in-kernel flip is ever needed. Halves the DFT MAC count exactly (the
    outputs are bit-identical transforms, not approximations).

    Rows arrive un-duplicated as two blocks of the same HBM array per stream
    (main t_blk rows + boundary rows), exactly like the main kernel — the
    round-1 variant's host-side row gather cost more than the halved MACs
    saved (docs/PERF.md).

    Output-side folds (serving path, docs/PERF.md round 3): ``has_affine``
    applies a per-(channel, mel) affine to the outputs inside the kernel
    (the model's eval ScalarBN — saves a full XLA pass over the features),
    and ``n_frames`` zeroes frames beyond the real count so the padded
    t_pad frames can feed the model directly (saves a slice + re-pad).
    ``out_ref`` may be bf16 — the cast rides the store.
    """
    if has_affine:
        aff_ref, out_ref = rest
    else:
        (out_ref,) = rest
        aff_ref = None

    def store(ch0, n, val):
        # val: (n, t_blk, n_mels) f32
        if aff_ref is not None:
            val = (val * aff_ref[0, ch0:ch0 + n][:, None, :]
                   + aff_ref[1, ch0:ch0 + n][:, None, :])
        if n_frames is not None:
            from jax.experimental import pallas as pl
            t0 = pl.program_id(1) * t_blk
            fr = t0 + jax.lax.broadcasted_iota(
                jnp.int32, (t_blk, val.shape[-1]), 0)
            val = jnp.where((fr < n_frames)[None], val, 0.0)
        out_ref[0, ch0:ch0 + n, :, :] = val.astype(out_ref.dtype)

    bnd = n_parts - 1

    def shifted(slab, j):
        return slab[:, j:j + t_blk].reshape(slab.shape[0] * t_blk,
                                            slab.shape[-1])

    def chain(stream):
        slab = jnp.concatenate([rows_main[0, stream],
                                rows_bnd[0, stream][:, :bnd]], axis=1)
        spec = None
        if nsplit == 3:
            # split3's a_hi@hi + a_hi@lo + a_lo@hi folded into ONE dot per
            # part: [a_hi|a_hi|a_lo] @ [hi;lo;hi] — the MXU accumulates the
            # three K-passes in f32 internally (bit-identical), deleting
            # ~10M external f32 adds per grid cell (measured ~3 ms/batch)
            s_hi = slab.astype(jnp.bfloat16)
            s_lo = (slab - s_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            slab3 = jnp.concatenate([s_hi, s_hi, s_lo], axis=-1)
            for j in range(n_parts):
                s = jnp.dot(shifted(slab3, j), dft_ref[stream, j],
                            preferred_element_type=jnp.float32)
                spec = s if spec is None else spec + s
        elif nsplit == 2:
            # bf16x2: [a_hi|a_hi] @ [hi;lo] = bf16 signal x f32-effective
            # weights — drops split3's signal-low-bits pass AND a third of
            # the dominant sub-DFT K width (3*hh -> 2*hh lanes). Error is the
            # signal's bf16 rounding (~2^-9 relative amplitude, measured
            # ~2e-2 dB worst-bin) — below the bf16 FEATURE cast serving
            # already applies (out_dtype=bf16 quantizes dB values at ~0.1).
            s_hi = slab.astype(jnp.bfloat16)
            slab2 = jnp.concatenate([s_hi, s_hi], axis=-1)
            for j in range(n_parts):
                s = jnp.dot(shifted(slab2, j), dft_ref[stream, j],
                            preferred_element_type=jnp.float32)
                spec = s if spec is None else spec + s
        else:
            for j in range(n_parts):
                s = jnp.dot(shifted(slab, j), dft_ref[stream, j],
                            precision=precision,
                            preferred_element_type=jnp.float32)
                spec = s if spec is None else spec + s
        return spec  # (C*t_blk, 2*nfh)

    ev = chain(0)
    ot = chain(1)
    s_f = ev + ot
    d_f = ev - ot

    mel_fold_p = (nsplit >= 2) if mel_precision is None \
        else mel_precision == "split3"
    mp_p = precision if mel_precision in (None, "split3") else mel_precision

    if pack:
        # lane-pack the two radix-2 halves: power/IV/normalize run once on
        # (.., 2*nfh=514) arrays (pad 640) instead of twice on 257-lane
        # arrays (pad 384 each, 768 total), and the mel projection becomes
        # ONE dot with K=514 (20% K-pad waste) instead of two K=257 dots
        # (33% waste each). mel_ref arrives pre-stacked [mel_lo; mel_hi].
        s = s_f.reshape(n_ch, t_blk, 2 * nfh)
        d = d_f.reshape(n_ch, t_blk, 2 * nfh)
        re2 = jnp.concatenate([s[:, :, :nfh], d[:, :, :nfh]], axis=-1)
        im2 = jnp.concatenate([s[:, :, nfh:], d[:, :, nfh:]], axis=-1)

        def melp(v):
            lead = v.shape[:-1]
            if mel_fold_p:
                vf = v.reshape(-1, 2 * nfh)
                v_hi = vf.astype(jnp.bfloat16)
                v_lo = (vf - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                vv = jnp.concatenate([v_hi, v_hi, v_lo], axis=-1)
                flat = jnp.dot(vv, mel_ref[:, :],
                               preferred_element_type=jnp.float32)
            else:
                flat = jnp.dot(v.reshape(-1, 2 * nfh), mel_ref[:, :],
                               precision=mp_p,
                               preferred_element_type=jnp.float32)
            return flat.reshape(lead + (mel_ref.shape[-1],))

        power = re2 * re2 + im2 * im2
        store(0, n_ch, 10.0 * jnp.log10(jnp.maximum(melp(power), 1e-10)))
        iv = re2[1:4] * re2[0][None] + im2[1:4] * im2[0][None]
        store(n_ch, 3, melp(_iv_normalize(iv, iv_norm)))
        return

    def halves(m):
        r = m.reshape(n_ch, t_blk, 2 * nfh)
        return r[:, :, :nfh], r[:, :, nfh:]

    s_re, s_im = halves(s_f)
    d_re, d_im = halves(d_f)

    mel_fold = (nsplit >= 2) if mel_precision is None \
        else mel_precision == "split3"
    mp = precision if mel_precision in (None, "split3") else mel_precision

    def mel2(lo, hi):
        lead = lo.shape[:-1]
        if mel_fold:
            # bf16x3 mel projection, folded into ONE dot per half:
            # [v_hi|v_hi|v_lo] @ [m_hi; m_lo; m_hi] — 7 K-passes vs f32
            # HIGHEST's 18 on the (.., 257)@(257, 64) dots (~3 ms/batch),
            # error ~2^-16 relative (same machinery as the DFT split3)
            def fold(v):
                vf = v.reshape(-1, nfh)
                v_hi = vf.astype(jnp.bfloat16)
                v_lo = (vf - v_hi.astype(jnp.float32)).astype(jnp.bfloat16)
                return jnp.concatenate([v_hi, v_hi, v_lo], axis=-1)

            flat = (jnp.dot(fold(lo), mel_ref[0],
                            preferred_element_type=jnp.float32)
                    + jnp.dot(fold(hi), mel_ref[1],
                              preferred_element_type=jnp.float32))
        else:
            flat = (jnp.dot(lo.reshape(-1, nfh), mel_ref[0],
                            precision=mp,
                            preferred_element_type=jnp.float32)
                    + jnp.dot(hi.reshape(-1, nfh), mel_ref[1],
                              precision=mp,
                              preferred_element_type=jnp.float32))
        return flat.reshape(lead + (mel_ref.shape[-1],))

    pow_lo = s_re * s_re + s_im * s_im
    pow_hi = d_re * d_re + d_im * d_im
    store(0, n_ch, 10.0 * jnp.log10(jnp.maximum(mel2(pow_lo, pow_hi), 1e-10)))

    iv_lo = s_re[1:4] * s_re[0][None] + s_im[1:4] * s_im[0][None]
    iv_hi = d_re[1:4] * d_re[0][None] + d_im[1:4] * d_im[0][None]
    store(n_ch, 3, mel2(_iv_normalize(iv_lo, iv_norm),
                        _iv_normalize(iv_hi, iv_norm)))


@partial(jax.jit, static_argnames=("n_fft", "hop", "window", "n_mels",
                                   "sample_rate", "t_blk", "interpret",
                                   "precision", "split3", "split_mode",
                                   "radix2",
                                   "mel_precision", "pack", "iv_norm",
                                   "prep", "variant", "trim", "out_dtype",
                                   "full_frames", "pre_scale_head"))
def fused_logmel_iv(x: jnp.ndarray, *, n_fft: int = 1024, hop: int = 240,
                    window: str = "hann", n_mels: int = 64,
                    sample_rate: int = 24000, t_blk: int = 256,
                    interpret: bool = False, split3: bool = False,
                    split_mode=None,
                    radix2=None, mel_precision=None, pack: bool = True,
                    iv_norm: str = "rsqrt", prep: str = "transpose",
                    variant: str = "dit", trim=None, pre_scale=None,
                    pre_scale_head: bool = False,
                    post_affine=None, out_dtype=jnp.float32,
                    full_frames: bool = False,
                    precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """(B, 4, samples) float32 -> (B, 7, n_frames, n_mels); numerical parity
    with ops.features.LogmelIVExtractor (and the reference torchaudio chain).

    radix2=None (auto) = on whenever nfft and hop are even. Round-1's DIT
    variant lost for split3 because its host-side row GATHER duplicated the
    signal ~4x; rebuilt with un-duplicated main+boundary row blocks it wins
    outright: 27.9 vs 38.7 ms @B=128 on v5e, parity 7.2e-4 dB logmel /
    3.3e-5 IV vs the f32 flat kernel (budget 8e-4 — docs/PERF.md).

    pack=True + iv_norm='rsqrt' are the measured round-3 production
    defaults: 25.44 vs 26.41 ms @B=128 (scripts/perf_r3b_probe.py), added
    deviation 3.6e-5 dB logmel / 1.9e-7 IV — far inside the budget.

    ``split_mode`` (radix-2 DIT only) selects the sub-DFT dot precision:
    None derives from ``split3`` ("bf16x3"/"f32"); "bf16x2" rounds the
    SIGNAL to bf16 while keeping f32-effective weights ([a_hi|a_hi] @
    [hi;lo]) — cuts the dominant dot K-width from 3*hh to 2*hh lanes at a
    dB error of the signal's bf16 rounding (~2e-2 worst-bin), which sits
    below the bf16 feature cast serving already applies via out_dtype.

    Serving-path folds (all optional, radix-2 DIT path only):
    - ``pre_scale``: scalar multiplied into the signal; XLA fuses it into
      the row-slab concatenate, so scaling the waveform becomes free
      (bench harnesses use it for their per-iteration input variation).
    - ``post_affine=(inv, shift)``: per-(channel, mel) affine applied to
      the outputs IN-KERNEL — the model's eval ScalarBN, folded so the
      separate XLA pass over the (B, 7, T, mel) features disappears.
    - ``out_dtype``: output dtype (bf16 halves the kernel's HBM writes).
    - ``full_frames``: return all t_pad frames with frames >= n_frames
      zeroed in-kernel — exactly the zero-pad the HTSAT reshape_wav2img
      would add, saving a slice + re-pad over the features.
    """
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, N = x.shape
    assert C == 4, "FOA input required"
    if split_mode is None:
        split_mode = "bf16x3" if split3 else "f32"
    assert split_mode in ("f32", "bf16x2", "bf16x3"), split_mode
    dit_path = ((radix2 is None or radix2) and n_fft % 2 == 0
                and hop % 2 == 0 and not (variant == "dif"
                                          and window in _WIN_3TAP))
    if split_mode == "bf16x2" and not dit_path:
        raise NotImplementedError("split_mode='bf16x2': radix-2 DIT only")
    if pre_scale is not None and not dit_path:
        # non-DIT variants: plain up-front scaling (the DIT path fuses the
        # scale into its prep concatenate operands instead)
        x = x * jnp.asarray(pre_scale, x.dtype)
        pre_scale = None
        pre_scale_head = False
    if hop >= n_fft:
        raise NotImplementedError(
            f"fused_logmel_iv requires hop < n_fft (got hop={hop}, "
            f"n_fft={n_fft}): the hop-row DFT decomposition needs at least "
            "one boundary row — use ops.features' XLA extractor instead")
    n_freqs = n_fft // 2 + 1
    n_frames = 1 + N // hop  # torch center=True frame count
    t_pad = -(-n_frames // t_blk) * t_blk
    n_blocks = t_pad // t_blk

    if radix2 is None:
        radix2 = True
    has_post = (post_affine is not None or full_frames
                or out_dtype != jnp.float32)
    if radix2 and n_fft % 2 == 0 and hop % 2 == 0:
        if variant == "dif" and window in _WIN_3TAP:
            if has_post:
                raise NotImplementedError(
                    "post_affine/out_dtype/full_frames: radix-2 DIT only")
            return _call_dif(x, pl=pl, pltpu=pltpu, n_fft=n_fft, hop=hop,
                             window=window, n_mels=n_mels,
                             sample_rate=sample_rate, t_blk=t_blk,
                             interpret=interpret, split3=split3,
                             precision=precision, iv_norm=iv_norm,
                             n_frames=n_frames, t_pad=t_pad,
                             n_blocks=n_blocks)
        return _call_radix2(x, pl=pl, pltpu=pltpu, n_fft=n_fft, hop=hop,
                            window=window, n_mels=n_mels,
                            sample_rate=sample_rate, t_blk=t_blk,
                            interpret=interpret, split_mode=split_mode,
                            precision=precision, mel_precision=mel_precision,
                            pack=pack, iv_norm=iv_norm, prep=prep, trim=trim,
                            n_frames=n_frames, t_pad=t_pad,
                            n_blocks=n_blocks, post_affine=post_affine,
                            out_dtype=out_dtype, full_frames=full_frames,
                            pre_scale=pre_scale,
                            pre_scale_head=pre_scale_head)
    if has_post:
        raise NotImplementedError(
            "post_affine/out_dtype/full_frames: radix-2 DIT only")

    n_parts = n_fft // hop + (1 if n_fft % hop else 0)
    bnd = n_parts - 1
    bnd_blk = _bnd_blk(bnd, t_blk)  # sublane-aligned boundary block height
    assert bnd >= 1 and t_blk % 8 == 0, (t_blk, n_parts)

    # hop-length rows, un-duplicated: each grid cell reads its t_blk main
    # rows plus bnd boundary rows as two blocks of the same array. The
    # reflect pad, zero tail and row split are ONE concatenate (a single
    # HBM copy) — two jnp.pad calls cost a second full-signal copy.
    rows_total = n_blocks * t_blk + bnd_blk
    need = rows_total * hop
    half = n_fft // 2
    pieces = [x[..., 1:half + 1][..., ::-1], x]
    tail = need - (N + half)
    if tail > 0:
        right = jnp.concatenate(
            [x[..., -(half + 1):-1][..., ::-1],
             jnp.zeros((B, C, max(0, tail - half)), x.dtype)], axis=-1)
        pieces.append(right[..., :tail])
    rows = jnp.concatenate(pieces, axis=-1)[..., :need].reshape(
        B, C, rows_total, hop)

    win = get_window(window, n_fft)
    wcos, wsin = dft_matrices(n_fft, win)
    dft_full = np.concatenate([wcos, wsin], axis=1)  # (n_fft, 2*n_freqs)
    parts = np.zeros((n_parts, hop, 2 * n_freqs), np.float32)
    for j in range(n_parts):
        seg = dft_full[j * hop: min((j + 1) * hop, n_fft)]
        parts[j, : seg.shape[0]] = seg
    if split3:  # pre-split the DFT operand into bf16 hi/lo planes
        hi = parts.astype(np.float32).astype(jnp.bfloat16)
        lo = (parts - np.asarray(hi, np.float32)).astype(jnp.bfloat16)
        parts = np.stack([np.asarray(hi), np.asarray(lo)], axis=0)
    mel = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin=20.0,
                                     fmax=sample_rate / 2.0, scale="htk",
                                     norm="slaney"), jnp.float32)

    out = pl.pallas_call(
        partial(_kernel, n_freqs=n_freqs, n_ch=C, t_blk=t_blk,
                n_parts=n_parts, precision=precision, split3=split3,
                iv_norm=iv_norm),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, C, t_blk, hop), lambda b, t: (b, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, C, bnd_blk, hop),
                         lambda b, t: (b, 0, (t + 1) * (t_blk // bnd_blk), 0),
                         memory_space=pltpu.VMEM),
            (pl.BlockSpec((2, n_parts, hop, 2 * n_freqs),
                          lambda b, t: (0, 0, 0, 0), memory_space=pltpu.VMEM)
             if split3 else
             pl.BlockSpec((n_parts, hop, 2 * n_freqs), lambda b, t: (0, 0, 0),
                          memory_space=pltpu.VMEM)),
            pl.BlockSpec((n_freqs, n_mels), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 7, t_blk, n_mels), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 7, t_pad, n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * C, t_blk, n_freqs), jnp.float32),
        ],
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(rows, rows, jnp.asarray(parts), mel)
    return out[:, :, :n_frames, :]


def _call_radix2(x, *, pl, pltpu, n_fft, hop, window, n_mels, sample_rate,
                 t_blk, interpret, split_mode, precision, n_frames, t_pad,
                 n_blocks, mel_precision=None, pack=False, iv_norm="exact",
                 prep="transpose", trim=None, post_affine=None,
                 out_dtype=jnp.float32, full_frames=False, pre_scale=None,
                 pre_scale_head=False):
    """Host prep + pallas_call for the radix-2 DIT kernel.

    Frame f covers padded[f*hop + n], n = 0..n_fft-1 (center=True reflect pad
    of n_fft/2 keeps parity). hop even => even frame samples live at even
    absolute positions, so decimating the SIGNAL once yields two streams in
    which the same hop-row decomposition applies with half the hop.
    """
    B, C, N = x.shape
    nsplit = {"f32": 0, "bf16x2": 2, "bf16x3": 3}[split_mode]
    hf, hh = n_fft // 2, hop // 2
    nfh = hf // 2 + 1
    n_freqs = n_fft // 2 + 1
    n_parts = -(-hf // hh)
    bnd = n_parts - 1
    assert bnd >= 1 and t_blk % 8 == 0, (t_blk, n_parts)
    bnd_blk = _bnd_blk(bnd, t_blk)

    # reflect pad + zero tail as ONE concatenate (single copy), then
    # decimate into the even/odd streams; rows stay un-duplicated — each
    # grid cell reads main + boundary blocks of the same array
    rows_total = n_blocks * t_blk + bnd_blk
    need = rows_total * hh  # per stream
    half = n_fft // 2
    # pre_scale rides each concatenate OPERAND (a scalar multiply fused into
    # the concat's input computations) — scaling x up front costs a separate
    # full-signal XLA pass (1.5 ms/batch at B=128, r4f/r4g profiles).
    # pre_scale_head=True multiplies ONLY the n_fft/2-sample reflect head
    # (bench harnesses: per-iteration input variation that defeats loop
    # hoisting/relay dedupe at ~0.4% of the signal instead of a multiply
    # over all 240k samples — the rest of the chain is bit-identical to
    # production's unscaled prep)
    sc = ((lambda a: a * jnp.asarray(pre_scale, a.dtype))
          if pre_scale is not None else (lambda a: a))
    sc_body = (lambda a: a) if pre_scale_head else sc
    pieces = [sc(x[..., 1:half + 1][..., ::-1]), sc_body(x)]
    tail = 2 * need - (N + half)
    if tail > 0:
        right = jnp.concatenate(
            [sc_body(x[..., -(half + 1):-1][..., ::-1]),
             jnp.zeros((B, C, max(0, tail - half)), x.dtype)], axis=-1)
        pieces.append(right[..., :tail])
    sig = jnp.concatenate(pieces, axis=-1)[..., :2 * need]
    # [b,c,r,k,p] = sig[b,c, (r*hh + k)*2 + p]: stream p, row r, sample k
    if prep == "stride":
        # two stride-2 lane slices + stack: same layout, different XLA
        # lowering than the 5-D interleave transpose (A/B'd on-chip,
        # scripts/perf_r3e_probe.py)
        rows = jnp.stack([sig[..., 0::2], sig[..., 1::2]],
                         axis=1).reshape(B, 2, C, rows_total, hh)
    else:
        # one transpose materializes both decimated streams in row layout
        rows = jnp.transpose(sig.reshape(B, C, rows_total, hh, 2),
                             (0, 4, 1, 2, 3))  # (B, 2 streams, C, rows, hh)

    mel = mel_filterbank(sample_rate, n_fft, n_mels, fmin=20.0,
                         fmax=sample_rate / 2.0, scale="htk", norm="slaney")

    # Lane-trim: each chain's [re(nfh) | im(nfh)] output is 2*nfh = 514
    # lanes -> MXU-padded to 640 (5 lane tiles). Bins 0 (DC, below fmin)
    # and n_fft/2 (Nyquist, exactly at the last mel triangle's edge) have
    # ~zero mel weight, and the D half's last lane is dead by construction
    # (only nfh-1 real bins) — so remap sub-DFT column 0 to generate bin
    # hf/2 instead of bin 0 and drop the last column: both chains become
    # exactly 256 lanes (4 tiles), a 20% MXU saving on the dominant dots,
    # with the S half covering bins [hf/2, 1..hf/2-1] and the D half
    # [dup, hf-1 .. hf/2+1]. Numerically exact (dropped weights < 1e-8).
    if trim is None:
        trim = (hf % 2 == 0
                and abs(mel[0]).max() < 1e-8
                and abs(mel[n_freqs - 1]).max() < 1e-8)
    if trim:
        kk = np.concatenate([[hf // 2], np.arange(1, hf // 2)])
        nfh = hf // 2
    else:
        kk = np.arange(nfh)

    # sub-DFT matrices: window folded in; odd stream pre-multiplied by the
    # W^k = exp(-2*pi*i*k/n_fft) twiddle so the kernel butterfly is add/sub
    win = get_window(window, n_fft).astype(np.float64)
    m = np.arange(hf)
    base = np.exp(-2j * np.pi * np.outer(m, kk) / hf)
    tw = np.exp(-1j * np.pi * kk / hf)
    mats = []
    for w_sub, t in ((win[0::2], None), (win[1::2], tw)):
        dc = w_sub[:, None] * base
        if t is not None:
            dc = dc * t[None, :]
        dr = np.concatenate([dc.real, dc.imag], axis=1).astype(np.float32)
        p = np.zeros((n_parts, hh, 2 * nfh), np.float32)
        for j in range(n_parts):
            seg = dr[j * hh: min((j + 1) * hh, hf)]
            p[j, : seg.shape[0]] = seg
        mats.append(p)
    parts = np.stack(mats, axis=0)  # (2, np, hh, 2*nfh)
    if nsplit == 3:
        hi = np.asarray(parts.astype(jnp.bfloat16))
        lo = np.asarray((parts - np.asarray(hi, np.float32)
                         ).astype(jnp.bfloat16))
        # one-dot layout: [hi_j; lo_j; hi_j] rows pair with the kernel's
        # [a_hi | a_hi | a_lo] operand -> (2 stream, np, 3*hh, 2*nfh)
        parts = np.concatenate([hi, lo, hi], axis=2)
    elif nsplit == 2:
        hi = np.asarray(parts.astype(jnp.bfloat16))
        lo = np.asarray((parts - np.asarray(hi, np.float32)
                         ).astype(jnp.bfloat16))
        # bf16x2: [hi_j; lo_j] rows pair with [a_hi | a_hi] — f32-effective
        # weights, bf16-rounded signal -> (2 stream, np, 2*hh, 2*nfh)
        parts = np.concatenate([hi, lo], axis=2)

    mel2 = np.zeros((2, nfh, n_mels), np.float32)
    if trim:
        mel2[0] = mel[kk]                      # S half: bins [hf/2, 1..]
        mel2[1, 1:] = mel[n_fft // 2 - kk[1:]]  # D half: bins hf-1..hf/2+1
    else:
        mel2[0] = mel[:nfh]
        mel2[1, : nfh - 1] = mel[n_freqs - 1: nfh - 1: -1]  # bins N/2.. rev

    # the mel fold stays bf16x3 under bf16x2 DFTs: power values are runtime
    # data (both planes needed for f32-effective accuracy) and the mel dot
    # is ~0.5 ms of the chain
    mel_fold = (nsplit >= 2) if mel_precision is None \
        else mel_precision == "split3"
    if pack:  # lane-packed halves -> ONE mel dot over [mel_lo; mel_hi]
        mel2 = np.concatenate([mel2[0], mel2[1]], axis=0)  # (2*nfh, n_mels)
        if mel_fold:
            m_hi = np.asarray(mel2.astype(jnp.bfloat16))
            m_lo = np.asarray((mel2 - np.asarray(m_hi, np.float32)
                               ).astype(jnp.bfloat16))
            mel2 = np.concatenate([m_hi, m_lo, m_hi], axis=0)
    elif mel_fold:  # [m_hi; m_lo; m_hi] rows for the kernel's bf16x3 fold
        m_hi = np.asarray(mel2.astype(jnp.bfloat16))
        m_lo = np.asarray((mel2 - np.asarray(m_hi, np.float32)
                           ).astype(jnp.bfloat16))
        mel2 = np.concatenate([m_hi, m_lo, m_hi], axis=1)

    dft_spec = pl.BlockSpec((2, n_parts, max(1, nsplit) * hh, 2 * nfh),
                            lambda b, t: (0, 0, 0, 0),
                            memory_space=pltpu.VMEM)
    mel_spec = (pl.BlockSpec((mel2.shape[0], n_mels), lambda b, t: (0, 0),
                             memory_space=pltpu.VMEM)
                if pack else
                pl.BlockSpec((2, mel2.shape[1], n_mels), lambda b, t: (0, 0, 0),
                             memory_space=pltpu.VMEM))
    in_specs = [
        pl.BlockSpec((1, 2, C, t_blk, hh), lambda b, t: (b, 0, 0, t, 0),
                     memory_space=pltpu.VMEM),
        pl.BlockSpec((1, 2, C, bnd_blk, hh),
                     lambda b, t: (b, 0, 0, (t + 1) * (t_blk // bnd_blk), 0),
                     memory_space=pltpu.VMEM),
        dft_spec,
        mel_spec,
    ]
    inputs = [rows, rows, jnp.asarray(parts), jnp.asarray(mel2)]
    if post_affine is not None:
        inv, shift = post_affine
        aff = jnp.stack([jnp.asarray(inv, jnp.float32),
                         jnp.asarray(shift, jnp.float32)])  # (2, 7, n_mels)
        in_specs.append(pl.BlockSpec((2, 7, n_mels), lambda b, t: (0, 0, 0),
                                     memory_space=pltpu.VMEM))
        inputs.append(aff)
    zero_tail = full_frames and n_frames < t_pad
    out = pl.pallas_call(
        partial(_kernel_r2, nfh=nfh, n_ch=C, t_blk=t_blk, n_parts=n_parts,
                precision=precision, nsplit=nsplit,
                mel_precision=mel_precision, pack=pack, iv_norm=iv_norm,
                has_affine=post_affine is not None,
                n_frames=n_frames if zero_tail else None),
        grid=(B, n_blocks),
        in_specs=in_specs,
        out_specs=pl.BlockSpec((1, 7, t_blk, n_mels), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 7, t_pad, n_mels), out_dtype),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(*inputs)
    if full_frames:
        return out
    return out[:, :, :n_frames, :]


def _call_dif(x, *, pl, pltpu, n_fft, hop, window, n_mels, sample_rate,
              t_blk, interpret, split3, precision, n_frames, t_pad,
              n_blocks, iv_norm="exact"):
    """Host prep + pallas_call for the radix-2 DIF kernel (_kernel_dif).

    Prep is pure elementwise: y±[p] = padded[p] ± padded[p + n_fft/2],
    reshaped straight into hop-height rows — replacing the DIT path's
    even/odd interleave transpose (the dominant XLA prep cost,
    ~4.5 ms/batch at B=128, docs/PERF.md round-3 profile).
    """
    B, C, N = x.shape
    hf, hh = n_fft // 2, hop // 2
    nfh = hf // 2 + 1
    n_freqs = n_fft // 2 + 1
    n_parts = -(-hf // hh)
    moff = (n_parts - 1) // 2  # extra hop-rows a grid cell reads past t_blk
    bnd_blk = _bnd_blk(max(1, moff), t_blk)
    win_a0, win_a1 = _WIN_3TAP[window]

    rows_total = n_blocks * t_blk + bnd_blk
    need = rows_total * hop
    half = n_fft // 2
    total = need + hf  # the shifted operand reads hf samples further
    pieces = [x[..., 1:half + 1][..., ::-1], x]
    tail = total - (N + half)
    if tail > 0:
        right = jnp.concatenate(
            [x[..., -(half + 1):-1][..., ::-1],
             jnp.zeros((B, C, max(0, tail - half)), x.dtype)], axis=-1)
        pieces.append(right[..., :tail])
    padded = jnp.concatenate(pieces, axis=-1)[..., :total]
    base = padded[..., :need]
    shft = padded[..., hf:hf + need]
    rows = jnp.stack([base + shft, base - shft], axis=1).reshape(
        B, 2, C, rows_total, hop)

    # sub-DFT matrices over frame-relative n = 0..hf-1, k = 0..nfh-1:
    # sum stream -> even bins X[2k]; diff stream pre-twiddled -> odd bins
    # X[2k+1] (its last column, bin n_fft/2 + 1, does not exist: zeroed)
    m = np.arange(hf)
    kk = np.arange(nfh)
    base_m = np.exp(-2j * np.pi * np.outer(m, kk) / hf)
    m0 = base_m
    m1 = np.exp(-1j * np.pi * m / hf)[:, None] * base_m
    m1 = m1.copy()
    m1[:, nfh - 1] = 0.0
    mats = []
    for mc in (m0, m1):
        dr = np.concatenate([mc.real, mc.imag], axis=1).astype(np.float32)
        p = np.zeros((n_parts, hh, 2 * nfh), np.float32)
        for j in range(n_parts):
            seg = dr[j * hh: min((j + 1) * hh, hf)]
            p[j, : seg.shape[0]] = seg
        mats.append(p)
    parts = np.stack(mats, axis=0)  # (2, np, hh, 2*nfh)
    if split3:
        hi = np.asarray(parts.astype(jnp.bfloat16))
        lo = np.asarray((parts - np.asarray(hi, np.float32)
                         ).astype(jnp.bfloat16))
        parts = np.concatenate([hi, lo, hi], axis=2)  # pairs [a_hi|a_hi|a_lo]

    # packed mel: rows [even bins 0,2,..,n_fft/2 ; odd bins 1,3,..,n_fft/2-1]
    mel = mel_filterbank(sample_rate, n_fft, n_mels, fmin=20.0,
                         fmax=sample_rate / 2.0, scale="htk", norm="slaney")
    mel2 = np.zeros((2 * nfh, n_mels), np.float32)
    mel2[:nfh] = mel[0::2]
    mel2[nfh:nfh + (n_freqs - nfh)] = mel[1::2]
    if split3:
        m_hi = np.asarray(mel2.astype(jnp.bfloat16))
        m_lo = np.asarray((mel2 - np.asarray(m_hi, np.float32)
                           ).astype(jnp.bfloat16))
        mel2 = np.concatenate([m_hi, m_lo, m_hi], axis=0)

    k_dim = 3 * hh if split3 else hh
    out = pl.pallas_call(
        partial(_kernel_dif, nfh=nfh, hh=hh, n_ch=C, t_blk=t_blk,
                n_parts=n_parts, precision=precision, split3=split3,
                win_a0=win_a0, win_a1=win_a1, iv_norm=iv_norm),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 2, C, t_blk, hop), lambda b, t: (b, 0, 0, t, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((1, 2, C, bnd_blk, hop),
                         lambda b, t: (b, 0, 0, (t + 1) * (t_blk // bnd_blk), 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((2, n_parts, k_dim, 2 * nfh),
                         lambda b, t: (0, 0, 0, 0), memory_space=pltpu.VMEM),
            pl.BlockSpec((mel2.shape[0], n_mels), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 7, t_blk, n_mels), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 7, t_pad, n_mels), jnp.float32),
        compiler_params=pltpu.CompilerParams(vmem_limit_bytes=64 * 1024 * 1024),
        interpret=interpret,
    )(rows, rows, jnp.asarray(parts), jnp.asarray(mel2))
    return out[:, :, :n_frames, :]
