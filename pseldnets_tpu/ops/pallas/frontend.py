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


def _kernel(rows_ref, dft_ref, mel_ref, out_ref, spectra, *, n_freqs, n_ch,
            t_blk, n_parts, precision, split3):
    def dot(a, b):
        if split3:
            # hand-rolled bf16_3x (Mosaic has no Precision.HIGH)
            b_hi = b.astype(jnp.bfloat16)
            b_lo = (b - b_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            a_hi = a.astype(jnp.bfloat16)
            a_lo = (a - a_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            return (jnp.dot(a_hi, b_hi, preferred_element_type=jnp.float32)
                    + jnp.dot(a_hi, b_lo, preferred_element_type=jnp.float32)
                    + jnp.dot(a_lo, b_hi, preferred_element_type=jnp.float32))
        return jnp.dot(a, b, precision=precision,
                       preferred_element_type=jnp.float32)

    # batch all channels into one (C*T_BLK, hop) operand per shift — 4x the
    # matmul M-dim keeps the MXU full instead of four skinny dots
    def shifted(j):
        return jnp.concatenate([rows_ref[0, 0, c, j:j + t_blk]
                                for c in range(n_ch)], axis=0)

    spec = dot(shifted(0), dft_ref[0])
    for j in range(1, n_parts):
        spec = spec + dot(shifted(j), dft_ref[j])
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
    normal = jnp.sqrt(jnp.sum(iv * iv, axis=0, keepdims=True)) + EPS_F32
    out_ref[0, n_ch:n_ch + 3, :, :] = mel_of(iv / normal)


@partial(jax.jit, static_argnames=("n_fft", "hop", "window", "n_mels",
                                   "sample_rate", "t_blk", "interpret",
                                   "precision", "split3"))
def fused_logmel_iv(x: jnp.ndarray, *, n_fft: int = 1024, hop: int = 240,
                    window: str = "hann", n_mels: int = 64,
                    sample_rate: int = 24000, t_blk: int = 128,
                    interpret: bool = False, split3: bool = False,
                    precision=jax.lax.Precision.HIGHEST) -> jnp.ndarray:
    """(B, 4, samples) float32 -> (B, 7, n_frames, n_mels); numerical parity
    with ops.features.LogmelIVExtractor (and the reference torchaudio chain)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, N = x.shape
    assert C == 4, "FOA input required"
    n_freqs = n_fft // 2 + 1
    n_frames = 1 + N // hop  # torch center=True frame count
    t_pad = -(-n_frames // t_blk) * t_blk
    n_blocks = t_pad // t_blk
    n_parts = n_fft // hop + (1 if n_fft % hop else 0)

    # hop-length rows; each block needs t_blk + n_parts - 1 of them
    x = jnp.pad(x, ((0, 0), (0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    rows_per_block = t_blk + n_parts - 1
    rows_needed = (n_blocks - 1) * t_blk + rows_per_block
    need = rows_needed * hop
    x = jnp.pad(x, ((0, 0), (0, 0), (0, max(0, need - x.shape[-1]))))
    rows = x[..., :need].reshape(B, C, rows_needed, hop)
    # per-block row slabs (n_parts-1 boundary rows duplicated per block)
    idx = (np.arange(n_blocks)[:, None] * t_blk
           + np.arange(rows_per_block)[None, :])
    rows = jnp.swapaxes(rows[:, :, idx], 1, 2)  # (B, n_blocks, C, rpb, hop)

    win = get_window(window, n_fft)
    wcos, wsin = dft_matrices(n_fft, win)
    dft_full = np.concatenate([wcos, wsin], axis=1)  # (n_fft, 2*n_freqs)
    parts = np.zeros((n_parts, hop, 2 * n_freqs), np.float32)
    for j in range(n_parts):
        seg = dft_full[j * hop: min((j + 1) * hop, n_fft)]
        parts[j, : seg.shape[0]] = seg
    mel = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin=20.0,
                                     fmax=sample_rate / 2.0, scale="htk",
                                     norm="slaney"), jnp.float32)

    out = pl.pallas_call(
        partial(_kernel, n_freqs=n_freqs, n_ch=C, t_blk=t_blk,
                n_parts=n_parts, precision=precision, split3=split3),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, C, rows_per_block, hop),
                         lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_parts, hop, 2 * n_freqs), lambda b, t: (0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_freqs, n_mels), lambda b, t: (0, 0),
                         memory_space=pltpu.VMEM),
        ],
        out_specs=pl.BlockSpec((1, 7, t_blk, n_mels), lambda b, t: (b, 0, t, 0),
                               memory_space=pltpu.VMEM),
        out_shape=jax.ShapeDtypeStruct((B, 7, t_pad, n_mels), jnp.float32),
        scratch_shapes=[
            pltpu.VMEM((2 * C, t_blk, n_freqs), jnp.float32),
        ],
        interpret=interpret,
    )(rows, jnp.asarray(parts), mel)
    return out[:, :, :n_frames, :]
