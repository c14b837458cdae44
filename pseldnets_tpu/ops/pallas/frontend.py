"""Fused logmel+IV frontend as a single Pallas TPU kernel.

One kernel fuses the feature chain the reference spreads over torchaudio ops
(reference src/utils/feature.py:20-56):

    window ⊙ DFT (MXU matmul) -> power -> mel (MXU) -> dB
    -> FOA intensity vector -> L2-normalize -> mel (MXU)

Framing happens outside as static row-shift slices (ops.stft.frame_signal —
gather-free, bandwidth-speed). The kernel's win over the XLA pipeline is that
the (4, T, 513) real+imag spectra and power never round-trip HBM: each
(batch, time-block) grid cell keeps them in VMEM scratch and writes only the
final (7, T_BLK, 64) features. The DFT matmul runs at full f32 fidelity
(Precision.HIGHEST) but stays compute-bound in VMEM.

Per-cell VMEM at the production config (n_fft=1024, hop=240, T_BLK=128):
frames (4, 128, 1024) 2 MB + DFT matrix (1024, 1026) 4.2 MB + spectra scratch
(8, 128, 513) 2.1 MB + outputs ≈ 8.5 MB.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..mel import mel_filterbank
from ..stft import dft_matrices, frame_signal
from ..windows import get_window

EPS_F32 = float(np.finfo(np.float32).eps)


def _kernel(frames_ref, dft_ref, mel_ref, out_ref, spectra, *, n_freqs, n_ch,
            precision, split3):
    def per_channel(c, carry):
        f = frames_ref[0, 0, c]
        if split3:
            # hand-rolled bf16_3x (Mosaic has no Precision.HIGH): x=hi+lo,
            # M=Mhi+Mlo; x@M ≈ hi@Mhi + hi@Mlo + lo@Mhi (f32-accurate, 3 of
            # the 6 HIGHEST passes)
            m_hi = dft_ref[:, :].astype(jnp.bfloat16)
            m_lo = (dft_ref[:, :] - m_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            f_hi = f.astype(jnp.bfloat16)
            f_lo = (f - f_hi.astype(jnp.float32)).astype(jnp.bfloat16)
            spec = (jnp.dot(f_hi, m_hi, preferred_element_type=jnp.float32)
                    + jnp.dot(f_hi, m_lo, preferred_element_type=jnp.float32)
                    + jnp.dot(f_lo, m_hi, preferred_element_type=jnp.float32))
        else:
            spec = jnp.dot(f, dft_ref[:, :], precision=precision,
                           preferred_element_type=jnp.float32)
        spectra[c, :, :] = spec[:, :n_freqs]          # real
        spectra[n_ch + c, :, :] = spec[:, n_freqs:]   # imag
        return carry

    jax.lax.fori_loop(0, n_ch, per_channel, 0)

    re = spectra[0:n_ch, :, :]
    im = spectra[n_ch:2 * n_ch, :, :]
    power = re * re + im * im  # (4, T_BLK, F)

    def mel_of(v):
        return jax.lax.dot_general(
            v, mel_ref[:, :], dimension_numbers=(((2,), (0,)), ((), ())),
            precision=precision,
            preferred_element_type=jnp.float32)

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

    frames = frame_signal(x, n_fft, hop, center=True)  # (B, C, n_frames, n_fft)
    frames = jnp.pad(frames, ((0, 0), (0, 0), (0, t_pad - n_frames), (0, 0)))
    frames = jnp.swapaxes(frames, 1, 2).reshape(B, n_blocks, t_blk, C, n_fft)
    frames = jnp.swapaxes(frames, 2, 3)  # (B, n_blocks, C, t_blk, n_fft)

    wcos, wsin = dft_matrices(n_fft, get_window(window, n_fft))
    dft = jnp.asarray(np.concatenate([wcos, wsin], axis=1), jnp.float32)
    mel = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin=20.0,
                                     fmax=sample_rate / 2.0, scale="htk",
                                     norm="slaney"), jnp.float32)

    out = pl.pallas_call(
        partial(_kernel, n_freqs=n_freqs, n_ch=C, precision=precision,
                split3=split3),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, C, t_blk, n_fft), lambda b, t: (b, t, 0, 0, 0),
                         memory_space=pltpu.VMEM),
            pl.BlockSpec((n_fft, 2 * n_freqs), lambda b, t: (0, 0),
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
    )(frames, dft, mel)
    return out[:, :, :n_frames, :]
