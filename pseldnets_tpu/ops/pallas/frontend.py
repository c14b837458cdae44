"""Fused logmel+IV frontend as a single Pallas TPU kernel.

One kernel fuses the whole feature chain the reference spreads over
torchaudio ops (reference src/utils/feature.py:20-56):

    framing -> window ⊙ DFT (MXU matmul) -> power -> mel (MXU) -> dB
            -> FOA intensity vector -> L2-normalize -> mel (MXU)

Why a kernel: XLA already fuses the elementwise stages, but it materializes
the (B, 4, T, 513) real+imag spectra in HBM between the DFT and the mel/IV
stages (~16 MB per 10 s clip). Here each (batch, time-block) grid cell keeps
its spectra block in VMEM scratch and writes only the final (7, T_BLK, 64)
features — HBM spectra traffic disappears.

Grid: (B, T_pad / T_BLK). The signal is pre-cut into per-block slabs
((T_BLK-1)·hop + n_fft samples; ~2.6% duplication at the production config)
so BlockSpecs stay non-overlapping. Per-cell VMEM: slab (4, 31504) 0.5 MB +
frames (128, 1024) 0.5 MB + DFT matrix 4.2 MB + spectra scratch 2.1 MB ≈ 7 MB.
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from ..mel import mel_filterbank
from ..stft import dft_matrices
from ..windows import get_window

EPS_F32 = float(np.finfo(np.float32).eps)


def _kernel(x_ref, dft_ref, mel_ref, out_ref, frames, spectra, *, n_fft, hop,
            t_blk, n_freqs, n_mels, n_ch):
    from jax.experimental import pallas as pl

    def per_channel(c, carry):
        def fill(i, _):
            frames[i, :] = x_ref[0, 0, c, pl.dslice(i * hop, n_fft)]
            return _

        jax.lax.fori_loop(0, t_blk, fill, 0)
        spec = jnp.dot(frames[:, :], dft_ref[:, :],
                       precision=jax.lax.Precision.HIGHEST,
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
            precision=jax.lax.Precision.HIGHEST,
            preferred_element_type=jnp.float32)

    logmel = 10.0 * jnp.log10(jnp.maximum(mel_of(power), 1e-10))
    out_ref[0, 0:n_ch, :, :] = logmel

    # FOA intensity vector (W conj-cross with X/Y/Z), L2-normalized per TF bin
    w_re, w_im = re[0], im[0]
    iv = re[1:4] * w_re[None] + im[1:4] * w_im[None]  # (3, T_BLK, F)
    normal = jnp.sqrt(jnp.sum(iv * iv, axis=0, keepdims=True)) + EPS_F32
    out_ref[0, n_ch:n_ch + 3, :, :] = mel_of(iv / normal)


@partial(jax.jit, static_argnames=("n_fft", "hop", "window", "n_mels",
                                   "sample_rate", "t_blk", "interpret"))
def fused_logmel_iv(x: jnp.ndarray, *, n_fft: int = 1024, hop: int = 240,
                    window: str = "hann", n_mels: int = 64,
                    sample_rate: int = 24000, t_blk: int = 128,
                    interpret: bool = False) -> jnp.ndarray:
    """(B, 4, samples) float32 -> (B, 7, n_frames, n_mels); numerical parity
    with ops.features.LogmelIVExtractor (and the reference torchaudio chain)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    B, C, N = x.shape
    assert C == 4, "FOA input required"
    n_freqs = n_fft // 2 + 1
    n_frames = 1 + N // hop  # torch center=True frame count

    x = jnp.pad(x, ((0, 0), (0, 0), (n_fft // 2, n_fft // 2)), mode="reflect")
    t_pad = -(-n_frames // t_blk) * t_blk
    n_blocks = t_pad // t_blk
    slab = (t_blk - 1) * hop + n_fft
    need = (t_pad - 1) * hop + n_fft
    x = jnp.pad(x, ((0, 0), (0, 0), (0, max(0, need - x.shape[-1]))))

    # pre-cut per-block slabs (non-overlapping BlockSpecs; ~2.6% duplication)
    starts = np.arange(n_blocks) * t_blk * hop
    idx = starts[:, None] + np.arange(slab)[None, :]
    x_blocks = jnp.transpose(x[:, :, idx], (0, 2, 1, 3))  # (B, n_blocks, C, slab)

    win = get_window(window, n_fft)
    wcos, wsin = dft_matrices(n_fft, win)
    dft = jnp.asarray(np.concatenate([wcos, wsin], axis=1), jnp.float32)
    mel = jnp.asarray(mel_filterbank(sample_rate, n_fft, n_mels, fmin=20.0,
                                     fmax=sample_rate / 2.0, scale="htk",
                                     norm="slaney"), jnp.float32)

    out = pl.pallas_call(
        partial(_kernel, n_fft=n_fft, hop=hop, t_blk=t_blk, n_freqs=n_freqs,
                n_mels=n_mels, n_ch=C),
        grid=(B, n_blocks),
        in_specs=[
            pl.BlockSpec((1, 1, C, slab), lambda b, t: (b, t, 0, 0),
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
            pltpu.VMEM((t_blk, n_fft), jnp.float32),
            pltpu.VMEM((2 * C, t_blk, n_freqs), jnp.float32),
        ],
        interpret=interpret,
    )(x_blocks, dft, mel)
    return out[:, :, :n_frames, :]
