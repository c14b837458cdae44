"""STFT for TPU.

Semantics match torchaudio.transforms.Spectrogram(power=None) as used by the
reference extractors (src/utils/feature.py:28-31): center=True, reflect padding,
onesided, no normalization, win_length = n_fft.

Two formulations:

* ``stft``      — framing + jnp.fft.rfft. Reference/oracle path.
* ``stft_dft``  — windowed DFT as a single real matmul on the MXU
                  (frames @ [window ⊙ cos | window ⊙ -sin]). On TPU the FFT is a
                  composite XLA lowering; for n_fft ≤ ~2048 the dense-DFT matmul
                  rides the 128x128 systolic array and fuses with the downstream
                  mel matmul, which is the win the fused frontend exploits.

Both return (real, imag) with layout (..., n_frames, n_freqs): time-major, which
is what every consumer here wants (the torch reference instead emits (F, T) and
transposes afterwards).
"""

from functools import partial

import jax
import jax.numpy as jnp
import numpy as np

from .windows import get_window


def _reflect_pad_last(x: jnp.ndarray, pad: int) -> jnp.ndarray:
    cfg = [(0, 0)] * (x.ndim - 1) + [(pad, pad)]
    return jnp.pad(x, cfg, mode="reflect")


def frame_signal(x: jnp.ndarray, n_fft: int, hop: int, center: bool = True) -> jnp.ndarray:
    """(..., samples) -> (..., n_frames, n_fft) with torch-style centering.

    Gather-free formulation: reshape the signal into hop-length rows and build
    each frame from ceil(n_fft/hop) static row-shifted slices — pure slicing
    and concatenation, which XLA and Mosaic both handle at full bandwidth
    (a row gather would serialize; unaligned vector loads are rejected by the
    TPU Mosaic compiler outright).
    """
    if center:
        x = _reflect_pad_last(x, n_fft // 2)
    n = x.shape[-1]
    n_frames = 1 + (n - n_fft) // hop
    k_full = n_fft // hop
    rem = n_fft % hop
    rows_needed = n_frames + k_full  # last frame touches rows [n_frames-1, .. +k_full]
    pad = rows_needed * hop - n
    if pad > 0:
        x = jnp.pad(x, [(0, 0)] * (x.ndim - 1) + [(0, pad)])
    rows = x[..., : rows_needed * hop].reshape(x.shape[:-1] + (rows_needed, hop))
    parts = [rows[..., j: j + n_frames, :] for j in range(k_full)]
    if rem:
        parts.append(rows[..., k_full: k_full + n_frames, :rem])
    return jnp.concatenate(parts, axis=-1)


def dft_matrices(n_fft: int, window: np.ndarray, dtype=np.float32):
    """Real/imag DFT basis pre-multiplied by the analysis window.

    Returns (wcos, wsin) of shape (n_fft, n_freqs) such that for a frame f:
    real = f @ wcos, imag = f @ wsin (matching numpy's rfft sign convention).
    """
    n_freqs = n_fft // 2 + 1
    n = np.arange(n_fft)[:, None]
    k = np.arange(n_freqs)[None, :]
    ang = 2.0 * np.pi * n * k / n_fft
    wcos = (np.cos(ang) * window[:, None]).astype(dtype)
    wsin = (-np.sin(ang) * window[:, None]).astype(dtype)
    return wcos, wsin


@partial(jax.jit, static_argnames=("n_fft", "hop", "window", "center"))
def stft(x: jnp.ndarray, n_fft: int, hop: int, window: str = "hann", center: bool = True):
    """FFT-based STFT. Returns (real, imag), shape (..., n_frames, n_freqs)."""
    win = jnp.asarray(get_window(window, n_fft), dtype=x.dtype)
    frames = frame_signal(x, n_fft, hop, center) * win
    spec = jnp.fft.rfft(frames, axis=-1)
    return jnp.real(spec).astype(x.dtype), jnp.imag(spec).astype(x.dtype)


@partial(jax.jit, static_argnames=("n_fft", "hop", "window", "center"))
def stft_dft(x: jnp.ndarray, n_fft: int, hop: int, window: str = "hann", center: bool = True):
    """Windowed-DFT STFT as one strided convolution (MXU path).

    The framing is folded into the conv's stride so no (..., n_frames, n_fft)
    intermediate is ever materialized — XLA lowers the conv as an
    implicit-GEMM on the systolic array. Same contract as ``stft``.
    """
    win = get_window(window, n_fft)
    wcos, wsin = dft_matrices(n_fft, win)  # (n_fft, n_freqs)
    n_freqs = n_fft // 2 + 1
    kernel = np.concatenate([wcos, wsin], axis=1)  # (n_fft, 2*n_freqs)
    kernel = jnp.asarray(kernel.T[:, None, :], dtype=jnp.float32)  # OIW

    lead = x.shape[:-1]
    if center:
        x = _reflect_pad_last(x, n_fft // 2)
    sig = x.reshape(-1, 1, x.shape[-1]).astype(jnp.float32)  # NCW
    out = jax.lax.conv_general_dilated(
        sig, kernel, window_strides=(hop,), padding="VALID",
        dimension_numbers=("NCW", "OIW", "NCW"),
        precision=jax.lax.Precision.HIGHEST,
        preferred_element_type=jnp.float32)  # (N, 2*n_freqs, n_frames)
    out = jnp.swapaxes(out, 1, 2)  # (N, n_frames, 2*n_freqs)
    out = out.reshape(lead + out.shape[1:])
    real, imag = out[..., :n_freqs], out[..., n_freqs:]
    return real.astype(x.dtype), imag.astype(x.dtype)
