"""On-device audio feature extractors.

Behavioral parity targets (reference src/utils/feature.py):
* LogmelIVExtractor  — STFT → power-mel (HTK scale, slaney norm, fmin=20,
  fmax=fs/2) → 10·log10 dB (amin=1e-10, top_db=None) concatenated with the
  L2-normalized FOA intensity vector projected onto the mel basis; output
  (B, 4+3, T, n_mels)                                    (feature.py:20-56,93-117)
* LogmelExtractor    — same minus IV, any channel count  (feature.py:59-91)
* gcc_phat           — per-pair PHAT-weighted cross-correlation, center lags
                       cropped to n_mels                  (feature.py:164-175)
* salsa_lite         — normalized inter-channel phase + per-channel log power
                       spectra within [lower_bin, cutoff_bin)  (feature.py:177-192)

All are pure jittable functions of (B, C, samples) waveforms; filterbanks and DFT
bases are baked in as constants at construction (static shapes throughout).
"""

from functools import partial
from typing import Optional

import jax
import jax.numpy as jnp
import numpy as np

from .mel import mel_filterbank
from .stft import stft_dft, stft

EPS_F32 = float(np.finfo(np.float32).eps)
AMIN_DB = 1e-10


def power_to_db(power: jnp.ndarray, top_db: Optional[float] = None) -> jnp.ndarray:
    """10*log10(max(x, 1e-10)); optional top_db floor relative to the array max."""
    db = 10.0 * jnp.log10(jnp.maximum(power, AMIN_DB))
    if top_db is not None:
        db = jnp.maximum(db, jnp.max(db) - top_db)
    return db


def _mel_project(x: jnp.ndarray, mel_fb: jnp.ndarray) -> jnp.ndarray:
    """(..., F) @ (F, M) mel projection.

    Kept as a plain einsum: collapsing to a flat 2D dot runs at the same speed
    on v5e but blows the XLA compile up to ~4 minutes inside the composite
    frontend graph. The TPU production path is the fused Pallas kernel anyway
    (LogmelIVExtractor backend='pallas'); this is the CPU/fallback path.
    """
    return jnp.einsum("...tf,fm->...tm", x, mel_fb,
                      precision=jax.lax.Precision.HIGHEST,
                      preferred_element_type=jnp.float32)


def intensity_vector(real: jnp.ndarray, imag: jnp.ndarray, mel_fb: jnp.ndarray) -> jnp.ndarray:
    """FOA intensity vector, mel-projected.

    real/imag: (B, 4, T, F) with channel order (W, X, Y, Z); mel_fb: (F, n_mels).
    Returns (B, 3, T, n_mels). Matches reference intensityvector (feature.py:93-117):
    IV_d = Re(conj(W)·P_d), L2-normalized across (x,y,z) per TF bin with +eps,
    then projected through the mel filterbank.
    """
    w_re, w_im = real[:, 0], imag[:, 0]
    iv = real[:, 1:4] * w_re[:, None] + imag[:, 1:4] * w_im[:, None]  # (B,3,T,F)
    normal = jnp.sqrt(jnp.sum(iv * iv, axis=1, keepdims=True)) + EPS_F32
    return _mel_project(iv / normal, mel_fb).astype(real.dtype)


class LogmelIVExtractor:
    """logmel(4ch) ⊕ intensity-vector(3ch) frontend for FOA input.

    backend='pallas' routes through the fused VMEM-resident kernel
    (ops.pallas.frontend), ~2x the XLA pipeline on v5e; 'xla' keeps the
    conv-DFT + matmul pipeline; 'auto' picks pallas on TPU.
    """

    in_channels = 7

    def __init__(self, cfg, use_fft: bool = False, backend: str = "auto"):
        data = cfg["data"]
        self.n_fft = int(data["nfft"])
        self.hop = int(data["hoplen"])
        self.window = str(data["window"])
        self.sr = int(data["sample_rate"])
        self.n_mels = int(data["n_mels"])
        self.mel_fb = jnp.asarray(
            mel_filterbank(self.sr, self.n_fft, self.n_mels, fmin=20.0,
                           fmax=self.sr / 2.0, scale="htk", norm="slaney"),
            dtype=jnp.float32,
        )
        self._stft = stft if use_fft else stft_dft
        if backend == "auto":
            # "axon": this dev harness's TPU relay platform name — its
            # lowering canonicalizes to "tpu", so pallas kernels apply
            backend = ("pallas" if jax.default_backend() in ("tpu", "axon")
                       else "xla")
        self.backend = backend
        # split-bf16 3-dot DFT (3x fewer MXU passes than f32 HIGHEST's 6;
        # max observed error 8e-4 dB logmel / 7e-5 IV vs f32). Set
        # data.frontend_dft: f32 to force the exact path, or bf16x2 for the
        # +7.7% opt-in (bf16 signal x f32 weights; ~1e-1 dB valley-bin
        # error, frontend-only logit band 3.3e-2 — docs/PERF.md round 4)
        dft = str(data.get("frontend_dft", "split3"))
        self.split3 = dft != "f32"
        self.split_mode = "bf16x2" if dft == "bf16x2" else None

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, 4, samples) -> (B, 7, n_frames, n_mels)."""
        if x.ndim != 3:
            raise ValueError(f"expected (batch, channels, samples), got {x.shape}")
        if self.backend == "pallas" and x.shape[1] == 4:
            from .pallas.frontend import fused_logmel_iv

            return fused_logmel_iv(x, n_fft=self.n_fft, hop=self.hop,
                                   window=self.window, n_mels=self.n_mels,
                                   sample_rate=self.sr, split3=self.split3,
                                   split_mode=self.split_mode)
        real, imag = self._stft(x, self.n_fft, self.hop, self.window)  # (B,4,T,F)
        power = real * real + imag * imag
        logmel = power_to_db(_mel_project(power, self.mel_fb))
        iv = intensity_vector(real, imag, self.mel_fb)
        return jnp.concatenate([logmel, iv], axis=1)


class LogmelExtractor:
    """logmel frontend for arbitrary channel counts (mono / mic)."""

    def __init__(self, cfg, use_fft: bool = False):
        data = cfg["data"]
        self.n_fft = int(data["nfft"])
        self.hop = int(data["hoplen"])
        self.window = str(data["window"])
        sr = int(data["sample_rate"])
        self.mel_fb = jnp.asarray(
            mel_filterbank(sr, self.n_fft, int(data["n_mels"]), fmin=20.0,
                           fmax=sr / 2.0, scale="htk", norm="slaney"),
            dtype=jnp.float32,
        )
        self._stft = stft if use_fft else stft_dft

    def __call__(self, x: jnp.ndarray) -> jnp.ndarray:
        """(B, C, samples) -> (B, C, n_frames, n_mels)."""
        if x.ndim != 3:
            raise ValueError(f"expected (batch, channels, samples), got {x.shape}")
        real, imag = self._stft(x, self.n_fft, self.hop, self.window)
        power = real * real + imag * imag
        return power_to_db(_mel_project(power, self.mel_fb))


@partial(jax.jit, static_argnames=("n_lags",))
def gcc_phat(real: jnp.ndarray, imag: jnp.ndarray, n_lags: int) -> jnp.ndarray:
    """GCC-PHAT for all C-choose-2 mic pairs.

    real/imag: (B, C, T, F) onesided spectra. Returns (B, n_pairs, T, n_lags)
    with the center lags concatenated as [last n_lags/2 | first n_lags/2]
    (reference feature.py:164-175). Pair order (m, n) for m < n.
    """
    C = real.shape[1]
    spec = real + 1j * imag
    outs = []
    for m in range(C):
        for n in range(m + 1, C):
            r = jnp.conj(spec[:, m]) * spec[:, n]
            # exp(1j*angle(R)) like the reference (feature.py:171): a ZERO
            # cross-spectrum bin maps to 1 (angle(0)=0), not 0 — r/|r|
            # normalization diverges on digital silence
            phase = jnp.exp(1j * jnp.angle(r))
            cc = jnp.fft.irfft(phase, axis=-1)  # (B, T, n_fft)
            cc = jnp.concatenate([cc[..., -n_lags // 2:], cc[..., : n_lags // 2]], axis=-1)
            outs.append(cc)
    return jnp.stack(outs, axis=1).astype(real.dtype)


def salsa_lite_bins(sr: int, n_fft: int, fmin_doa: float, fmax_doa: float, fmax_spectra: float):
    lower_bin = max(int(np.floor(fmin_doa * n_fft / float(sr))), 1)
    upper_bin = int(np.floor(min(fmax_doa, sr // 2) * n_fft / float(sr)))
    cutoff_bin = int(np.floor(fmax_spectra * n_fft / float(sr)))
    assert upper_bin <= cutoff_bin
    return lower_bin, upper_bin, cutoff_bin


def salsa_lite(real: jnp.ndarray, imag: jnp.ndarray, sr: int, n_fft: int,
               fmin_doa: float, fmax_doa: float, fmax_spectra: float) -> jnp.ndarray:
    """SALSA-lite: [per-channel log power | normalized inter-channel phase].

    real/imag: (B, C, T, F). Returns (B, C + C-1, T, cutoff-lower) matching the
    reference's offline variant (feature.py:177-192) with time-major layout.
    """
    c_sound = 343.0
    lower_bin, upper_bin, cutoff_bin = salsa_lite_bins(sr, n_fft, fmin_doa, fmax_doa, fmax_spectra)
    delta = 2.0 * np.pi * sr / (n_fft * c_sound)
    freq_idx = np.arange(n_fft // 2 + 1, dtype=np.float32)
    freq_idx[0] = 1.0

    spec = real + 1j * imag
    phase = jnp.angle(spec[:, 1:] * jnp.conj(spec[:, :1]))  # (B, C-1, T, F)
    phase = phase / (delta * jnp.asarray(freq_idx)[None, None, None, :])
    phase = phase[..., lower_bin:cutoff_bin]
    # zero out bins above the DOA aliasing limit. The reference zeroes
    # SLICED index upper_bin onward (feature.py:182-183, after the
    # lower_bin:cutoff_bin slice) — i.e. absolute bins >= lower_bin +
    # upper_bin, not absolute upper_bin.
    keep = (np.arange(cutoff_bin - lower_bin) < upper_bin).astype(np.float32)
    phase = phase * jnp.asarray(keep)[None, None, None, :]

    power = real * real + imag * imag
    logspec = 10.0 * jnp.log10(jnp.maximum(power, AMIN_DB))
    logspec = logspec[..., lower_bin:cutoff_bin]
    return jnp.concatenate([logspec, phase.astype(real.dtype)], axis=1)


def make_extractor(cfg, use_fft: bool = False):
    """Factory mirroring reference get_afextractor (src/utils/config.py:24-32):
    logmelIV / logmel run on device; anything else (salsalite, logmelgcc) is
    consumed pre-extracted from the offline pipeline → None here."""
    feat = cfg["data"]["audio_feature"]
    backend = cfg["data"].get("frontend", "auto")
    if feat == "logmelIV":
        return LogmelIVExtractor(cfg, use_fft=use_fft, backend=backend)
    if feat == "logmel":
        return LogmelExtractor(cfg, use_fft=use_fft)
    return None
