"""Golden tests for the DSP ops against independent oracles:

* STFT vs torch.stft (torchaudio.transforms.Spectrogram(power=None) is exactly
  torch.stft(center=True, pad_mode='reflect', onesided=True, normalized=False))
* mel filterbank vs an independently-coded numpy construction
* logmelIV / gcc / salsa vs straightforward numpy reimplementations of the
  published formulas
"""

import numpy as np
import pytest

import jax.numpy as jnp

from pseldnets_tpu.ops import (
    LogmelIVExtractor,
    gcc_phat,
    mel_filterbank,
    salsa_lite,
    stft,
)
from pseldnets_tpu.ops.stft import stft_dft
from pseldnets_tpu.ops.windows import get_window


def _torch_stft(x, n_fft, hop, window="hann"):
    import torch

    win = {
        "hann": torch.hann_window,
        "hamming": torch.hamming_window,
        "blackman": torch.blackman_window,
        "bartlett": torch.bartlett_window,
    }[window](n_fft)
    t = torch.from_numpy(x.reshape(-1, x.shape[-1]).astype(np.float64))
    spec = torch.stft(
        t, n_fft, hop_length=hop, win_length=n_fft, window=win.double(),
        center=True, pad_mode="reflect", normalized=False, onesided=True,
        return_complex=True,
    )
    out = spec.numpy().reshape(x.shape[:-1] + spec.shape[-2:])
    return out  # (..., F, T)


@pytest.mark.parametrize("impl", [stft, stft_dft])
@pytest.mark.parametrize("window", ["hann", "hamming"])
def test_stft_matches_torch(rng, impl, window):
    n_fft, hop = 256, 64
    x = rng.standard_normal((2, 3, 2000)).astype(np.float32)
    re, im = impl(jnp.asarray(x), n_fft, hop, window)
    ref = _torch_stft(x, n_fft, hop, window)  # (B, C, F, T)
    got = np.asarray(re) + 1j * np.asarray(im)  # (B, C, T, F)
    ref = np.transpose(ref, (0, 1, 3, 2))
    assert got.shape == ref.shape
    scale = np.abs(ref).max()
    np.testing.assert_allclose(got / scale, ref / scale, atol=2e-5)


def test_stft_frame_count_matches_torchaudio_defaults():
    # 10 s @ 24 kHz with nfft=1024 hop=240 must give 1001 frames (reference
    # configs/data/default.yaml + torchaudio center=True convention)
    x = jnp.zeros((1, 4, 240000), jnp.float32)
    re, _ = stft_dft(x, 1024, 240, "hann")
    assert re.shape == (1, 4, 1001, 513)


def _numpy_mel_htk_slaney(sr, n_fft, n_mels, fmin, fmax):
    """Independent oracle: torchaudio.functional.melscale_fbanks formulas."""
    def hz2mel(f):
        return 2595.0 * np.log10(1.0 + np.asarray(f, float) / 700.0)

    def mel2hz(m):
        return 700.0 * (10.0 ** (np.asarray(m, float) / 2595.0) - 1.0)

    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0, sr // 2, n_freqs)
    f_pts = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    fb = np.zeros((n_freqs, n_mels))
    for i in range(n_mels):
        lo, ctr, hi = f_pts[i], f_pts[i + 1], f_pts[i + 2]
        up = (all_freqs - lo) / (ctr - lo)
        down = (hi - all_freqs) / (hi - ctr)
        fb[:, i] = np.maximum(0, np.minimum(up, down)) * (2.0 / (hi - lo))
    return fb


def test_mel_filterbank_htk_slaney():
    got = mel_filterbank(24000, 1024, 64, fmin=20.0, fmax=12000.0, scale="htk", norm="slaney")
    ref = _numpy_mel_htk_slaney(24000, 1024, 64, 20.0, 12000.0)
    np.testing.assert_allclose(got, ref, atol=1e-10)


def test_mel_filterbank_slaney_scale_matches_librosa_formulas():
    # librosa mel_frequencies oracle: linear below 1 kHz then logstep
    sr, n_fft, n_mels = 24000, 1024, 64
    fmin, fmax = 0.0, sr / 2
    f_sp = 200.0 / 3
    min_log_hz, logstep = 1000.0, np.log(6.4) / 27.0

    def hz2mel(f):
        f = np.asarray(f, float)
        mel = f / f_sp
        above = f >= min_log_hz
        return np.where(above, min_log_hz / f_sp + np.log(np.maximum(f, 1e-30) / min_log_hz) / logstep, mel)

    def mel2hz(m):
        m = np.asarray(m, float)
        above = m >= min_log_hz / f_sp
        return np.where(above, min_log_hz * np.exp(logstep * (m - min_log_hz / f_sp)), m * f_sp)

    mel_f = mel2hz(np.linspace(hz2mel(fmin), hz2mel(fmax), n_mels + 2))
    fftfreqs = np.linspace(0, sr / 2, 1 + n_fft // 2)
    fdiff = np.diff(mel_f)
    ramps = mel_f[:, None] - fftfreqs[None, :]
    weights = np.zeros((n_mels, len(fftfreqs)))
    for i in range(n_mels):
        lower = -ramps[i] / fdiff[i]
        upper = ramps[i + 2] / fdiff[i + 1]
        weights[i] = np.maximum(0, np.minimum(lower, upper))
    weights *= (2.0 / (mel_f[2 : n_mels + 2] - mel_f[:n_mels]))[:, None]

    got = mel_filterbank(sr, n_fft, n_mels, fmin=fmin, fmax=fmax, scale="slaney", norm="slaney")
    np.testing.assert_allclose(got, weights.T, atol=1e-10)


def test_logmeliv_shapes_and_oracle(rng):
    cfg = {"data": {"sample_rate": 24000, "nfft": 1024, "n_mels": 64,
                    "hoplen": 240, "window": "hann", "audio_feature": "logmelIV"}}
    ex = LogmelIVExtractor(cfg)
    x = rng.standard_normal((2, 4, 24000)).astype(np.float32) * 0.1
    out = np.asarray(ex(jnp.asarray(x)))
    assert out.shape == (2, 7, 101, 64)

    # numpy oracle from the published formulas
    spec = _torch_stft(x, 1024, 240)  # (B, 4, F, T)
    spec = np.transpose(spec, (0, 1, 3, 2))  # (B, 4, T, F)
    fb = mel_filterbank(24000, 1024, 64, fmin=20.0, fmax=12000.0, scale="htk", norm="slaney")
    mel = np.abs(spec) ** 2 @ fb
    logmel = 10.0 * np.log10(np.maximum(mel, 1e-10))
    iv = (np.conj(spec[:, :1]) * spec[:, 1:4]).real
    normal = np.sqrt((iv ** 2).sum(axis=1, keepdims=True)) + np.finfo(np.float32).eps
    iv_mel = (iv / normal) @ fb
    ref = np.concatenate([logmel, iv_mel], axis=1)
    np.testing.assert_allclose(out, ref, atol=2e-3)


def test_gcc_phat_against_numpy(rng):
    x = rng.standard_normal((1, 4, 8000)).astype(np.float32)
    re, im = stft(jnp.asarray(x), 512, 128)
    got = np.asarray(gcc_phat(re, im, 64))
    assert got.shape == (1, 6, re.shape[2], 64)

    spec = np.asarray(re) + 1j * np.asarray(im)
    cnt = 0
    for m in range(4):
        for n in range(m + 1, 4):
            r = np.conj(spec[0, m]) * spec[0, n]
            cc = np.fft.irfft(np.exp(1j * np.angle(r)), axis=-1)
            ref = np.concatenate([cc[:, -32:], cc[:, :32]], axis=-1)
            np.testing.assert_allclose(got[0, cnt], ref, atol=1e-4)
            cnt += 1


def test_salsa_lite_layout(rng):
    sr, n_fft = 24000, 512
    x = rng.standard_normal((1, 4, 8000)).astype(np.float32)
    re, im = stft(jnp.asarray(x), n_fft, 128)
    out = np.asarray(salsa_lite(re, im, sr, n_fft, 50.0, 2000.0, 9000.0))
    lower = max(int(np.floor(50.0 * n_fft / sr)), 1)
    upper = int(np.floor(2000.0 * n_fft / sr))
    cutoff = int(np.floor(9000.0 * n_fft / sr))
    assert out.shape == (1, 7, re.shape[2], cutoff - lower)
    # phase channels above the aliasing bin must be exactly zero. The
    # reference zeroes SLICED index `upper` onward (feature.py:182-183) —
    # sliced index upper == absolute bin lower+upper.
    assert np.all(out[:, 4:, :, upper:] == 0.0)
    assert np.any(out[:, 4:, :, upper - 1] != 0.0)
    # log-power channel matches direct computation
    ref = 10 * np.log10(np.maximum(np.abs(np.asarray(re[0, 0]) + 1j * np.asarray(im[0, 0])) ** 2, 1e-10))
    np.testing.assert_allclose(out[0, 0], ref[:, lower:cutoff], atol=1e-4)
