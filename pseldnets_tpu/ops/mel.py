"""Mel filterbank construction.

Two variants are needed for behavioral parity with the reference feature chain:

* ``scale='htk'``  + ``norm='slaney'``: torchaudio.transforms.MelScale(norm='slaney')
  — used by the on-device logmel/logmelIV extractors
  (reference src/utils/feature.py:32-34; torchaudio's MelScale defaults to the HTK
  mel scale even when slaney *norm* is requested).
* ``scale='slaney'`` + ``norm='slaney'``: librosa.filters.mel defaults — used by the
  offline MIC (GCC/SALSA) extractor (reference src/utils/feature.py:126).

Built in float64 numpy on host (static), consumed as a jnp constant.
"""

import numpy as np


def _hz_to_mel(f, scale: str):
    f = np.asarray(f, dtype=np.float64)
    if scale == "htk":
        return 2595.0 * np.log10(1.0 + f / 700.0)
    # slaney: linear below 1 kHz, logarithmic above
    f_min, f_sp = 0.0, 200.0 / 3.0
    mel = (f - f_min) / f_sp
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    with np.errstate(divide="ignore"):  # f=0 hits log(0) in the unused branch
        log_mel = min_log_mel + np.log(f / min_log_hz) / logstep
    return np.where(f >= min_log_hz, log_mel, mel)


def _mel_to_hz(m, scale: str):
    m = np.asarray(m, dtype=np.float64)
    if scale == "htk":
        return 700.0 * (10.0 ** (m / 2595.0) - 1.0)
    f_min, f_sp = 0.0, 200.0 / 3.0
    freqs = f_min + f_sp * m
    min_log_hz = 1000.0
    min_log_mel = (min_log_hz - f_min) / f_sp
    logstep = np.log(6.4) / 27.0
    return np.where(m >= min_log_mel, min_log_hz * np.exp(logstep * (m - min_log_mel)), freqs)


def mel_filterbank(
    sr: int,
    n_fft: int,
    n_mels: int,
    fmin: float = 0.0,
    fmax: float = None,
    scale: str = "htk",
    norm: str = "slaney",
) -> np.ndarray:
    """Triangular mel filterbank, shape (n_freqs, n_mels) with n_freqs = n_fft//2+1.

    Matches torchaudio.functional.melscale_fbanks (scale='htk') and the transpose of
    librosa.filters.mel (scale='slaney') for the parameters the reference uses.
    """
    if fmax is None:
        fmax = sr / 2.0
    n_freqs = n_fft // 2 + 1
    all_freqs = np.linspace(0.0, sr / 2.0, n_freqs)

    m_pts = np.linspace(_hz_to_mel(fmin, scale), _hz_to_mel(fmax, scale), n_mels + 2)
    f_pts = _mel_to_hz(m_pts, scale)

    # triangular filters via slope differences (torchaudio's formulation)
    f_diff = f_pts[1:] - f_pts[:-1]  # (n_mels+1,)
    slopes = f_pts[None, :] - all_freqs[:, None]  # (n_freqs, n_mels+2)
    down = -slopes[:, :-2] / f_diff[None, :-1]
    up = slopes[:, 2:] / f_diff[None, 1:]
    fb = np.maximum(0.0, np.minimum(down, up))  # (n_freqs, n_mels)

    if norm == "slaney":
        enorm = 2.0 / (f_pts[2 : n_mels + 2] - f_pts[:n_mels])
        fb = fb * enorm[None, :]
    elif norm is not None:
        raise ValueError(f"unknown norm '{norm}'")
    return fb
