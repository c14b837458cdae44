"""TPU-native DSP ops: STFT, mel filterbanks, FOA intensity vectors, GCC-PHAT,
SALSA-lite — the on-device feature chain the reference delegates to
torchaudio/librosa (reference src/utils/feature.py), rebuilt as jittable JAX
functions with MXU-friendly matmul formulations and a fused Pallas frontend.
"""

from .windows import get_window
from .mel import mel_filterbank
from .stft import stft, frame_signal
from .features import (
    LogmelIVExtractor,
    LogmelExtractor,
    intensity_vector,
    gcc_phat,
    salsa_lite,
    make_extractor,
)

__all__ = [
    "get_window",
    "mel_filterbank",
    "stft",
    "frame_signal",
    "LogmelIVExtractor",
    "LogmelExtractor",
    "intensity_vector",
    "gcc_phat",
    "salsa_lite",
    "make_extractor",
]
