"""Periodic window functions matching torch.{hann,hamming,blackman,bartlett}_window
(reference src/utils/feature.py:9-14 builds its STFT from these)."""

import numpy as np


def get_window(name: str, n: int) -> np.ndarray:
    """Periodic (DFT-even) windows, float64 numpy; cast at use site."""
    k = np.arange(n, dtype=np.float64)
    if name == "hann":
        return 0.5 - 0.5 * np.cos(2.0 * np.pi * k / n)
    if name == "hamming":
        # torch uses alpha=0.54, beta=0.46
        return 0.54 - 0.46 * np.cos(2.0 * np.pi * k / n)
    if name == "blackman":
        return (
            0.42
            - 0.5 * np.cos(2.0 * np.pi * k / n)
            + 0.08 * np.cos(4.0 * np.pi * k / n)
        )
    if name == "bartlett":
        return 1.0 - np.abs(2.0 * k / n - 1.0)
    raise ValueError(f"unknown window '{name}'")
