"""Flax model zoo: checkpoint-compatible TPU reimplementations of the reference
backbones (HTS-AT Swin, PaSST, PANNs CNN8/12, Conformer decoder) and SELD heads
(ACCDOA, multi-ACCDOA, EINV2 dual-branch with cross-stitch), plus AdapterBit/LoRA
parameter-efficient tuning.
"""

from .factory import build_model

__all__ = ["build_model"]
