"""Pallas TPU kernels for the hot ops."""

from .frontend import fused_logmel_iv

__all__ = ["fused_logmel_iv"]
