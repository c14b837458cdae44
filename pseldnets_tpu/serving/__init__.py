"""Serving-side fused inference paths (Pallas kernels over flax param trees)."""

from .htsat import htsat_fused_forward  # noqa: F401
