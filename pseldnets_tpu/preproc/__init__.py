"""Offline preprocessing: segment indexing, ACCDOA/track/ADPIT label HDF5
extraction, L3DAS22 metadata conversion, offline mic (GCC/SALSA) features."""

from .preprocess import Preprocess

__all__ = ["Preprocess"]
