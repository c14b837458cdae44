"""Augmentation suite.

Waveform-domain augs (Rotation, WavMix, TrackMix) run host-side in numpy —
they happen before feature extraction and involve data-dependent index
surgery on labels plus the string 'ov' bookkeeping (reference
src/augment/{rotate,wavmix,trackmix}.py). TF-domain augs (SpecAugment, Crop,
FreqShift) are pure jittable jnp functions of explicit PRNG keys and run
on-device after the fused feature frontend (reference
src/augment/{specaug,crop,freqshift}.py).

AugMix orchestration (batch triplication, clean copy 0, independent random
chains on copies 1/2) lives in train/module.py mirroring reference
src/models/components/model_module.py:83-121.
"""

from .wave_np import Rotation, TrackMix, WavMix
from .tf_device import Crop, FreqShift, SpecAugment, TrackMixDevice
from .rotate_device import RotationDevice

__all__ = ["Rotation", "WavMix", "TrackMix", "SpecAugment", "Crop", "FreqShift",
           "TrackMixDevice", "RotationDevice"]
