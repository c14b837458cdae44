"""Serving-side fused inference paths (Pallas kernels over flax param trees)."""

from .crnn import crnn_fused_forward  # noqa: F401
from .crnn import crnn_fused_forward_from_wav  # noqa: F401
from .einv2 import einv2_htsat_fused_forward  # noqa: F401
from .htsat import htsat_fused_forward  # noqa: F401
from .htsat import folded_wav_features  # noqa: F401
from .htsat import htsat_fused_forward_from_wav  # noqa: F401
from .htsat import scalar_bn_affine  # noqa: F401
from .guard import max_abs_attention_logit  # noqa: F401
from .guard import resolve_nomax  # noqa: F401
from .passt import passt_fused_forward  # noqa: F401
from .passt import passt_fused_forward_from_wav  # noqa: F401
