"""Model factory: (method, backbone) -> flax module.

Mirrors the reference's dynamic lookup
``vars(ModelMoodule[cfg.model.method])[cfg.model.backbone]``
(src/models/model_module.py:13-34) including the audio_feature -> in_channels
mapping (:24-31).
"""

from typing import Any

import jax.numpy as jnp

from . import einv2_heads, heads
from .adapters import AdaptConfig

# kwargs consumed by checkpoint loading, not by the module itself
_CKPT_KEYS = ("audioset_pretrain", "pretrained_path")
# PaSST encoder kwargs the flax module doesn't take verbatim
_PASST_DROP = ("representation_size", "norm_layer", "act_layer", "attn_drop_rate")
_HTSAT_DROP = ()


def in_channels_for(audio_feature: str) -> int:
    if audio_feature in ("logmelIV", "salsa", "salsalite"):
        return 7
    if audio_feature in ("logmelgcc",):
        return 10
    if audio_feature in ("logmel",):
        return 1
    raise ValueError(f"unknown audio_feature '{audio_feature}'")


def build_model(cfg, num_classes: int, dtype: Any = jnp.float32):
    """Returns (module, meta) where meta carries ckpt-loading info."""
    method = cfg["model"]["method"]
    backbone = cfg["model"]["backbone"]
    data = cfg["data"]
    in_channels = in_channels_for(data["audio_feature"])
    mel_bins = int(data["n_mels"])
    pred_res = int(data["sample_rate"] / data["hoplen"] * 0.1)
    kwargs = dict(cfg["model"].get("kwargs", {}) or {})
    pretrained_path = kwargs.pop("pretrained_path", None)
    audioset_pretrain = kwargs.pop("audioset_pretrain", True)
    # 10s-clip contract by default (reference accdoa.py:119); overridable for
    # small-footprint configs via model.kwargs.tgt_output_frames
    tgt_output_frames = int(kwargs.pop("tgt_output_frames", 100))
    adapt = AdaptConfig(cfg.get("adapt"))

    num_tracks = 3 if method == "multi_accdoa" else 1

    def htsat_encoder_kwargs():
        kw = dict(kwargs)
        for k in _HTSAT_DROP:
            kw.pop(k, None)
        kw["depths"] = tuple(kw.get("depths", (2, 2, 6, 2)))
        kw["num_heads"] = tuple(kw.get("num_heads", (4, 8, 16, 32)))
        kw["patch_stride"] = tuple(kw.get("patch_stride", (4, 4)))
        kw["mlp_ratio"] = float(kw.get("mlp_ratio", 4.0))
        return tuple(sorted(kw.items()))

    def passt_encoder_kwargs():
        kw = dict(kwargs)
        for k in _PASST_DROP + _CKPT_KEYS:
            kw.pop(k, None)
        kw["img_size"] = tuple(kw.get("img_size", (64, 1001)))
        kw["mlp_ratio"] = float(kw.get("mlp_ratio", 4.0))
        return tuple(sorted(kw.items()))

    if method in ("accdoa", "multi_accdoa"):
        if backbone in ("CRNN", "ConvConformer"):
            cls = heads.ConvConformer if backbone == "ConvConformer" else heads.CRNN
            model = cls(num_classes=num_classes, in_channels=in_channels,
                        encoder=kwargs.get("encoder", "CNN8"),
                        num_features=tuple(kwargs.get("num_features", (32, 64, 128, 256))),
                        decoder=cfg["model"].get("decoder"),
                        num_decoder_layers=int(cfg["model"].get("num_decoder_layers", 2)),
                        mel_bins=mel_bins, pred_res=pred_res,
                        num_tracks=num_tracks, dtype=dtype)
        elif backbone == "HTSAT":
            model = heads.HTSAT(num_classes=num_classes, in_channels=in_channels,
                                mel_bins=mel_bins, pred_res=pred_res,
                                num_tracks=num_tracks, adapt=adapt,
                                tgt_output_frames=tgt_output_frames,
                                encoder_kwargs=htsat_encoder_kwargs(), dtype=dtype)
        elif backbone == "PASST":
            model = heads.PASST(num_classes=num_classes, in_channels=in_channels,
                                mel_bins=mel_bins, num_tracks=num_tracks,
                                encoder_kwargs=passt_encoder_kwargs(), dtype=dtype)
        else:
            raise NotImplementedError(f"backbone '{backbone}' for method '{method}'")
    elif method == "einv2":
        if backbone in ("CRNN", "ConvConformer"):
            model = einv2_heads.CRNN(
                num_classes=num_classes, in_channels=in_channels,
                encoder=kwargs.get("encoder", "CNN8"),
                num_features=tuple(kwargs.get("num_features", (32, 64, 128, 256))),
                decoder="conformer" if backbone == "ConvConformer" else cfg["model"].get("decoder"),
                num_decoder_layers=int(cfg["model"].get("num_decoder_layers", 2)),
                mel_bins=mel_bins, pred_res=pred_res, dtype=dtype)
        elif backbone == "HTSAT":
            model = einv2_heads.HTSAT(num_classes=num_classes, in_channels=in_channels,
                                      mel_bins=mel_bins, pred_res=pred_res, adapt=adapt,
                                      tgt_output_frames=tgt_output_frames,
                                      encoder_kwargs=htsat_encoder_kwargs(), dtype=dtype)
        elif backbone == "HTSAT_SEDDOA":
            model = einv2_heads.HTSAT_SEDDOA(num_classes=num_classes,
                                             in_channels=in_channels,
                                             mel_bins=mel_bins, pred_res=pred_res,
                                             adapt=adapt,
                                             tgt_output_frames=tgt_output_frames,
                                             encoder_kwargs=htsat_encoder_kwargs(),
                                             dtype=dtype)
        elif backbone == "PASST":
            model = einv2_heads.PASST(num_classes=num_classes, in_channels=in_channels,
                                      mel_bins=mel_bins,
                                      ps_gap=int(cfg["model"].get("ps_gap", 2)),
                                      decoder=cfg["model"].get("decoder"),
                                      num_decoder_layers=int(cfg["model"].get("num_decoder_layers", 2)),
                                      encoder_kwargs=passt_encoder_kwargs(), dtype=dtype)
        else:
            raise NotImplementedError(f"backbone '{backbone}' for method 'einv2'")
    else:
        raise NotImplementedError(f"method '{method}'")

    meta = {"pretrained_path": pretrained_path,
            "audioset_pretrain": audioset_pretrain,
            "method": method, "backbone": backbone,
            "in_channels": in_channels}
    return model, meta
