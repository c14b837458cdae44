"""Checkpoint-converter parity tests: random-initialized REFERENCE torch models
(imported from /root/reference, never copied) are exported as state dicts,
converted to flax variables, and both sides are compared on the same input.

This validates the layout transforms, key translation, and BN/scalar fusion the
real released checkpoints will go through (SURVEY §5.4)."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import load_reference
from pseldnets_tpu.config import Config
from pseldnets_tpu.models import heads, einv2_heads
from pseldnets_tpu.train.checkpoint import (
    load_seld_inference_ckpt, strip_prefixes, convert_state_dict)

load_reference()
import torch  # noqa: E402

torch.manual_seed(0)

TINY_KW = dict(spec_size=64, patch_size=4, patch_stride=(4, 4), embed_dim=8,
               depths=[1, 1], num_heads=[2, 4], window_size=4, mlp_ratio=4,
               drop_path_rate=0.0)
TINY_KW_FLAX = tuple(sorted({**TINY_KW, "depths": (1, 1), "num_heads": (2, 4),
                             "patch_stride": (4, 4), "mlp_ratio": 4.0}.items()))


def _tiny_cfg(decoder=None, num_layers=1):
    return Config.wrap({
        "data": {"n_mels": 16, "sample_rate": 24000, "hoplen": 240,
                 "audio_feature": "logmelIV"},
        "model": {"decoder": decoder, "num_decoder_layers": num_layers},
        "adapt": {"method": "none"},
    })


def _randomize_bn_stats(model):
    g = torch.Generator().manual_seed(7)
    for m in model.modules():
        if isinstance(m, (torch.nn.BatchNorm2d, torch.nn.BatchNorm1d)):
            m.running_mean.copy_(torch.randn(m.running_mean.shape, generator=g) * 0.5)
            m.running_var.copy_(torch.rand(m.running_var.shape, generator=g) + 0.5)
            m.weight.data.copy_(torch.randn(m.weight.shape, generator=g) * 0.2 + 1)
            m.bias.data.copy_(torch.randn(m.bias.shape, generator=g) * 0.2)


def _convert_and_run(torch_model, flax_model, x_np, train_flag=False):
    torch_model.eval()
    _randomize_bn_stats(torch_model)
    with torch.no_grad():
        # NOTE: the reference forward mutates its input in place (the scalar-BN
        # loop writes through a transposed view) — hand torch a private copy.
        ref_out = torch_model(torch.from_numpy(x_np.copy()))
    sd = {k: v.numpy() for k, v in torch_model.state_dict().items()}

    x = jnp.asarray(x_np)
    variables = flax_model.init(
        {"params": jax.random.PRNGKey(0)}, x, train=False)
    variables, report = load_seld_inference_ckpt(variables, _SDPath(sd), strict=True)
    assert not report["unused"], f"unused torch keys: {report['unused'][:10]}"
    out = flax_model.apply(variables, x, train=False)
    return ref_out, out


class _SDPath(dict):
    """Duck-type for load_torch_state_dict: already a numpy state dict."""


# monkeypatch load path to accept in-memory dicts
import pseldnets_tpu.train.checkpoint as ckpt_mod

_orig_load = ckpt_mod.load_torch_state_dict


def _load(path):
    if isinstance(path, dict):
        return strip_prefixes(path)
    return _orig_load(path)


ckpt_mod.load_torch_state_dict = _load


def test_htsat_accdoa_parity(rng):
    from models import accdoa as ref_accdoa

    cfg = _tiny_cfg()
    K = 5
    tm = ref_accdoa.HTSAT(cfg, K, in_channels=7, pretrained_path=None, **TINY_KW)
    tm.tgt_output_frames = 25
    fm = heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                     num_tracks=1, tgt_output_frames=25,
                     encoder_kwargs=TINY_KW_FLAX)
    x = rng.standard_normal((2, 7, 250, 16)).astype(np.float32)
    ref_out, out = _convert_and_run(tm, fm, x)
    np.testing.assert_allclose(np.asarray(out["accdoa"]),
                               ref_out["accdoa"].numpy(), atol=2e-4)


def test_multi_accdoa_htsat_parity(rng):
    from models import multi_accdoa as ref_maccdoa

    cfg = _tiny_cfg()
    K = 3
    tm = ref_maccdoa.HTSAT(cfg, K, in_channels=7, pretrained_path=None, **TINY_KW)
    tm.tgt_output_frames = 25
    fm = heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                     num_tracks=3, tgt_output_frames=25,
                     encoder_kwargs=TINY_KW_FLAX)
    x = rng.standard_normal((2, 7, 250, 16)).astype(np.float32)
    ref_out, out = _convert_and_run(tm, fm, x)
    np.testing.assert_allclose(np.asarray(out["multi_accdoa"]),
                               ref_out["multi_accdoa"].numpy(), atol=2e-4)


def test_crnn_gru_parity(rng):
    from models import accdoa as ref_accdoa

    cfg = _tiny_cfg(decoder="gru", num_layers=2)
    K = 4
    tm = ref_accdoa.CRNN(cfg, K, in_channels=7, encoder="CNN8",
                         num_features=[8, 8, 16, 16])
    fm = heads.CRNN(num_classes=K, in_channels=7, encoder="CNN8",
                    num_features=(8, 8, 16, 16), decoder="gru",
                    num_decoder_layers=2, mel_bins=16, pred_res=10)
    x = rng.standard_normal((2, 7, 240, 16)).astype(np.float32)
    ref_out, out = _convert_and_run(tm, fm, x)
    np.testing.assert_allclose(np.asarray(out["accdoa"]),
                               ref_out["accdoa"].numpy(), atol=2e-4)


def test_crnn_conformer_parity(rng):
    from models import accdoa as ref_accdoa

    cfg = _tiny_cfg(decoder="conformer", num_layers=1)
    K = 4
    tm = ref_accdoa.ConvConformer(cfg, K, in_channels=7, encoder="CNN8",
                                  num_features=[8, 8, 16, 16])
    fm = heads.ConvConformer(num_classes=K, in_channels=7, encoder="CNN8",
                             num_features=(8, 8, 16, 16),
                             num_decoder_layers=2,  # reference hardcodes 2
                             mel_bins=16, pred_res=10)
    x = rng.standard_normal((2, 7, 240, 16)).astype(np.float32)
    ref_out, out = _convert_and_run(tm, fm, x)
    np.testing.assert_allclose(np.asarray(out["accdoa"]),
                               ref_out["accdoa"].numpy(), atol=5e-4)


PASST_KW = dict(u_patchout=0, s_patchout_t=0, s_patchout_f=0, img_size=(16, 101),
                patch_size=16, stride=10, embed_dim=16, depth=2, num_heads=2,
                mlp_ratio=4.0, qkv_bias=True, distilled=True, drop_rate=0.0,
                drop_path_rate=0.0)


def test_passt_parity(rng):
    from models import accdoa as ref_accdoa

    cfg = _tiny_cfg()
    K = 4
    tm = ref_accdoa.PASST(cfg, K, in_channels=7, pretrained_path=None, **PASST_KW)
    fm = heads.PASST(num_classes=K, in_channels=7, mel_bins=16, num_tracks=1,
                     encoder_kwargs=tuple(sorted(
                         {**PASST_KW, "img_size": (16, 101)}.items())))
    x = rng.standard_normal((2, 7, 101, 16)).astype(np.float32)
    ref_out, out = _convert_and_run(tm, fm, x)
    np.testing.assert_allclose(np.asarray(out["accdoa"]),
                               ref_out["accdoa"].numpy(), atol=2e-4)


def test_einv2_htsat_parity(rng):
    from models import einv2 as ref_einv2

    cfg = _tiny_cfg()
    K = 3
    tm = ref_einv2.HTSAT(cfg, K, in_channels=7, pretrained_path=None, **TINY_KW)
    tm.tgt_output_frames = 25
    fm = einv2_heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                           tgt_output_frames=25, encoder_kwargs=TINY_KW_FLAX)
    x = rng.standard_normal((2, 7, 250, 16)).astype(np.float32)
    ref_out, out = _convert_and_run(tm, fm, x)
    np.testing.assert_allclose(np.asarray(out["sed"]), ref_out["sed"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["doa"]), ref_out["doa"].numpy(), atol=2e-4)


def test_einv2_seddoa_parity(rng):
    from models import einv2 as ref_einv2

    cfg = _tiny_cfg()
    K = 3
    tm = ref_einv2.HTSAT_SEDDOA(cfg, K, in_channels=7, pretrained_path=None,
                                **TINY_KW)
    tm.tgt_output_frames = 25
    fm = einv2_heads.HTSAT_SEDDOA(num_classes=K, in_channels=7, mel_bins=16,
                                  pred_res=10, tgt_output_frames=25,
                                  encoder_kwargs=TINY_KW_FLAX)
    x = rng.standard_normal((2, 7, 250, 16)).astype(np.float32)
    ref_out, out = _convert_and_run(tm, fm, x)
    np.testing.assert_allclose(np.asarray(out["sed"]), ref_out["sed"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["doa"]), ref_out["doa"].numpy(), atol=2e-4)


def test_einv2_passt_parity(rng):
    from models import einv2 as ref_einv2
    from pseldnets_tpu.config import Config

    cfg = Config.wrap({
        "data": {"n_mels": 16, "sample_rate": 24000, "hoplen": 240,
                 "audio_feature": "logmelIV"},
        "model": {"decoder": None, "num_decoder_layers": 1, "ps_gap": 2},
        "adapt": {"method": "none"},
    })
    K = 3
    tm = ref_einv2.PASST(cfg, K, in_channels=7, pretrained_path=None, **PASST_KW)
    fm = einv2_heads.PASST(num_classes=K, in_channels=7, mel_bins=16,
                           ps_gap=2, decoder=None,
                           encoder_kwargs=tuple(sorted(
                               {**PASST_KW, "img_size": (16, 101)}.items())))
    x = rng.standard_normal((2, 7, 101, 16)).astype(np.float32)
    ref_out, out = _convert_and_run(tm, fm, x)
    np.testing.assert_allclose(np.asarray(out["sed"]), ref_out["sed"].numpy(), atol=2e-4)
    np.testing.assert_allclose(np.asarray(out["doa"]), ref_out["doa"].numpy(), atol=2e-4)


def test_transformer_decoder_parity(rng):
    """decoder: transformer — torch nn.TransformerEncoder (the exact module the
    reference builds, model_utilities.py:255-259) converted via the packed
    in_proj qkv split must match the flax Decoder bit-for-bit-ish."""
    import torch.nn as tnn

    from pseldnets_tpu.models.common import Decoder

    torch.manual_seed(3)
    tdec = tnn.TransformerEncoder(
        tnn.TransformerEncoderLayer(d_model=32, nhead=8, batch_first=True),
        num_layers=2)
    tdec.eval()

    model = Decoder(decoder="transformer", num_feats=32, num_layers=2)
    x = rng.standard_normal((2, 10, 32)).astype(np.float32)
    variables = model.init(jax.random.PRNGKey(0), jnp.asarray(x))
    sd = {f"decoder.{k}": v.numpy() for k, v in tdec.state_dict().items()}
    variables, report = ckpt_mod.convert_state_dict(sd, variables, strict=True)
    assert not report["unused"], report["unused"]

    with torch.no_grad():
        ref = tdec(torch.from_numpy(x)).numpy()
    out = np.asarray(model.apply(variables, jnp.asarray(x), deterministic=True))
    assert np.abs(out - ref).max() < 2e-5, np.abs(out - ref).max()
