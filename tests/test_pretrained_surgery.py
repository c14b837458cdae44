"""AudioSet checkpoint-surgery parity: a synthetic 'AudioSet-pretrained'
state dict (1-channel patch embed + bn0, 'sed_model.' prefixes) is loaded by
BOTH the reference torch load_ckpts (channel replication /C, bn0->scalar
copies, head skips) and our load_pretrained; forwards must agree."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from reference_oracle import load_reference
from pseldnets_tpu.models import heads
from pseldnets_tpu.train.checkpoint import load_pretrained
import pseldnets_tpu.train.checkpoint as ckpt_mod

load_reference()
import torch  # noqa: E402

from test_ckpt_parity import TINY_KW, TINY_KW_FLAX, _tiny_cfg, _randomize_bn_stats  # noqa: E402


def _make_audioset_ckpt():
    """Random 1-channel tiny HTSAT encoder + bn0, with 'sed_model.' prefixes
    (the released HTSAT-AudioSet ckpt layout, reference accdoa.py:175-191)."""
    from models.components.htsat import HTSAT_Swin_Transformer

    torch.manual_seed(11)
    enc = HTSAT_Swin_Transformer(in_chans=1, mel_bins=16, **TINY_KW)
    bn0 = torch.nn.BatchNorm2d(16)
    g = torch.Generator().manual_seed(3)
    bn0.running_mean.copy_(torch.randn(16, generator=g) * 0.3)
    bn0.running_var.copy_(torch.rand(16, generator=g) + 0.5)
    bn0.weight.data.copy_(torch.randn(16, generator=g) * 0.1 + 1)
    bn0.bias.data.copy_(torch.randn(16, generator=g) * 0.1)
    sd = {f"sed_model.{k}": v.clone() for k, v in enc.state_dict().items()}
    for k, v in bn0.state_dict().items():
        sd[f"sed_model.bn0.{k}"] = v.clone()
    return sd


def test_audioset_surgery_parity(rng, monkeypatch, tmp_path):
    from models import accdoa as ref_accdoa

    sd = _make_audioset_ckpt()

    # reference load path (monkeypatch torch.load inside the reference module)
    monkeypatch.setattr(torch, "load", lambda *a, **k: {"state_dict": sd})
    cfg = _tiny_cfg()
    tm = ref_accdoa.HTSAT(cfg, 5, in_channels=7,
                          pretrained_path="fake.ckpt", audioset_pretrain=True,
                          **TINY_KW)
    tm.tgt_output_frames = 25
    tm.eval()

    # our load path
    fm = heads.HTSAT(num_classes=5, in_channels=7, mel_bins=16, pred_res=10,
                     num_tracks=1, tgt_output_frames=25,
                     encoder_kwargs=TINY_KW_FLAX)
    x = rng.standard_normal((2, 7, 250, 16)).astype(np.float32)
    variables = fm.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                        train=False)
    np_sd = {k: v.detach().numpy() for k, v in sd.items()}
    monkeypatch.setattr(ckpt_mod, "load_torch_state_dict",
                        lambda p: ckpt_mod.strip_prefixes(np_sd))
    meta = {"backbone": "HTSAT", "method": "accdoa", "in_channels": 7,
            "audioset_pretrain": True}
    variables, report = load_pretrained(variables, "fake.ckpt", meta, strict=False)
    # the only missing keys must be the randomly-initialized head (skipped)
    assert all("tscam" in m or "head" in m for m in report["missing"]), \
        report["missing"][:10]

    # head weights differ (both random) -> compare ENCODER+scalar output path:
    with torch.no_grad():
        xt = torch.from_numpy(x.copy()).transpose(1, 3)
        for nch in range(7):
            xt[..., [nch]] = tm.scalar[nch](xt[..., [nch]])
        xt = xt.transpose(1, 3)
        ref_tok = tm.encoder(xt).numpy()

    def enc_path(mdl, xx):
        h = mdl.scalar(xx, use_running_average=True)
        return mdl.encoder(h, deterministic=True)

    got_tok = np.asarray(fm.apply(variables, jnp.asarray(x), method=enc_path))
    np.testing.assert_allclose(got_tok, ref_tok, atol=2e-4)


def test_cnn14_surgery_parity(rng, monkeypatch):
    """PANNs-style ckpt ('model' key, conv_block1 1->C replication, bn0)."""
    from models import accdoa as ref_accdoa
    from models.components.backbone import CNN12

    torch.manual_seed(5)
    src = CNN12(in_channels=1, num_features=[8, 8, 16, 16, 16, 16])
    bn0 = torch.nn.BatchNorm2d(64)
    g = torch.Generator().manual_seed(4)
    bn0.running_mean.copy_(torch.randn(64, generator=g) * 0.3)
    bn0.running_var.copy_(torch.rand(64, generator=g) + 0.5)
    sd = {k: v.clone() for k, v in src.state_dict().items()}
    for k, v in bn0.state_dict().items():
        sd[f"bn0.{k}"] = v.clone()

    monkeypatch.setattr(torch, "load", lambda *a, **k: {"model": sd})
    cfg = _tiny_cfg(decoder="gru", num_layers=1)
    cfg["data"]["n_mels"] = 64  # CNN12's six freq pools need 64 mel bins
    tm = ref_accdoa.CRNN(cfg, 4, in_channels=7, encoder="CNN12",
                         pretrained_path="fake.pth", audioset_pretrain=True,
                         num_features=[8, 8, 16, 16, 16, 16])
    tm.eval()

    fm = heads.CRNN(num_classes=4, in_channels=7, encoder="CNN12",
                    num_features=(8, 8, 16, 16, 16, 16), decoder="gru",
                    num_decoder_layers=1, mel_bins=64, pred_res=10)
    x = rng.standard_normal((2, 7, 240, 64)).astype(np.float32)
    variables = fm.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                        train=False)
    np_sd = {k: v.detach().numpy() for k, v in sd.items()}
    monkeypatch.setattr(ckpt_mod, "load_torch_state_dict", lambda p: np_sd)
    meta = {"backbone": "CRNN", "method": "accdoa", "in_channels": 7,
            "audioset_pretrain": True}
    variables, report = load_pretrained(variables, "fake.pth", meta, strict=False)

    with torch.no_grad():
        xt = torch.from_numpy(x.copy()).transpose(1, 3)
        for nch in range(7):
            xt[..., [nch]] = tm.scalar[nch](xt[..., [nch]])
        xt = xt.transpose(1, 3)
        ref_conv = tm.convs(xt).numpy()

    # heads.CRNN is nn.compact: drive the scalar+convs submodules directly
    # from the converted variable subtrees
    from pseldnets_tpu.models.backbone import CNN
    from pseldnets_tpu.models.common import ScalarBN

    params = variables["params"] if "params" in variables else variables
    bstats = variables.get("batch_stats", {})
    h = ScalarBN(7, 64).apply(
        {"params": params["scalar"], "batch_stats": bstats["scalar"]},
        jnp.asarray(x), use_running_average=True)
    got_conv = np.asarray(CNN(num_features=(8, 8, 16, 16, 16, 16)).apply(
        {"params": params["convs"], "batch_stats": bstats["convs"]},
        h, train=False))
    np.testing.assert_allclose(got_conv, ref_conv, atol=2e-4)
