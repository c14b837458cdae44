"""AdapterBit parity: the reference HTSAT with bottleneck adapters enabled
(MlpAdapter + SpatialAdapter) converted to flax must reproduce torch outputs.
Also checks LoRA-injected linears."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

import jax
import jax.numpy as jnp

from reference_oracle import load_reference
from pseldnets_tpu.config import Config
from pseldnets_tpu.models import heads
from pseldnets_tpu.models.adapters import AdaptConfig
from pseldnets_tpu.train.checkpoint import convert_state_dict, strip_prefixes

load_reference()
import torch  # noqa: E402

from test_ckpt_parity import TINY_KW, TINY_KW_FLAX, _randomize_bn_stats  # noqa: E402

torch.manual_seed(21)


def _cfg_with_adapt(adapt):
    return Config.wrap({
        "data": {"n_mels": 16, "sample_rate": 24000, "hoplen": 240,
                 "audio_feature": "logmelIV"},
        "model": {"decoder": None, "num_decoder_layers": 1},
        "adapt": adapt,
    })


def _run_htsat_adapter_parity(adapt, rng):
    from models import accdoa as ref_accdoa

    cfg = _cfg_with_adapt(adapt)
    K = 3
    tm = ref_accdoa.HTSAT(cfg, K, in_channels=7, pretrained_path=None, **TINY_KW)
    tm.tgt_output_frames = 25
    tm.eval()
    _randomize_bn_stats(tm)
    # make adapters non-trivial: zero-init fc2 would hide wiring bugs
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "adapter" in name and "fc2.weight" in name:
                p.copy_(torch.randn(p.shape) * 0.1)

    fm = heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                     num_tracks=1, tgt_output_frames=25,
                     adapt=AdaptConfig(adapt), encoder_kwargs=TINY_KW_FLAX)
    x = rng.standard_normal((2, 7, 250, 16)).astype(np.float32)
    variables = fm.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                        train=False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables, report = convert_state_dict(strip_prefixes(sd), variables,
                                           strict=True)
    assert not report["unused"], report["unused"][:8]

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x.copy()))["accdoa"].numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False)["accdoa"])
    np.testing.assert_allclose(got, ref_out, atol=3e-4)


def test_adapter_htsat_parity(rng):
    _run_htsat_adapter_parity(
        {"method": "adapter",
         "adapt_kwargs": {"position": ["MlpAdapter", "SpatialAdapter"],
                          "type": "adapter", "mlp_ratio": 0.5,
                          "adapter_scalar": 0.1, "act_layer": "gelu"}}, rng)


def test_adapter_htsat_new_adapter_parity(rng):
    """adapt_kwargs.new_adapter: the reference's optional SECOND parallel
    Mlp bottleneck (model_utilities.py:153-170, ``adapter_ds``) — unused by
    shipped configs but part of the config surface."""
    _run_htsat_adapter_parity(
        {"method": "adapter",
         "adapt_kwargs": {"position": ["MlpAdapter", "SpatialAdapter"],
                          "type": "adapter", "mlp_ratio": 0.5,
                          "adapter_scalar": 0.1, "act_layer": "gelu",
                          "new_adapter": {"mlp_ratio": 0.25,
                                          "adapter_scalar": 1,
                                          "act_layer": "gelu"}}}, rng)


def test_lora_htsat_parity(rng):
    from models import accdoa as ref_accdoa

    adapt = {"method": "lora",
             "linear_kwargs": {"r": 4, "lora_alpha": 2, "lora_dropout": 0.0,
                               "fan_in_fan_out": False, "merge_weights": False},
             "conv_kwargs": {"r": 4, "lora_alpha": 2}}
    cfg = _cfg_with_adapt(adapt)
    K = 3
    tm = ref_accdoa.HTSAT(cfg, K, in_channels=7, pretrained_path=None, **TINY_KW)
    tm.tgt_output_frames = 25
    tm.eval()
    _randomize_bn_stats(tm)
    with torch.no_grad():
        for name, p in tm.named_parameters():
            if "lora_B" in name:  # zero-init would hide wiring bugs
                p.copy_(torch.randn(p.shape) * 0.05)

    fm = heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                     num_tracks=1, tgt_output_frames=25,
                     adapt=AdaptConfig(adapt), encoder_kwargs=TINY_KW_FLAX)
    x = rng.standard_normal((2, 7, 250, 16)).astype(np.float32)
    variables = fm.init({"params": jax.random.PRNGKey(0)}, jnp.asarray(x),
                        train=False)
    sd = {k: v.detach().numpy() for k, v in tm.state_dict().items()}
    variables, report = convert_state_dict(strip_prefixes(sd), variables,
                                           strict=True)

    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x.copy()))["accdoa"].numpy()
    got = np.asarray(fm.apply(variables, jnp.asarray(x), train=False)["accdoa"])
    np.testing.assert_allclose(got, ref_out, atol=3e-4)
