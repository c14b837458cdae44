"""Shape/contract smoke tests for the model zoo on tiny configs (CPU-fast).
Numerical parity vs torch is covered by the checkpoint-converter tests."""

import jax
import jax.numpy as jnp
import numpy as np
import pytest

from pseldnets_tpu.models import heads, einv2_heads
from pseldnets_tpu.models.factory import build_model

TINY_HTSAT = (
    ("spec_size", 64), ("patch_size", 4), ("patch_stride", (4, 4)),
    ("embed_dim", 8), ("depths", (1, 1)), ("num_heads", (2, 4)),
    ("window_size", 4), ("mlp_ratio", 2.0), ("drop_path_rate", 0.0),
)
TINY_PASST = (
    ("img_size", (16, 101)), ("patch_size", 16), ("stride", 10),
    ("embed_dim", 16), ("depth", 2), ("num_heads", 2), ("mlp_ratio", 2.0),
    ("u_patchout", 0), ("s_patchout_t", 0), ("s_patchout_f", 0),
)


def _init_and_run(model, x, train=False):
    rngs = {"params": jax.random.PRNGKey(0), "dropout": jax.random.PRNGKey(1),
            "patchout": jax.random.PRNGKey(2)}
    variables = model.init(rngs, x, train=train)
    out = model.apply(variables, x, train=train,
                      rngs={"dropout": jax.random.PRNGKey(3),
                            "patchout": jax.random.PRNGKey(4)},
                      mutable=["batch_stats"] if train else False)
    return out[0] if train else out


@pytest.mark.parametrize("num_tracks,key", [(1, "accdoa"), (3, "multi_accdoa")])
def test_htsat_head_shapes(rng, num_tracks, key):
    K = 5
    model = heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                        num_tracks=num_tracks, tgt_output_frames=25,
                        encoder_kwargs=TINY_HTSAT)
    x = jnp.asarray(rng.standard_normal((2, 7, 250, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out[key].shape == (2, 25, 3 * num_tracks * K)
    assert np.all(np.abs(np.asarray(out[key])) <= 1.0)


def test_htsat_attention_map_hook(rng):
    """Eval-time attention maps via the intermediates collection — the flax
    analogue of the reference's `not self.training` capture
    (htsat.py:145,264,370-372; discarded by its forward_features)."""
    K = 5
    model = heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                        num_tracks=1, tgt_output_frames=25,
                        encoder_kwargs=TINY_HTSAT)
    x = jnp.asarray(rng.standard_normal((2, 7, 250, 16)), jnp.float32)
    variables = model.init({"params": jax.random.PRNGKey(0)}, x, train=False)
    out, state = model.apply(variables, x, train=False,
                             mutable=["intermediates"])
    leaves = [(p, a) for p, a in
              jax.tree_util.tree_leaves_with_path(state["intermediates"])
              # round 5 added a scalar attn_logit_max sow per block for the
              # nomax guard (test_nomax_guard.py) — filter to the maps
              if "attn_logit_max" not in jax.tree_util.keystr(p)]
    # one map per Swin block (TINY_HTSAT depths (1,1) -> 2 blocks); each is
    # a post-softmax (B*nW, nh, N, N) tensor with rows summing to 1
    assert len(leaves) == 2
    for path, attn in leaves:
        assert "attn" in jax.tree_util.keystr(path)
        assert attn.ndim == 4 and attn.shape[-1] == attn.shape[-2]
        np.testing.assert_allclose(np.asarray(attn.sum(-1)), 1.0, atol=1e-5)
    # and the default (immutable) apply pays nothing / returns no state
    out2 = model.apply(variables, x, train=False)
    np.testing.assert_array_equal(np.asarray(out["accdoa"]),
                                  np.asarray(out2["accdoa"]))


def test_htsat_5s_trick(rng):
    K = 3
    model = heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                        num_tracks=1, tgt_output_frames=24,
                        encoder_kwargs=TINY_HTSAT)
    # 12 output frames = tgt/2 -> the two batch halves get concatenated
    x = jnp.asarray(rng.standard_normal((4, 7, 121, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out["accdoa"].shape == (4, 12, 3 * K)


def test_crnn_head_shapes(rng):
    K = 4
    model = heads.CRNN(num_classes=K, in_channels=7, encoder="CNN8",
                       num_features=(8, 8, 16, 16), decoder="gru",
                       num_decoder_layers=1, mel_bins=16, pred_res=10)
    x = jnp.asarray(rng.standard_normal((2, 7, 240, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out["accdoa"].shape == (2, 24, 3 * K)


def test_crnn_conformer_decoder(rng):
    K = 4
    model = heads.CRNN(num_classes=K, in_channels=7, encoder="CNN8",
                       num_features=(8, 8, 16, 16), decoder="conformer",
                       num_decoder_layers=1, mel_bins=16, pred_res=10)
    x = jnp.asarray(rng.standard_normal((2, 7, 240, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out["accdoa"].shape == (2, 24, 3 * K)


def test_passt_head_shapes(rng):
    K = 4
    model = heads.PASST(num_classes=K, in_channels=7, mel_bins=16, num_tracks=3,
                        encoder_kwargs=TINY_PASST)
    x = jnp.asarray(rng.standard_normal((2, 7, 101, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out["multi_accdoa"].shape == (2, 10, 9 * K)


def test_passt_patchout_train(rng):
    K = 4
    kwargs = dict(TINY_PASST)
    kwargs.update(s_patchout_t=2, s_patchout_f=0)
    model = heads.PASST(num_classes=K, in_channels=7, mel_bins=16, num_tracks=1,
                        encoder_kwargs=tuple(kwargs.items()))
    x = jnp.asarray(rng.standard_normal((2, 7, 101, 16)), jnp.float32)
    out = _init_and_run(model, x, train=True)
    # time patchout reduces the token-map length at train time
    assert out["accdoa"].shape == (2, 8, 3 * K)


def test_einv2_crnn_shapes(rng):
    K = 4
    model = einv2_heads.CRNN(num_classes=K, in_channels=7, encoder="CNN8",
                             num_features=(8, 8, 16, 16), decoder="gru",
                             num_decoder_layers=1, mel_bins=16, pred_res=10)
    x = jnp.asarray(rng.standard_normal((2, 7, 240, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out["sed"].shape == (2, 24, 3, K)
    assert out["doa"].shape == (2, 24, 3, 3)


def test_einv2_htsat_shapes(rng):
    K = 4
    model = einv2_heads.HTSAT(num_classes=K, in_channels=7, mel_bins=16, pred_res=10,
                              tgt_output_frames=25, encoder_kwargs=TINY_HTSAT)
    x = jnp.asarray(rng.standard_normal((2, 7, 250, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out["sed"].shape == (2, 25, 3, K)
    assert out["doa"].shape == (2, 25, 3, 3)


def test_einv2_seddoa_shapes(rng):
    K = 4
    model = einv2_heads.HTSAT_SEDDOA(num_classes=K, in_channels=7, mel_bins=16,
                                     pred_res=10, tgt_output_frames=25,
                                     encoder_kwargs=TINY_HTSAT)
    x = jnp.asarray(rng.standard_normal((2, 7, 250, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out["sed"].shape == (2, 25, 3, K)


def test_einv2_passt_shapes(rng):
    K = 4
    model = einv2_heads.PASST(num_classes=K, in_channels=7, mel_bins=16,
                              ps_gap=2, decoder=None, encoder_kwargs=TINY_PASST)
    x = jnp.asarray(rng.standard_normal((2, 7, 101, 16)), jnp.float32)
    out = _init_and_run(model, x)
    assert out["sed"].shape == (2, 10, 3, K)
    assert out["doa"].shape == (2, 10, 3, 3)


def test_factory_builds_all():
    import os
    from pseldnets_tpu.config import compose

    cfg_dir = os.path.join(os.path.dirname(__file__), "..", "configs")
    for overrides, expect in [
        (["model=htsat", "loss=multi_accdoa"], "HTSAT"),
        (["model=passt", "loss=accdoa"], "PASST"),
        (["model=default", "loss=accdoa"], "CRNN"),
        (["model=htsat", "loss=einv2_pit"], "HTSAT"),
    ]:
        cfg = compose(cfg_dir, "train", overrides)
        model, meta = build_model(cfg, num_classes=13)
        assert meta["backbone"] == expect


def test_htsat_use_checkpoint_grads_match(rng):
    """use_checkpoint (reference htsat.py:333-345) rematerializes activations;
    outputs and grads must be identical to the uncheckpointed forward."""
    from pseldnets_tpu.models.htsat import HTSATEncoder

    def build(ck):
        return HTSATEncoder(in_chans=7, mel_bins=16, spec_size=64,
                            patch_size=4, patch_stride=(4, 4), embed_dim=8,
                            depths=(1, 1), num_heads=(2, 4), window_size=4,
                            mlp_ratio=2.0, drop_path_rate=0.0,
                            use_checkpoint=ck)
    x = jnp.asarray(rng.standard_normal((2, 7, 241, 16)).astype(np.float32))
    enc0, enc1 = build(False), build(True)
    v = enc0.init(jax.random.PRNGKey(0), x)

    def loss(m, v):
        return lambda p: jnp.sum(m.apply({"params": p}, x) ** 2)

    o0, g0 = jax.value_and_grad(loss(enc0, v))(v["params"])
    o1, g1 = jax.value_and_grad(loss(enc1, v))(v["params"])
    assert np.allclose(float(o0), float(o1), rtol=1e-6)
    import flax

    f0 = flax.traverse_util.flatten_dict(g0)
    f1 = flax.traverse_util.flatten_dict(g1)
    for k in f0:
        np.testing.assert_allclose(np.asarray(f0[k]), np.asarray(f1[k]),
                                   rtol=1e-5, atol=1e-6)
