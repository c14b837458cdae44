"""No-max exp2 softmax checkpoint guard (serving.guard).

The fused serving kernels default to the unguarded exp2 softmax (no row-max
subtraction — a measured win, docs/PERF.md round 3). f32 exp2 overflows past
2^127, so a checkpoint with raw attention logits above ~88 (natural log)
silently NaNs via inf/inf. resolve_nomax probes the loaded checkpoint once
and forces the guarded softmax when hot; train.module wires it in before the
fused eval step is built. The reference has no analogue (torch softmax is
always guarded) — this protects a TPU-only optimization.
"""

import numpy as np
import jax
import jax.numpy as jnp

from pseldnets_tpu.models import heads
from pseldnets_tpu.serving.guard import (max_abs_attention_logit,
                                         resolve_nomax)


def _tiny_htsat():
    return heads.HTSAT(
        num_classes=5, in_channels=7, mel_bins=16, num_tracks=1,
        tgt_output_frames=24,
        encoder_kwargs=(("spec_size", 64), ("patch_size", 4),
                        ("patch_stride", (4, 4)), ("embed_dim", 16),
                        ("depths", (2, 2)), ("num_heads", (2, 4)),
                        ("window_size", 4), ("mlp_ratio", 2.0),
                        ("drop_path_rate", 0.0)))


def _heat(params, factor):
    """Scale every attention qkv kernel/bias so raw logits explode
    (logit ~ scale * |q||k| grows with factor^2)."""

    def walk(tree, path=()):
        if isinstance(tree, dict):
            return {k: walk(v, path + (k,)) for k, v in tree.items()}
        if "qkv" in path:
            return tree * factor
        return tree

    return walk(params)


def test_guard_cold_and_hot_checkpoint():
    model = _tiny_htsat()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 7, 241, 16)).astype(np.float32))
    variables = model.init(jax.random.PRNGKey(0), x, train=False)

    # NOTE a fresh RANDOM init already measures max |logit| ~ 100 natural
    # units on this tiny config (heavy-tail max over every window/head/
    # block) — past exp2's 127-log2 overflow. Validated SELD checkpoints
    # measure O(10); the guard exists exactly because "random-ish" params
    # can run this hot. Emulate a calm trained checkpoint by scaling qkv
    # down, and a hot one by scaling it up.
    cold = dict(variables)
    cold["params"] = _heat(variables["params"], 0.05)
    m = max_abs_attention_logit(model, cold, x)
    assert np.isfinite(m) and m < 40.0
    assert resolve_nomax(model, cold, x)

    hot = dict(variables)
    hot["params"] = _heat(variables["params"], 40.0)
    m_hot = max_abs_attention_logit(model, hot, x)
    assert m_hot > 44.0  # past the 64-log2-unit margin
    assert not resolve_nomax(model, hot, x)


def test_guard_passt():
    model = heads.PASST(
        num_classes=5, in_channels=7, mel_bins=16, num_tracks=1,
        encoder_kwargs=(("u_patchout", 0), ("s_patchout_t", 0),
                        ("s_patchout_f", 0), ("img_size", (16, 101)),
                        ("patch_size", 16), ("stride", 10),
                        ("embed_dim", 16), ("depth", 2), ("num_heads", 2),
                        ("mlp_ratio", 4.0), ("qkv_bias", True),
                        ("distilled", True), ("drop_rate", 0.0),
                        ("drop_path_rate", 0.0)))
    x = jnp.asarray(np.random.default_rng(1).standard_normal(
        (2, 7, 101, 16)).astype(np.float32))
    variables = model.init({"params": jax.random.PRNGKey(0),
                            "patchout": jax.random.PRNGKey(1)}, x,
                           train=False)
    cold = dict(variables)
    cold["params"] = _heat(variables["params"], 0.05)
    assert resolve_nomax(model, cold, x)
    hot = dict(variables)
    hot["params"] = _heat(variables["params"], 60.0)
    assert not resolve_nomax(model, hot, x)


def test_nomax_overflow_is_real_and_guarded_form_is_safe():
    """The footgun the guard exists for: a hot checkpoint NaNs under the
    unguarded exp2 softmax but stays finite under the guarded one."""
    from pseldnets_tpu.ops.pallas.vit_block import vit_block_fused

    C, NH, N = 32, 2, 24
    r = np.random.default_rng(2)
    big = 60.0  # |logit| >> 127 log2 units after q.k at this scale
    p = {
        "norm1": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "attn": {"qkv": {"kernel": jnp.asarray(
                     r.normal(0, big, (C, 3 * C)), jnp.float32),
                     "bias": jnp.zeros((3 * C,))},
                 "proj": {"kernel": jnp.asarray(
                     r.normal(0, 0.02, (C, C)), jnp.float32),
                     "bias": jnp.zeros((C,))}},
        "norm2": {"scale": jnp.ones((C,)), "bias": jnp.zeros((C,))},
        "mlp": {"fc1": {"kernel": jnp.asarray(
                    r.normal(0, 0.02, (C, 2 * C)), jnp.float32),
                    "bias": jnp.zeros((2 * C,))},
                "fc2": {"kernel": jnp.asarray(
                    r.normal(0, 0.02, (2 * C, C)), jnp.float32),
                    "bias": jnp.zeros((C,))}},
    }
    x = jnp.asarray(r.standard_normal((2, N, C)).astype(np.float32))
    hot = np.asarray(vit_block_fused(x, p, nh=NH, attn_impl="exp2",
                                     nomax=True, compute_dtype=jnp.float32,
                                     interpret=True))
    assert np.isnan(hot).any()  # inf/inf — the silent failure mode
    safe = np.asarray(vit_block_fused(x, p, nh=NH, attn_impl="exp2",
                                      nomax=False, compute_dtype=jnp.float32,
                                      interpret=True))
    assert np.isfinite(safe).all()


def test_module_wiring_forces_guarded_softmax(monkeypatch):
    """_resolve_nomax runs before the fused eval step is built and threads
    nomax=False into the serving call when the probe runs hot."""
    from pseldnets_tpu.train import module as module_mod

    seen = {}

    class FakeTask:
        _nomax = None
        model = _tiny_htsat()
        _localize_for_eval = lambda self, state: (state["params"],
                                                  state.get("batch_stats"))
        _forward_features = staticmethod(lambda bx: bx)
        _select_fused_eval = lambda self: (lambda *a, **kw: seen.update(kw),
                                           True)
        _resolve_nomax = module_mod.SELDTask._resolve_nomax

    task = FakeTask()
    x = jnp.asarray(np.random.default_rng(0).standard_normal(
        (2, 7, 241, 16)).astype(np.float32))
    variables = task.model.init(jax.random.PRNGKey(0), x, train=False)
    hot = {"params": _heat(variables["params"], 40.0),
           "batch_stats": variables.get("batch_stats", {})}
    task._resolve_nomax(hot, x)
    assert task._nomax is False
