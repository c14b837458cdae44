"""Loss parity tests against the reference torch implementations (imported as
oracles) plus hand-built permutation cases."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np
import jax.numpy as jnp

from reference_oracle import load_reference
from pseldnets_tpu.losses import (AccdoaLoss, AdpitLoss, Einv2PitLoss, AggPitLoss,
                                  build_loss)

load_reference()
import torch  # noqa: E402


def test_accdoa_loss_parity(rng):
    from loss.accdoa import Losses as RefLoss

    pred = rng.standard_normal((4, 10, 39)).astype(np.float32)
    tgt = rng.standard_normal((4, 10, 39)).astype(np.float32)
    ref = RefLoss("mse", "loss_all")({"accdoa": torch.from_numpy(pred)},
                                     {"accdoa_label": torch.from_numpy(tgt)})
    got = AccdoaLoss("mse")({"accdoa": jnp.asarray(pred)},
                            {"accdoa_label": jnp.asarray(tgt)})
    np.testing.assert_allclose(float(got["loss_all"]), float(ref["loss_all"]), rtol=1e-6)


def test_adpit_loss_parity(rng):
    from loss.multi_accdoa import Losses as RefLoss

    B, T, K = 3, 8, 5
    pred = rng.standard_normal((B, T, 9 * K)).astype(np.float32)
    # adpit target: (B, T, 6, 4, K) with {0,1} activity and unit DOA
    act = (rng.random((B, T, 6, 1, K)) > 0.7).astype(np.float32)
    doa = rng.standard_normal((B, T, 6, 3, K)).astype(np.float32)
    doa /= np.linalg.norm(doa, axis=3, keepdims=True) + 1e-9
    tgt = np.concatenate([act, doa], axis=3).astype(np.float32)

    ref = RefLoss("mse", "loss_all")({"multi_accdoa": torch.from_numpy(pred)},
                                     {"adpit_label": torch.from_numpy(tgt)})
    got = AdpitLoss()({"multi_accdoa": jnp.asarray(pred)},
                      {"adpit_label": jnp.asarray(tgt)})
    np.testing.assert_allclose(float(got["loss_all"]), float(ref["loss_all"]), rtol=1e-5)


def _einv2_batch(rng, B=3, T=6, K=4):
    sed_p = rng.standard_normal((B, T, 3, K)).astype(np.float32)
    doa_p = np.tanh(rng.standard_normal((B, T, 3, 3))).astype(np.float32)
    sed_t = np.zeros((B, T, 3, K), np.float32)
    for b in range(B):
        for t in range(T):
            for tr in range(rng.integers(0, 4)):
                sed_t[b, t, tr, rng.integers(0, K)] = 1.0
    doa_t = rng.standard_normal((B, T, 3, 3)).astype(np.float32)
    doa_t /= np.linalg.norm(doa_t, axis=-1, keepdims=True) + 1e-9
    return sed_p, doa_p, sed_t, doa_t


def test_einv2_tpit_parity(rng):
    from loss.einv2 import Losses_pit as RefLoss

    sed_p, doa_p, sed_t, doa_t = _einv2_batch(rng)
    ref = RefLoss({"sed": "bce", "doa": "mse"}, "loss_all", "tPIT", 0.5)(
        {"sed": torch.from_numpy(sed_p), "doa": torch.from_numpy(doa_p)},
        {"sed_label": torch.from_numpy(sed_t), "doa_label": torch.from_numpy(doa_t)})
    got = Einv2PitLoss({"sed": "bce", "doa": "mse"}, "loss_all", "tPIT", 0.5)(
        {"sed": jnp.asarray(sed_p), "doa": jnp.asarray(doa_p)},
        {"sed_label": jnp.asarray(sed_t), "doa_label": jnp.asarray(doa_t)})
    for k in ("loss_all", "loss_sed", "loss_doa"):
        np.testing.assert_allclose(float(got[k]), float(ref[k]), rtol=1e-5)


def test_agg_pit_parity(rng):
    from loss.einv2 import Losses_agg_pit as RefLoss

    for method in ("mACCDOA_pit", "ACCDOA", "blend"):
        sed_p, doa_p, sed_t, doa_t = _einv2_batch(rng)
        ref = RefLoss("mse", "loss_all", 0.3, method)(
            {"sed": torch.from_numpy(sed_p), "doa": torch.from_numpy(doa_p)},
            {"sed_label": torch.from_numpy(sed_t), "doa_label": torch.from_numpy(doa_t)})
        got = AggPitLoss("mse", "loss_all", 0.3, method)(
            {"sed": jnp.asarray(sed_p), "doa": jnp.asarray(doa_p)},
            {"sed_label": jnp.asarray(sed_t), "doa_label": jnp.asarray(doa_t)})
        np.testing.assert_allclose(float(got["loss_all"]), float(ref["loss_all"]),
                                   rtol=2e-5, err_msg=method)


def test_adpit_prefers_correct_permutation():
    # hand-built: one class, two same-class sources (B group); the permutation
    # matching (B0, B1) assignment must be selected (lower loss than swapped)
    B, T, K = 1, 1, 1
    tgt = np.zeros((B, T, 6, 4, K), np.float32)
    tgt[0, 0, 1, 0, 0] = 1.0  # B0 active
    tgt[0, 0, 1, 1, 0] = 1.0  # B0 doa = +x
    tgt[0, 0, 2, 0, 0] = 1.0  # B1 active
    tgt[0, 0, 2, 2, 0] = 1.0  # B1 doa = +y
    # prediction: track0=+x, track1=+y, track2=+x (matches B0,B1,B0)
    pred = np.zeros((B, T, 9, K), np.float32)
    pred[0, 0, 0, 0] = 1.0  # t0 x
    pred[0, 0, 4, 0] = 1.0  # t1 y
    pred[0, 0, 6, 0] = 1.0  # t2 x
    loss = AdpitLoss()({"multi_accdoa": jnp.asarray(pred.reshape(B, T, 9 * K))},
                       {"adpit_label": jnp.asarray(tgt)})
    assert float(loss["loss_all"]) < 1e-8


def test_build_loss_factory():
    cfg = {"_target_": "loss.multi_accdoa.Losses", "loss_fn": "mse",
           "loss_type": "loss_all"}
    assert isinstance(build_loss(cfg), AdpitLoss)
