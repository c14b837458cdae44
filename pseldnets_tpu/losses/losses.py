"""Loss implementations. See package docstring for parity targets."""

import itertools
from typing import Any, Dict

import jax
import jax.numpy as jnp
import numpy as np


def _mse_none(pred, target):
    d = pred - target
    return d * d


def _l1_none(pred, target):
    return jnp.abs(pred - target)


def _bce_logits_none(pred, target):
    # torch BCEWithLogitsLoss: max(x,0) - x*z + log(1+exp(-|x|))
    return jnp.maximum(pred, 0) - pred * target + jnp.log1p(jnp.exp(-jnp.abs(pred)))


_ELEMWISE = {"mse": _mse_none, "l1": _l1_none, "bce": _bce_logits_none}


def _pit_reduce(x):
    """Mean over dims >= 2, keeping (B, T) (reference loss_utilities.py:20)."""
    return x.mean(axis=tuple(range(2, x.ndim)))


class AccdoaLoss:
    """MSE/L1 on pred['accdoa'] vs target['accdoa_label']
    (reference src/loss/accdoa.py:3-23)."""

    loss_dict_keys = ("loss_all", "loss_accdoa", "loss_other")

    def __init__(self, loss_fn: str = "mse", loss_type: str = "loss_all", **_):
        self.fn = _ELEMWISE[loss_fn]

    def __call__(self, pred: Dict, target: Dict, epoch_it: int = 0) -> Dict:
        loss = self.fn(pred["accdoa"], target["accdoa_label"]).mean()
        return {"loss_all": loss + 0.0, "loss_accdoa": loss, "loss_other": 0.0}


# ADPIT: 13 track-permutations of the (A, B, C) same-class-overlap groups
# (reference src/loss/multi_accdoa.py:36-69). Index order: A0 B0 B1 C0 C1 C2.
_B_PERMS = [(1, 1, 2), (1, 2, 1), (1, 2, 2), (2, 1, 1), (2, 1, 2), (2, 2, 1)]
_C_PERMS = [(3, 4, 5), (3, 5, 4), (4, 3, 5), (4, 5, 3), (5, 3, 4), (5, 4, 3)]


class AdpitLoss:
    """Auxiliary duplicating PIT for multi-ACCDOA
    (reference src/loss/multi_accdoa.py:5-106)."""

    loss_dict_keys = ("loss_all", "loss_adpit", "loss_other")

    def __init__(self, loss_fn: str = "mse", loss_type: str = "loss_all", **_):
        pass

    def __call__(self, pred: Dict, target: Dict, epoch_it: int = 0) -> Dict:
        out = pred["multi_accdoa"]
        tgt = target["adpit_label"]  # (B, T, 6, 4, K)
        B, T = out.shape[:2]
        K = tgt.shape[-1]

        act = tgt[:, :, :, 0:1, :]  # activity
        xyz = tgt[:, :, :, 1:, :]   # (B, T, 6, 3, K)
        groups = act * xyz          # masked DOA targets per dummy track

        def cat3(i, j, k):
            return jnp.concatenate([groups[:, :, i], groups[:, :, j], groups[:, :, k]],
                                   axis=2)  # (B, T, 9, K)

        A = cat3(0, 0, 0)
        B0B0B1 = cat3(*_B_PERMS[0])
        C0C1C2 = cat3(*_C_PERMS[0])
        pad_a = B0B0B1 + C0C1C2
        pad_b = A + C0C1C2
        pad_c = A + B0B0B1

        targets = [A + pad_a]
        targets += [cat3(*p) + pad_b for p in _B_PERMS]
        targets += [cat3(*p) + pad_c for p in _C_PERMS]
        targets = jnp.stack(targets, axis=0)  # (13, B, T, 9, K)

        out = out.reshape(B, T, 9, K)
        losses = ((out[None] - targets) ** 2).mean(axis=3)  # (13, B, T, K)
        idx = jnp.argmin(losses, axis=0)
        loss = jnp.take_along_axis(losses, idx[None], axis=0)[0].mean()
        return {"loss_all": loss + 0.0, "loss_adpit": loss, "loss_other": 0.0}


class Einv2PitLoss:
    """Track-wise PIT over 3! permutations of β·BCE(sed) + (1−β)·MSE(doa)
    (reference src/loss/einv2.py:30-116)."""

    loss_dict_keys = ("loss_all", "loss_sed", "loss_doa", "loss_other")

    def __init__(self, loss_fn=None, loss_type: str = "loss_all",
                 method: str = "tPIT", loss_beta: float = 0.5, **_):
        loss_fn = loss_fn or {"sed": "bce", "doa": "mse"}
        self.sed_fn = _ELEMWISE[loss_fn["sed"]]
        self.doa_fn = _ELEMWISE[loss_fn["doa"]]
        self.beta = float(loss_beta)
        self.pit = "PIT" in method
        self.max_ov = 3

    def __call__(self, pred: Dict, target: Dict, epoch_it: int = 0) -> Dict:
        sed_t = target["sed_label"][:, :, : self.max_ov, :]
        doa_t = target["doa_label"][:, :, : self.max_ov, :]
        if not self.pit:
            loss_sed = self.sed_fn(pred["sed"], sed_t).mean()
            loss_doa = self.doa_fn(pred["doa"], doa_t).mean()
        else:
            perms = list(itertools.permutations(range(self.max_ov)))
            sed_l = jnp.stack([_pit_reduce(self.sed_fn(pred["sed"], sed_t[:, :, list(p)]))
                               for p in perms])  # (6, B, T)
            doa_l = jnp.stack([_pit_reduce(self.doa_fn(pred["doa"], doa_t[:, :, list(p)]))
                               for p in perms])
            tot = self.beta * sed_l + (1 - self.beta) * doa_l
            idx = jnp.argmin(tot, axis=0)[None]
            loss_sed = jnp.take_along_axis(sed_l, idx, axis=0)[0].mean()
            loss_doa = jnp.take_along_axis(doa_l, idx, axis=0)[0].mean()
        loss_all = self.beta * loss_sed + (1 - self.beta) * loss_doa
        return {"loss_all": loss_all, "loss_sed": loss_sed,
                "loss_doa": loss_doa, "loss_other": 0.0}


class AggPitLoss:
    """Activity-coupled AGG loss: pred = sigmoid(sed) ⊗ normalize(doa)
    (reference src/loss/einv2.py:118-188; AGG_LOSS.md:33-49)."""

    loss_dict_keys = ("loss_all", "loss_agg", "loss_accdoa", "loss_other")

    def __init__(self, loss_fn: str = "mse", loss_type: str = "loss_all",
                 loss_alpha: float = 0.0, method: str = "mACCDOA_pit", **_):
        self.fn = _ELEMWISE[loss_fn]
        self.alpha = float(loss_alpha)
        self.method = method
        self.max_ov = 3

    def _tpit(self, pred, target):
        perms = list(itertools.permutations(range(pred.shape[2])))
        losses = jnp.stack([_pit_reduce(self.fn(pred, target[:, :, list(p)]))
                            for p in perms])  # (6, B, T)
        idx = jnp.argmin(losses, axis=0)[None]
        return jnp.take_along_axis(losses, idx, axis=0)[0]

    def __call__(self, pred: Dict, target: Dict, epoch_it: int = 0) -> Dict:
        sed_p = jax.nn.sigmoid(pred["sed"])  # (B, T, 3, K)
        norm = jnp.linalg.norm(pred["doa"], axis=-1, keepdims=True)
        doa_p = pred["doa"] / jnp.maximum(norm, 1e-12)  # F.normalize eps
        tgt = target["sed_label"][..., None] * target["doa_label"][:, :, :, None, :]
        prd = sed_p[..., None] * doa_p[:, :, :, None, :]  # (B, T, 3, K, 3)

        loss_agg = 0.0
        loss_accdoa = 0.0
        if self.method == "mACCDOA_pit":
            loss_agg = self._tpit(prd, tgt).mean()
            loss_all = loss_agg
        elif self.method == "ACCDOA":
            loss_accdoa = self.fn(prd.sum(axis=2), tgt.sum(axis=2)).mean()
            loss_all = loss_accdoa
        else:
            loss_agg = self._tpit(prd, tgt).mean()
            loss_accdoa = self.fn(prd.sum(axis=2), tgt.sum(axis=2)).mean()
            loss_all = self.alpha * loss_agg + (1 - self.alpha) * loss_accdoa
        return {"loss_all": loss_all, "loss_agg": loss_agg,
                "loss_accdoa": loss_accdoa, "loss_other": 0.0}


_TARGETS = {
    "loss.accdoa.Losses": AccdoaLoss,
    "loss.multi_accdoa.Losses": AdpitLoss,
    "loss.einv2.Losses_pit": Einv2PitLoss,
    "loss.einv2.Losses_agg_pit": AggPitLoss,
}


def build_loss(loss_cfg: Dict[str, Any]):
    """Instantiate from the reference's hydra `_target_` spec
    (configs/loss/*.yaml; reference hydra.utils.instantiate call site
    src/models/components/model_module.py:172)."""
    cfg = dict(loss_cfg)
    target = cfg.pop("_target_")
    if target not in _TARGETS:
        raise KeyError(f"unknown loss target '{target}'")
    return _TARGETS[target](**cfg)
