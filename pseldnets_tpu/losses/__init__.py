"""SELD losses: ACCDOA MSE, multi-ACCDOA ADPIT, EINV2 tPIT, and AGG losses.

All are pure jittable functions; permutation-invariant losses evaluate every
permutation as one stacked tensor op and select per-(frame[,class]) argmin —
the XLA-friendly formulation of the reference's 13-branch/6-branch Python
loops (reference src/loss/multi_accdoa.py:16-106, src/loss/einv2.py:78-116).

The factory `build_loss` resolves the reference's hydra `_target_` strings
(loss.accdoa.Losses, loss.multi_accdoa.Losses, loss.einv2.Losses_pit,
loss.einv2.Losses_agg_pit) so existing configs run unchanged.
"""

from .losses import (
    AccdoaLoss,
    AdpitLoss,
    Einv2PitLoss,
    AggPitLoss,
    build_loss,
)

__all__ = ["AccdoaLoss", "AdpitLoss", "Einv2PitLoss", "AggPitLoss", "build_loss"]
