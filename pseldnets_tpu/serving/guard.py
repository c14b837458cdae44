"""Checkpoint guard for the fused kernels' no-max exp2 softmax.

The serving kernels (ops.pallas.swin_block / vit_block) default to the
measured-fastest ``nomax`` softmax: exp2 WITHOUT the shift-invariant row-max
subtraction. f32 exp2 overflows past 2^127, so a checkpoint whose raw
attention logits exceed ~127 in log2 units (~88 natural-log) would silently
NaN via inf/inf where the guarded form is safe. Every validated SELD
checkpoint sits two orders of magnitude below (max |logit| ~ O(10)), but an
UNVALIDATED external checkpoint has no such bound — round-3/4 reviews called
the docs-only mitigation a footgun.

:func:`resolve_nomax` closes it: one flax eval forward on a probe batch
collects every block's max |pre-softmax logit| (the ``attn_logit_max`` sows
in models.htsat.Attention / models.passt.Attention — microseconds on top of
the forward) and compares against the overflow threshold with a safety
margin. train.module wires it in at first eval: the fused serving path gets
``nomax=False`` automatically whenever the probe runs hot.

No reference analogue (torch softmax is always guarded); this protects a
TPU-side optimization the reference does not have.
"""

import math
from typing import Any, Dict

import jax
import jax.numpy as jnp

LOG2E = math.log2(math.e)

# exp2 overflows past 127 (log2 units). The probe batch is a sample, not a
# bound, so demand a wide margin: logits past 2^64 of headroom are treated
# as hot. In natural-log units the cutoff is ~44 — validated checkpoints
# measure O(10), a genuinely exploding one measures thousands.
NOMAX_LOG2_LIMIT = 64.0


def _collect(tree: Any, key: str, out: list) -> None:
    if isinstance(tree, dict):
        for k, v in tree.items():
            if k == key:
                out.append(v)
            else:
                _collect(v, key, out)
    elif isinstance(tree, (tuple, list)):
        for v in tree:
            _collect(v, key, out)


def max_abs_attention_logit(model, variables: Dict, feats: jnp.ndarray,
                            **apply_kwargs) -> float:
    """Max SIGNED pre-softmax attention logit (natural units) over every
    block of one eval forward — exp2 only overflows for logits above +127
    log2 units; the -100 shift-mask / -1e5 pairing biases underflow to
    exactly 0 and are safe. Uses the UNFUSED flax path (the sows live
    there); the probe is a one-time cost at serving init."""

    @jax.jit
    def fwd(v, f):
        _, inter = model.apply(v, f, train=False,
                               mutable=["intermediates"], **apply_kwargs)
        leaves: list = []
        _collect(inter, "attn_logit_max", leaves)
        if not leaves:
            return jnp.float32(0.0)
        flat = []
        for x in leaves:
            flat.extend(jax.tree_util.tree_leaves(x))
        return jnp.max(jnp.stack([jnp.asarray(x, jnp.float32).max()
                                  for x in flat]))

    return float(fwd(variables, feats))


def resolve_nomax(model, variables: Dict, feats: jnp.ndarray,
                  limit_log2: float = NOMAX_LOG2_LIMIT) -> bool:
    """True iff the no-max exp2 softmax is safe for this checkpoint.

    ``feats``: a small probe batch of real eval features (first clips of the
    first eval batch — representative activations, unlike zeros)."""
    m = max_abs_attention_logit(model, variables, feats)
    return m * LOG2E < limit_log2
