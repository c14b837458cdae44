#!/usr/bin/env python
"""Full-production-size checkpoint parity: the reference torch HTSAT-mACCDOA
(spec 256 / embed 96 / depths 2,2,6,2 — the released-checkpoint architecture)
with random weights, converted to flax, must produce identical logits.

Slow (~minutes of torch-CPU forward on this box) → script, not a suite test.
"""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "tests"))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
os.environ["JAX_PLATFORMS"] = "cpu"

import numpy as np
import jax

jax.config.update("jax_platforms", "cpu")
import jax.numpy as jnp

from reference_oracle import load_reference
from pseldnets_tpu.config import compose
from pseldnets_tpu.models import build_model
from pseldnets_tpu.train.checkpoint import convert_state_dict, strip_prefixes

load_reference()
import torch

from test_ckpt_parity import _randomize_bn_stats

torch.manual_seed(0)
CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def main():
    cfg = compose(CFG_DIR, "train", ["loss=multi_accdoa",
                                     "model.kwargs.pretrained_path=null"])
    from models import multi_accdoa as ref

    kwargs = {k: v for k, v in cfg["model"]["kwargs"].items()
              if k not in ("audioset_pretrain", "pretrained_path")}
    tm = ref.HTSAT(cfg, 13, in_channels=7, pretrained_path=None, **kwargs)
    tm.eval()
    _randomize_bn_stats(tm)

    model, _ = build_model(cfg, 13)
    rng = np.random.default_rng(1)
    x = rng.standard_normal((2, 7, 1001, 64)).astype(np.float32) * 0.5

    print("torch forward...", flush=True)
    with torch.no_grad():
        ref_out = tm(torch.from_numpy(x.copy()))["multi_accdoa"].numpy()

    print("converting + flax forward...", flush=True)
    variables = jax.jit(lambda r, f: model.init({"params": r}, f, train=False))(
        jax.random.PRNGKey(0), jnp.asarray(x[:1]))
    sd = {k: v.numpy() for k, v in tm.state_dict().items()}
    variables, report = convert_state_dict(strip_prefixes(sd), variables,
                                           strict=True)
    assert not report["unused"], report["unused"][:5]
    out = np.asarray(jax.jit(lambda v, f: model.apply(v, f, train=False))(
        variables, jnp.asarray(x))["multi_accdoa"])

    err = np.abs(out - ref_out).max()
    print(f"full-size HTSAT mACCDOA logit parity: max|diff| = {err:.2e} "
          f"(outputs in [-1,1], {out.shape})")
    assert err < 5e-4, err
    print("PASS")


if __name__ == "__main__":
    main()
