"""Structural checks: full-production-size parameter counts match the
reference exactly (via jax.eval_shape — no compute), and the distributed
batch sampler reproduces the reference's rank-strided slicing."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

import jax
import jax.numpy as jnp

from reference_oracle import load_reference
from pseldnets_tpu.config import compose
from pseldnets_tpu.data.sampler import DistributedBatchSampler
from pseldnets_tpu.models import build_model

load_reference()
import torch  # noqa: E402

CFG_DIR = os.path.join(os.path.dirname(__file__), "..", "configs")


def _flax_param_count(model, feats_shape):
    shapes = jax.eval_shape(
        lambda r, f: model.init({"params": r}, f, train=False),
        jax.random.PRNGKey(0), jax.ShapeDtypeStruct(feats_shape, jnp.float32))
    return sum(int(np.prod(x.shape)) for x in jax.tree_util.tree_leaves(shapes["params"]))


def _torch_param_count(m):
    return sum(p.numel() for p in m.parameters())


def test_htsat_full_size_param_parity():
    from models import multi_accdoa as ref

    cfg = compose(CFG_DIR, "train", ["loss=multi_accdoa",
                                     "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13)
    got = _flax_param_count(model, (2, 7, 1001, 64))

    tm = ref.HTSAT(cfg, 13, in_channels=7, pretrained_path=None,
                   **{k: v for k, v in cfg["model"]["kwargs"].items()
                      if k not in ("audioset_pretrain", "pretrained_path")})
    want = _torch_param_count(tm)
    assert got == want, f"param count {got:,} != reference {want:,}"


def test_passt_full_size_param_parity():
    from models import accdoa as ref

    cfg = compose(CFG_DIR, "train", ["model=passt", "loss=accdoa",
                                     "model.kwargs.pretrained_path=null"])
    model, _ = build_model(cfg, 13)
    got = _flax_param_count(model, (2, 7, 1001, 64))
    kwargs = {k: v for k, v in cfg["model"]["kwargs"].items()
              if k not in ("audioset_pretrain", "pretrained_path")}
    tm = ref.PASST(cfg, 13, in_channels=7, pretrained_path=None, **kwargs)
    want = _torch_param_count(tm)
    assert got == want, f"param count {got:,} != reference {want:,}"


def test_sampler_rank_strided_parity():
    """Our sampler must emit the same per-rank batches as the reference's
    UserDistributedBatchSampler (same seed-identical shuffles + strided
    slices; reference src/data/components/sampler.py:33-46)."""
    from data.components.sampler import UserDistributedBatchSampler as RefSampler
    import data.components.sampler as ref_mod

    clip_num, batch, world = 103, 8, 4
    for rank in range(world):
        ours = DistributedBatchSampler(clip_num, batch, seed=77, rank=rank,
                                       num_replicas=world)
        # reference reads rank/world from torch.distributed: monkeypatch
        ref_mod.dist.is_initialized = lambda: True
        ref_mod.dist.get_rank = lambda: rank
        ref_mod.dist.get_world_size = lambda: world
        theirs = RefSampler(clip_num, batch, seed=77)
        it_a, it_b = iter(ours), iter(theirs)
        for _ in range(30):
            np.testing.assert_array_equal(next(it_a), next(it_b))
