"""Regression tests for round-2 code-review findings (all were real bugs):

1. Fused Swin MLP chunking dropped rows when the auto-group picked G with
   G*L indivisible by the chunk count (eval crash on uneven batches).
2. eval_step padded only to the mesh size, so an odd final batch of 5s
   clips crashed the 5s-concat pairing on odd-sized meshes.
3. The radix-2 frontend's boundary BlockSpec silently read wrong rows when
   the boundary block height didn't divide t_blk, and divided by zero for
   hop >= n_fft.
"""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))
sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))

import numpy as np
import pytest

import jax
import jax.numpy as jnp


def test_swin_block_group7_chunking(rng):
    """G*L = 7*256 = 1792 is indivisible by 3 and 4 — the old chunker
    produced 1791 rows and crashed at trace time."""
    from pseldnets_tpu.models.htsat import SwinTransformerBlock
    from pseldnets_tpu.ops.pallas.swin_block import swin_block_fused

    H = W = 16
    C, nh, w = 32, 4, 8
    blk = SwinTransformerBlock(dim=C, input_resolution=(H, W),
                               num_heads=nh, window_size=w, shift_size=0)
    x = jnp.asarray(rng.standard_normal((7, H * W, C)).astype(np.float32))
    vs = blk.init(jax.random.PRNGKey(0), x)
    ref = np.asarray(blk.apply(vs, x))
    got = np.asarray(swin_block_fused(x, vs["params"], H=H, W=W, nh=nh,
                                      window=w, shift=0, group=7,
                                      compute_dtype=jnp.float32,
                                      interpret=True))
    assert np.abs(got - ref).max() < 2e-5


def test_eval_step_odd_batch_5s_single_device():
    """Odd final batch of 5s clips on a size-1 mesh must pad to even for
    the 5s-concat pairing (models/heads.py requires B % 2 == 0)."""
    import __graft_entry__ as g
    from pseldnets_tpu.data.datasets import BaseDatasetSpec
    from pseldnets_tpu.train.module import SELDTask

    cfg = g._base_cfg(tiny=True)

    class _Spec(BaseDatasetSpec):
        def __init__(self):
            super().__init__()
            self.label_dic = {f"c{i}": i for i in range(4)}
            self.max_ov = 3

    task = SELDTask(cfg, _Spec(), steps_per_epoch=2, num_devices=1)
    assert task.mesh.size == 1
    state = task.init_state(jax.random.PRNGKey(0))
    sr = cfg["data"]["sample_rate"]
    # tiny config: train_chunklen 4s -> tgt_output_frames 40; 2s clips give
    # output_frames 20 < 40 -> the 5s-trick concat path, with odd B=3
    batch = {"data": np.random.default_rng(0).standard_normal(
        (3, 4, 2 * sr)).astype(np.float32)}
    out = task.eval_step(state, batch)
    arr = np.asarray(jax.device_get(out["multi_accdoa"]))
    assert arr.shape[0] == 3 and np.isfinite(arr).all()


def test_frontend_bnd_blk_divisor():
    from pseldnets_tpu.ops.pallas.frontend import _bnd_blk

    assert _bnd_blk(4, 256) == 8
    assert _bnd_blk(9, 256) == 16
    # 24 does not divide 256 -> must step to 32 (the old code returned 24
    # and the boundary index map silently read the wrong rows)
    assert _bnd_blk(18, 256) == 32
    assert _bnd_blk(4, 128) == 8


def test_frontend_hop_ge_nfft_raises():
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    x = jnp.zeros((1, 4, 32000), jnp.float32)
    with pytest.raises(NotImplementedError):
        fused_logmel_iv(x, n_fft=256, hop=320, interpret=True)


def test_rotate_on_device_constructs(rng):
    """augment.rotate.on_device=true used to crash SELDTask construction
    (the knob reached the host Rotation's __init__)."""
    import __graft_entry__ as g
    from pseldnets_tpu.data.datasets import BaseDatasetSpec
    from pseldnets_tpu.train.module import SELDTask

    cfg = g._base_cfg(tiny=True)
    cfg["augment"]["type"] = ["rotate"]
    cfg["augment"]["rotate"]["on_device"] = True

    class _Spec(BaseDatasetSpec):
        def __init__(self):
            super().__init__()
            self.label_dic = {f"c{i}": i for i in range(4)}
            self.max_ov = 3

    task = SELDTask(cfg, _Spec(), steps_per_epoch=2, num_devices=1)
    assert task.rotate_on_device and task.rotate_device is not None


def test_decoder_conformer_bn_trains(rng):
    """The Decoder wrapper must run the conformer's BatchNorm in batch-stats
    mode during training (it previously pinned use_running_average=True)."""
    from pseldnets_tpu.models.common import Decoder

    dec = Decoder(decoder="conformer", num_feats=16, num_layers=1)
    x = jnp.asarray(rng.standard_normal((2, 12, 16)).astype(np.float32))
    vs = dec.init({"params": jax.random.PRNGKey(0)}, x)
    before = jax.tree_util.tree_leaves(vs["batch_stats"])
    _, upd = dec.apply(vs, x, deterministic=False,
                       mutable=["batch_stats"],
                       rngs={"dropout": jax.random.PRNGKey(1)})
    after = jax.tree_util.tree_leaves(upd["batch_stats"])
    changed = any(not np.allclose(np.asarray(a), np.asarray(b))
                  for a, b in zip(before, after))
    assert changed, "conformer BatchNorm running stats did not update in train"
