#!/usr/bin/env python
"""Probe R9B (round 5): CNN14 fused conv-block A/B (VERDICT #2) + nomax
guard drive.

The r7c device timeline put ~25 ms of the 93 ms cnn14_accdoa step in
separate f32 ReLU(x+bias)->bf16 materializations after every conv; the r7e
dtype knob measured a wash. ops/pallas/conv_block.py now fuses conv+bias+
ReLU (double-conv per ConvBlock, mid activation VMEM-resident) for every
block whose weights fit VMEM (blocks 1-4 of CNN14; 5-6 stay XLA).

1. cnn14 full model A/B @B=128: conv_impl="xla" vs "pallas" (+ parity).
2. trunk-only A/B (convs+pools, no decoder/head) to bucket the win.
3. pallas_max_weight_mb sweep 16 vs 32 (pull block 5 in-kernel: its W pair
   is 28.3 MB — may or may not fit beside activations).
4. nomax guard REAL drive: SELDTask eval on the axon backend with a hot
   random-init HTSAT — the guard must resolve False and the eval step must
   stay finite (the unguarded kernel would NaN).

One process, fori-K harness, quiet box required.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import bench_all  # noqa: E402
import jax  # noqa: E402
import jax.numpy as jnp  # noqa: E402
import numpy as np  # noqa: E402

K = 32
B = 128


def clips(dt, BB=B, clip_sec=10.0):
    return (BB / dt) / (60.0 / clip_sec)


def cnn14_ab():
    from pseldnets_tpu.serving import crnn_fused_forward

    cfg, model = bench_all._build(["model=crnn", "loss=accdoa"])
    feats = jax.random.normal(jax.random.PRNGKey(1), (B, 7, 1001, 64),
                              jnp.float32) * 0.3
    variables = jax.jit(lambda r, f: model.init(
        {"params": r}, f, train=False))(jax.random.PRNGKey(0), feats[:2])
    jax.block_until_ready(feats)

    # parity once at B=8 (bf16 band)
    outs = {}
    for impl in ("xla", "pallas"):
        outs[impl] = jax.jit(
            lambda f, v, impl=impl: crnn_fused_forward(
                model, v, f, conv_impl=impl)["accdoa"])(feats[:8], variables)
    dev = float(jnp.max(jnp.abs(outs["pallas"].astype(jnp.float32)
                                - outs["xla"].astype(jnp.float32))))
    print(f"cnn14 pallas-conv on-chip parity (bf16): {dev:.3e}", flush=True)

    for impl, kw in (("xla", {}), ("pallas", {}),
                     ("pallas mb=32", {"pallas_max_weight_mb": 32.0})):
        ci = impl.split()[0]
        try:
            dt = bench_all._k_time(
                lambda k, f, v, ci=ci, kw=kw: crnn_fused_forward(
                    model, v, f * (1.0 + 1e-4 * k), conv_impl=ci,
                    **kw)["accdoa"].astype(jnp.float32).mean(),
                (feats, variables), K=K)
            print(f"cnn14 full conv_impl={impl}: {dt*1000:.3f} ms/batch = "
                  f"{clips(dt):.1f} clips/s", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"cnn14 full conv_impl={impl} FAILED: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)

    # trunk-only bucket (convs+pools, through the trunk mean)
    from pseldnets_tpu.serving.crnn import (_affine_from_bn, _avg_pool,
                                            _conv_block, _fold_conv_bn)

    p = variables["params"]
    st = variables["batch_stats"]

    def trunk(f, v, impl):
        p, st = v["params"], v["batch_stats"]
        inv, shift = _affine_from_bn(p["scalar"]["bn"], st["scalar"]["bn"])
        x = f * inv[None, :, None, :] + shift[None, :, None, :]
        x = jnp.transpose(x, (0, 2, 3, 1)).astype(jnp.bfloat16)
        feats_n = tuple(model.num_features)
        pools = [(2, 2)] * 3 + [(1, 2)] * (len(feats_n) - 3)
        for i in range(len(feats_n)):
            blk = p["convs"][f"conv_block{i + 1}"]
            bst = st["convs"][f"conv_block{i + 1}"]
            folded = [_fold_conv_bn(blk[f"conv{j}"]["kernel"],
                                    blk[f"bn{j}"]["bn"],
                                    bst[f"bn{j}"]["bn"], jnp.bfloat16)
                      for j in (1, 2)]
            x = _avg_pool(_conv_block(x, folded, impl, jnp.bfloat16,
                                      jnp.float32, 16.0), pools[i])
        return x.astype(jnp.float32).mean()

    for impl in ("xla", "pallas"):
        try:
            dt = bench_all._k_time(
                lambda k, f, v, impl=impl: trunk(f * (1.0 + 1e-4 * k), v,
                                                 impl),
                (feats, variables), K=K)
            print(f"cnn14 trunk-only conv_impl={impl}: {dt*1000:.3f} "
                  f"ms/batch", flush=True)
        except Exception as e:  # noqa: BLE001
            print(f"cnn14 trunk-only conv_impl={impl} FAILED: "
                  f"{str(e).splitlines()[0][:200]}", flush=True)


def guard_drive():
    """Real-TPU drive of the round-5 nomax guard: an HTSAT with qkv heated
    past the exp2 overflow margin (test_nomax_guard._heat pattern) through
    SELDTask.eval_step must resolve nomax=False and stay finite (the
    unguarded kernel would NaN via inf/inf)."""
    from pseldnets_tpu.config import compose
    from pseldnets_tpu.data.datasets import BaseDatasetSpec
    from pseldnets_tpu.train.module import SELDTask

    cfg = compose(str(REPO / "configs"), "train",
                  ["model.kwargs.pretrained_path=null",
                   "model.kwargs.audioset_pretrain=false",
                   "loss=multi_accdoa", "data.audio_feature=logmelIV"])

    class _Spec(BaseDatasetSpec):  # no corpus on disk (bench_train pattern)
        def __init__(self):
            super().__init__()
            self.label_dic = {f"c{i}": i for i in range(13)}
            self.max_ov = 3

    task = SELDTask(cfg, _Spec(), num_devices=1)
    state = task.init_state()

    def heat(tree, path=()):
        if isinstance(tree, dict):
            return {k: heat(v, path + (k,)) for k, v in tree.items()}
        return tree * 40.0 if "qkv" in path else tree

    state = state.replace(params=heat(state.params))
    batch = {"data": np.random.default_rng(0).standard_normal(
        (2, 4, 240000)).astype(np.float32) * 0.1}
    t0 = time.time()
    out = task.eval_step(state, batch)
    key = next(iter(out))
    arr = np.asarray(out[key])
    print(f"guard drive: nomax={task._nomax} finite={np.isfinite(arr).all()}"
          f" out[{key}].shape={arr.shape} ({time.time()-t0:.0f}s)",
          flush=True)
    assert np.isfinite(arr).all()


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    t0 = time.time()
    cnn14_ab()
    guard_drive()
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
