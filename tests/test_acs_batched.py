"""Batched ACS TTA must equal the naive 16-dispatch rotation loop.

The production `_acs_forward` folds rotation variants into the batch dim and
forwards once per chunk (train/module.py); this pins it numerically against
a literal transcription of the reference's per-variant loop
(components/model_module.py:269-303)."""

from pathlib import Path

import jax
import jax.numpy as jnp
import numpy as np

from pseldnets_tpu.config import compose
from pseldnets_tpu.data.datasets import BaseDatasetSpec
from pseldnets_tpu.train.module import SELDTask

REPO = Path(__file__).resolve().parent.parent

_TINY = [
    "data.sample_rate=16000", "data.nfft=256", "data.n_mels=16",
    "data.hoplen=320", "data.train_chunklen_sec=4",
    "model.kwargs.spec_size=64", "model.kwargs.embed_dim=8",
    "model.kwargs.depths=[1,1]", "model.kwargs.num_heads=[2,4]",
    "model.kwargs.window_size=4", "model.kwargs.drop_path_rate=0.0",
    "model.kwargs.tgt_output_frames=40", "model.kwargs.pretrained_path=null",
]


class _Spec(BaseDatasetSpec):
    def __init__(self, K=3):
        super().__init__()
        self.label_dic = {f"c{i}": i for i in range(K)}
        self.max_ov = 3


def _task(loss):
    cfg = compose(str(REPO / "configs"), "train", [f"loss={loss}"] + _TINY)
    task = SELDTask(cfg, _Spec(), steps_per_epoch=10, num_devices=1)
    state = task.init_state(jax.random.PRNGKey(0))
    task._eval_step_fn = task._make_eval_step()
    return task, state


def _naive_acs(task, state, batch_x):
    """The reference's per-variant loop, verbatim semantics."""
    from pseldnets_tpu.parallel.mesh import shard_batch

    params, batch_stats = task._localize_for_eval(state)
    trans = {(0, 1, 2): (1, 2, 3), (1, 0, 2): (3, 2, 1)}
    key = "multi_accdoa" if task.method == "multi_accdoa" else "accdoa"
    outs = []
    for sign_x, sign_y, sign_z in SELDTask._ACS_SIGNS:
        for (xx, yy, zz), (s_x, s_y, s_z) in trans.items():
            x = jnp.stack([batch_x[:, 0], sign_y * batch_x[:, s_x],
                           sign_z * batch_x[:, s_y],
                           sign_x * batch_x[:, s_z]], axis=1)
            x = shard_batch(task.eval_mesh, x)
            y = task._eval_step_fn(params, batch_stats, x)[key]
            B, T = y.shape[:2]
            tracks = 3 if key == "multi_accdoa" else 1
            y = y.reshape(B, T, tracks, 3, -1) if tracks == 3 \
                else y.reshape(B, T, 3, -1)
            comps = [sign_x * jnp.take(y, 0, -2), sign_y * jnp.take(y, 1, -2),
                     sign_z * jnp.take(y, 2, -2)]
            y = jnp.stack(comps, axis=-2)
            y = jnp.stack([jnp.take(y, xx, -2), jnp.take(y, yy, -2),
                           jnp.take(y, zz, -2)], axis=-2)
            outs.append(y.reshape(B, T, -1))
    return {key: jnp.mean(jnp.stack(outs), axis=0)}


def test_acs_batched_matches_naive_loop(rng):
    task, state = _task("multi_accdoa")
    batch_x = jnp.asarray(
        rng.standard_normal((2, 4, 64000)).astype(np.float32) * 0.2)
    want = np.asarray(_naive_acs(task, state, batch_x)["multi_accdoa"])
    for chunk in (16, 4):
        got = np.asarray(
            task._acs_forward(state, batch_x, chunk=chunk)["multi_accdoa"])
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"chunk={chunk}")


def test_acs_batched_matches_naive_loop_5s_trick(rng):
    """Trick-active shapes (output_frames == tgt//2): the HTSAT 5s-concat
    trick couples batch halves through attention, so the fold order decides
    WHICH items share a concatenated clip. The reference pairs (v, b_j) with
    (v, b_{j+B/2}) inside each per-variant forward; the batched fold must
    reproduce that pairing exactly (regression: the original variant-major
    fold paired (v_i, b_j) with (v_{i+V/2}, b_j) instead)."""
    task, state = _task("multi_accdoa")
    # 2-second clips at the 4s-tgt config: output 20 == tgt 40 // 2 -> trick
    batch_x = jnp.asarray(
        rng.standard_normal((4, 4, 32000)).astype(np.float32) * 0.2)
    want = np.asarray(_naive_acs(task, state, batch_x)["multi_accdoa"])
    for chunk in (16, 4):
        got = np.asarray(
            task._acs_forward(state, batch_x, chunk=chunk)["multi_accdoa"])
        np.testing.assert_allclose(got, want, atol=2e-5,
                                   err_msg=f"chunk={chunk}")


def test_acs_batched_sharded_mesh(rng):
    """ACS on a 2-device data mesh (exercises the with_sharding_constraint
    branch + variant-major shard alignment) must match the 1-device run."""
    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa"] + _TINY)
    t1 = SELDTask(cfg, _Spec(), steps_per_epoch=10, num_devices=1)
    s1 = t1.init_state(jax.random.PRNGKey(0))
    t2 = SELDTask(cfg, _Spec(), steps_per_epoch=10, num_devices=2)
    s2 = t2.init_state(jax.random.PRNGKey(0))

    batch_x = jnp.asarray(
        rng.standard_normal((4, 4, 64000)).astype(np.float32) * 0.2)
    want = np.asarray(t1._acs_forward(s1, batch_x)["multi_accdoa"])
    got = np.asarray(t2._acs_forward(
        s2, jnp.asarray(batch_x))["multi_accdoa"])
    np.testing.assert_allclose(got, want, atol=2e-5)


def test_acs_batched_matches_naive_loop_accdoa(rng):
    task, state = _task("accdoa")
    batch_x = jnp.asarray(
        rng.standard_normal((2, 4, 64000)).astype(np.float32) * 0.2)
    want = np.asarray(_naive_acs(task, state, batch_x)["accdoa"])
    got = np.asarray(task._acs_forward(state, batch_x)["accdoa"])
    np.testing.assert_allclose(got, want, atol=2e-5)
