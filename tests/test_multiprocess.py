"""Multi-process data-parallel coverage (VERDICT round-2 weak #3).

The reference's DDP semantics (rank-strided global batches from
src/data/components/sampler.py:44, full validation on every rank) must hold
when jax.process_count() > 1. Two legs:

* pure partition properties of DistributedBatchSampler vs its own
  single-process configuration;
* a REAL two-process jax.distributed run (CPU gloo collectives, 2 local
  devices per process) exercising shard_batch's
  make_array_from_process_local_data path, the GSPMD grad psum, and the
  local eval mesh, compared against a single-process numpy oracle.
"""

import os
import socket
import subprocess
import sys
from pathlib import Path

import numpy as np
import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pseldnets_tpu.data.sampler import DistributedBatchSampler  # noqa: E402


def test_sampler_partitions_single_process_batches():
    """For every global batch: the per-rank slices are disjoint, their union
    is exactly the world=1 sampler's contiguous global batch over the same
    shuffled index stream, and rank r holds positions r::world of it
    (reference sampler.py:44 rank-strided order)."""
    clip_num, per_rank, world, seed = 103, 8, 4, 77
    global_b = per_rank * world
    single = DistributedBatchSampler(clip_num, global_b, seed=seed,
                                     rank=0, num_replicas=1)
    ranks = [DistributedBatchSampler(clip_num, per_rank, seed=seed,
                                     rank=r, num_replicas=world)
             for r in range(world)]
    it_single = iter(single)
    its = [iter(r) for r in ranks]
    for _ in range(3 * len(single)):  # cross epoch boundaries (reshuffles)
        g = next(it_single)
        parts = [next(it) for it in its]
        assert all(len(p) == per_rank for p in parts)
        # reference rank order: rank r = g[r::world]
        for r, p in enumerate(parts):
            np.testing.assert_array_equal(p, g[r::world])
        # disjoint positions, union == global batch
        interleaved = np.empty(global_b, dtype=g.dtype)
        for r, p in enumerate(parts):
            interleaved[r::world] = p
        np.testing.assert_array_equal(interleaved, g)


def test_sampler_same_padding_across_worlds():
    """last_batch_supplement must pad the same shuffled stream identically
    for world=1 (batch=G) and world=N (batch=G/N) so the partition property
    holds on the wrapped epochs too."""
    clip_num, per_rank, world, seed = 50, 4, 2, 9
    single = DistributedBatchSampler(clip_num, per_rank * world, seed=seed,
                                     rank=0, num_replicas=1)
    multi = DistributedBatchSampler(clip_num, per_rank, seed=seed,
                                    rank=0, num_replicas=world)
    assert single.clip_num == multi.clip_num
    assert len(single) == len(multi)
    np.testing.assert_array_equal(single.indices, multi.indices)


def test_two_process_data_parallel_matches_single_process(tmp_path):
    """Launch 2 real jax processes (2 CPU devices each): rank-strided
    sampler batches + shard_batch over the global 4-device mesh + jitted
    SGD steps. Final params must match a single-process numpy run over the
    world=1 sampler's batches, and both processes must assemble the same
    global batch and produce identical local-mesh eval outputs."""
    worker = Path(__file__).parent / "_mp_worker.py"
    with socket.socket() as s:
        s.bind(("localhost", 0))
        port = s.getsockname()[1]
    env = {k: v for k, v in os.environ.items()
           if k not in ("XLA_FLAGS", "JAX_PLATFORMS")}
    procs = [subprocess.Popen(
        [sys.executable, str(worker), str(i), "2", str(port), str(tmp_path)],
        env=env, stdout=subprocess.PIPE, stderr=subprocess.STDOUT)
        for i in range(2)]
    outs = [p.communicate(timeout=240)[0].decode() for p in procs]
    for p, out in zip(procs, outs):
        assert p.returncode == 0, out
    r0 = np.load(tmp_path / "proc0.npz")
    r1 = np.load(tmp_path / "proc1.npz")

    # both processes hold identical replicated params and eval outputs
    np.testing.assert_array_equal(r0["w"], r1["w"])
    np.testing.assert_array_equal(r0["ev_out"], r1["ev_out"])
    # the assembled global batch is identical on both processes and is the
    # rank-interleaved world=1 global batch
    np.testing.assert_array_equal(r0["first_global"], r1["first_global"])

    # single-process numpy oracle over the same worker model
    sys.path.insert(0, str(worker.parent))
    import importlib

    clip_num, per_rank, world, steps, seed, D = 19, 4, 2, 4, 5, 4

    def item(i):
        rng = np.random.RandomState(1000 + int(i))
        x = rng.standard_normal(D).astype(np.float32)
        return x, np.float32(x.sum() * 0.5)

    single = DistributedBatchSampler(clip_num, per_rank * world, seed=seed,
                                     rank=0, num_replicas=1)
    it = iter(single)
    w = np.zeros(D, np.float64)
    for s in range(steps):
        idx = next(it)
        if s == 0:
            # worker's reassembled global batch == world=1 batch reordered
            # rank-strided: positions r::world belong to rank r
            want = np.stack([item(i)[0] for i in idx])
            got = r0["first_global"]
            reordered = np.concatenate([want[r::world] for r in range(world)])
            np.testing.assert_allclose(got, reordered, rtol=0, atol=0)
            np.testing.assert_array_equal(
                np.concatenate([r0["first_idx_local"], r1["first_idx_local"]]),
                np.concatenate([idx[0::2], idx[1::2]]))
        xs = np.stack([item(i)[0] for i in idx]).astype(np.float64)
        ys = np.asarray([item(i)[1] for i in idx], np.float64)
        g = 2.0 * xs.T @ (xs @ w - ys) / len(idx)
        w = w - 0.1 * g
    np.testing.assert_allclose(r0["w"], w, atol=1e-5)
