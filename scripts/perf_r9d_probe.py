#!/usr/bin/env python
"""Probe R9D (round 5): full-step fused-forward training A/B (VERDICT #3).

train/fused_forward.py wires the CURRENT serving Swin kernels (merge_fold,
headdot, nomax/sum_pv, paired dots) + the hand-written backward kernels
(ops/pallas/swin_block_vjp) into the train step behind the additive
``trainer.fused_forward`` knob. The only prior fwd+bwd A/B (round 2) was
stage-0-shape-only and predates all of those wins; this measures the FULL
B=32 HTSAT mACCDOA step flax vs fused in ONE process.

K=8 (not bench_train's production 16) keeps the fused side's XLA compile
bounded (CLAUDE.md: K=16 x fused fwd ~ 24 min; fwd+bwd worse) — both sides
run the same K so the A/B is fair; bench_train re-measures the winner at
K=16 if the default ever flips.

Quiet box required (no concurrent pytest/dryrun).
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import bench_train  # noqa: E402


def main():
    from bench import _wait_for_backend
    _wait_for_backend()
    bench_train.K = 8
    t0 = time.time()
    for tag, ov in (("flax", []),
                    ("fused-vjp-blocks", ["trainer.fused_forward=true"])):
        try:
            bench_train.bench_mode(
                f"train_step_htsat_maccdoa_b32 K=8 A/B [{tag}]", ov, B=32)
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] FAILED: {str(e).splitlines()[0][:300]}",
                  flush=True)
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
