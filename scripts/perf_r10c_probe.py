#!/usr/bin/env python
"""Probe R10C: fused-train batch sweep.

The production train step (fused-VJP auto default, r9d/r10a) is recorded at
the reference's B=32. The serving side gained +24% from B=32->128 (einv2,
round 4); the train step's late stages run small L too, so sweep B for the
plain HTSAT mACCDOA step and the AdapterBit step. Per-clip throughput
(clips_per_sec / epoch_min) is the comparable number. ONE process, quiet
box, K=8.
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
    for tag, ov, B in (("plain-b64", [], 64),
                       ("plain-b128", [], 128),
                       ("adapt-b64", ["adapt=adapter"], 64)):
        try:
            bench_train.bench_mode(
                f"train_step_sweep K=8 [{tag}]", ov, B=B)
        except Exception as e:  # noqa: BLE001
            print(f"[{tag}] FAILED: {str(e).splitlines()[0][:300]}",
                  flush=True)
    print(f"total {time.time()-t0:.0f}s", flush=True)


if __name__ == "__main__":
    main()
