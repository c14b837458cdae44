#!/usr/bin/env python
"""Probe R3H: batched-ACS eval vs the naive 16-dispatch rotation loop,
on-chip, flagship HTSAT mACCDOA at B=32 (a realistic eval batch)."""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import os

os.environ.setdefault("JAX_COMPILATION_CACHE_DIR", str(REPO / ".jax_cache"))

import jax
import jax.numpy as jnp

B = 32


def main():
    import __graft_entry__ as g
    from pseldnets_tpu.data.datasets import BaseDatasetSpec
    from pseldnets_tpu.train.module import SELDTask

    sys.path.insert(0, str(REPO / "tests"))
    from test_acs_batched import _naive_acs

    cfg = g._base_cfg(tiny=False)

    class _Spec(BaseDatasetSpec):
        def __init__(self):
            super().__init__()
            self.label_dic = {f"c{i}": i for i in range(13)}
            self.max_ov = 3

    task = SELDTask(cfg, _Spec(), steps_per_epoch=10, num_devices=1)
    state = task.init_state(jax.random.PRNGKey(0))
    task._eval_step_fn = task._make_eval_step()
    print("init done", flush=True)

    base = jax.random.normal(jax.random.PRNGKey(3), (B, 4, 240000),
                             jnp.float32) * 0.1
    jax.block_until_ready(base)

    def timeit(name, fn, iters=3):
        t0 = time.time()
        out0 = jax.device_get(fn(base)["multi_accdoa"])
        warm = time.time() - t0
        t0 = time.perf_counter()
        for i in range(iters):
            _ = jax.device_get(fn(base * (1.0 + 1e-4 * (i + 1)))
                               ["multi_accdoa"])
        dt = (time.perf_counter() - t0) / iters
        print(f"{name}: warm {warm:.1f}s steady {dt*1000:.1f} ms/eval-batch",
              flush=True)
        return out0, dt

    o_b, dt_b = timeit("batched ACS (2 dispatches of 8x32)",
                       lambda x: task._acs_forward(state, x))
    o_n, dt_n = timeit("naive ACS (16 dispatches + eager rotations)",
                       lambda x: _naive_acs(task, state, x))
    import numpy as np

    print(f"speedup {dt_n/dt_b:.2f}x, max dev {np.abs(o_b-o_n).max():.2e}",
          flush=True)


if __name__ == "__main__":
    main()
