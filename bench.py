#!/usr/bin/env python
"""Benchmark: preproc+HTSAT multi-ACCDOA inference throughput on one chip.

Measures the BASELINE.json headline metric — 1-minute FOA clips/sec/chip for
the fused on-device feature chain (STFT->mel->IV) + HTS-AT forward — on the
default JAX backend (the real TPU under the driver). Prints ONE JSON line:
{"metric": ..., "value": N, "unit": ..., "vs_baseline": N}.

vs_baseline normalizes against the driver target of 5x an A100 running the
torch reference pipeline; we estimate the A100 preproc+HTSAT inference rate at
60 one-minute clips/sec/chip (no published throughput exists — the reference
publishes quality numbers only, SURVEY §6), i.e. target = 300 clips/s/chip.
"""

import json
import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent
sys.path.insert(0, str(REPO))

import os as _os

_os.environ.setdefault("JAX_COMPILATION_CACHE_DIR",
                       str(Path(__file__).resolve().parent / ".jax_cache"))
_os.environ.setdefault("JAX_PERSISTENT_CACHE_MIN_COMPILE_TIME_SECS", "5")


TARGET_CLIPS_PER_SEC = 300.0  # 5 x estimated A100 torch-reference rate


def _wait_for_backend(attempts: int = 5, sleep_s: float = 120.0):
    """Wait out transient relay outages (observed: minutes to hours of
    UNAVAILABLE) so a hiccup at bench time doesn't record nothing. Probes in
    a SUBPROCESS: jax caches a failed backend init for the process lifetime,
    so the main process must only touch the device once a probe succeeds."""
    import subprocess

    # devices() exercises backend init (where outages surface both as fast
    # UNAVAILABLE errors and as indefinite hangs) WITHOUT the
    # first-execution chip claim, so the probe is fast when the relay is up.
    # Budget: attempts*(probe timeout + sleep) must fit the driver's window.
    probe = "import jax; assert jax.devices()"
    err = b""
    for i in range(attempts):
        try:
            r = subprocess.run([sys.executable, "-c", probe],
                               capture_output=True, timeout=360)
            if r.returncode == 0:
                return
            err = r.stderr
        except subprocess.TimeoutExpired:
            err = b"probe hung >360s (relay init stall)"
        if i == attempts - 1:
            sys.stderr.write(err.decode(errors="replace")[-2000:])
            raise RuntimeError("TPU backend unavailable after retries")
        print(f"backend unavailable; retry {i + 1}/{attempts - 1} "
              f"in {sleep_s:.0f}s", file=sys.stderr, flush=True)
        time.sleep(sleep_s)


def main():
    import jax
    import jax.numpy as jnp

    _wait_for_backend()

    from pseldnets_tpu.config import compose
    from pseldnets_tpu.models import build_model
    from pseldnets_tpu.ops import make_extractor

    cfg = compose(str(REPO / "configs"), "train",
                  ["loss=multi_accdoa", "model.kwargs.pretrained_path=null"])
    num_classes = 13
    model, _ = build_model(cfg, num_classes, dtype=jnp.bfloat16)
    from pseldnets_tpu.ops.pallas.frontend import fused_logmel_iv

    def extractor(w):
        # production serving config: fused Pallas kernel with the split-bf16
        # 3-dot DFT (max dB error vs f32-HIGHEST: 8e-4, validated on-chip)
        return fused_logmel_iv(w, split3=True)

    # Methodology: every sub-step consumes a DIFFERENT input (derived on
    # device from a base batch and the iteration index) and contributes a
    # scalar to the fetched result — the remote-execution relay dedupes
    # identical dispatches and async laziness would otherwise hide work.
    # K batches are processed per dispatch so the dev harness's ~25 ms
    # per-dispatch relay round-trip doesn't masquerade as device time (a
    # production host dispatches over PCIe at ~10 us). The K batches run
    # in a lax.fori_loop: the body compiles ONCE (~75 s vs ~24 min for the
    # K=16 unrolled harness) and measured steady-state matches/beats the
    # unrolled harness (scripts/perf_r3f/g_probe.py: fori K=64 58.9 ms/batch
    # vs unrolled K=16 60.2).
    B = 128  # 10-second clips per batch
    K = 64   # batches per dispatch (fori body -> compile cost is K-free)
    rng = jax.random.PRNGKey(0)
    feats = extractor(jnp.zeros((2, 4, 240000), jnp.float32))
    # jit the init: eager flax init dispatches thousands of individual ops,
    # which is pathologically slow over the remote-execution relay
    variables = jax.jit(lambda r, f: model.init({"params": r}, f, train=False))(rng, feats)

    base = jax.random.normal(jax.random.PRNGKey(42), (B, 4, 240000),
                             jnp.float32) * 0.1

    from pseldnets_tpu.serving import htsat_fused_forward_from_wav

    @jax.jit
    def step(variables, base, k):
        def body(i, acc):
            # fused-kernel serving path (pallas Swin blocks, eval ScalarBN +
            # frame pad + bf16 cast folded into the frontend kernel, harness
            # scale riding the prep concatenate): 55.47 -> 54.14 ms/batch vs
            # the unfused extractor->forward split, on-chip parity 0.0
            # (scripts/perf_r4f_probe.py); CPU parity in
            # tests/test_serving_fused.py
            # wav_scale defeats relay dedupe / loop hoisting; with
            # pre_scale_head it touches ONLY the 512-sample reflect head
            # (~0.4% of the multiply — the full-signal ride cost ~3%:
            # 463.9 vs 479.9 clips/s, scripts/perf_r7a_probe.py), frames
            # >= 3 bit-identical to production's unscaled prep
            out = htsat_fused_forward_from_wav(
                model, variables, base, wav_scale=1.0 + 1e-4 * (k * K + i),
                pre_scale_head=True, split3=True)
            return acc + out["multi_accdoa"].astype(jnp.float32).mean()
        return jax.lax.fori_loop(0, K, body, jnp.float32(0))

    _ = float(step(variables, base, jnp.int32(0)))  # compile + materialize

    iters = 5
    jax.block_until_ready(base)
    t0 = time.perf_counter()
    for i in range(iters):
        _ = float(step(variables, base, jnp.int32(i + 1)))
    dt = (time.perf_counter() - t0) / (iters * K)

    one_min_clips_per_sec = (B / dt) / 6.0
    print(json.dumps({
        "metric": "1min_FOA_clips/sec/chip (pallas radix2-split3 pack+rsqrt lane-trim glue-folded frontend + fused-block HTSAT mACCDOA fwd with in-kernel PatchMerging, per-head-dot stage-0 attention + no-max exp2 softmax, paired-window dots + in-dot softmax denominators, einsum patch-embed, bf16, B=128, fori K=64 batches/dispatch)",
        "value": round(one_min_clips_per_sec, 3),
        "unit": "clips/s",
        "vs_baseline": round(one_min_clips_per_sec / TARGET_CLIPS_PER_SEC, 4),
    }))


if __name__ == "__main__":
    main()
