#!/usr/bin/env python
"""Round 2 of the PatchMerging select+concat legality hunt at C=96.

probe_merge_ops.py found all of {6-D strided views, lane-merge reshape
(R,C)->(R/2,2C), middle-index with lane-strided inner dims} Mosaic-illegal
at C=96 (every variant compiled at C=128 except the strided views). Here:
candidates that keep the lane dim untouched (row-parity selection is pure
sublane work because tokens are row-major in (h, w)) and candidates that
lane-pad C->128 first.
"""

import sys
import time
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

import jax
import jax.numpy as jnp
import numpy as np
from jax.experimental import pallas as pl

G, H, W, C = 4, 16, 16, 96
L = H * W
R4 = G * L // 4


def oracle_pieces(x):
    v = x.reshape(G, H // 2, 2, W // 2, 2, C)
    return [v[:, :, 0, :, 0].reshape(R4, C), v[:, :, 1, :, 0].reshape(R4, C),
            v[:, :, 0, :, 1].reshape(R4, C), v[:, :, 1, :, 1].reshape(R4, C)]


def _rowsel_pieces(out):
    # w-parity: adjacent tokens are adjacent rows -> (R/2, 2, C) mid-index
    a = out.reshape(G * L // 2, 2, C)
    w0, w1 = a[:, 0], a[:, 1]          # (G*L/2, C) even-/odd-w tokens
    # h-parity: alternating blocks of W//2 rows
    w0 = w0.reshape(G * (H // 2), 2, (W // 2) * C)
    w1 = w1.reshape(G * (H // 2), 2, (W // 2) * C)
    return [w0[:, 0].reshape(R4, C), w0[:, 1].reshape(R4, C),
            w1[:, 0].reshape(R4, C), w1[:, 1].reshape(R4, C)]


def k_rowsel_pieces(x_ref, o0, o1, o2, o3):
    ps = _rowsel_pieces(x_ref[:])
    for o, p in zip((o0, o1, o2, o3), ps):
        o[:] = p


def k_rowsel_concat(x_ref, o_ref):
    o_ref[:] = jnp.concatenate(_rowsel_pieces(x_ref[:]), axis=-1)


def k_rowsel_sumdots(x_ref, w_ref, o_ref):
    ps = _rowsel_pieces(x_ref[:])
    acc = jnp.zeros((R4, 2 * C), jnp.float32)
    for i, p in enumerate(ps):
        acc = acc + jnp.dot(p, w_ref[i * C:(i + 1) * C, :],
                            preferred_element_type=jnp.float32)
    o_ref[:] = acc


def _pad128(out):
    pad = jnp.zeros((out.shape[0], 128 - C), out.dtype)
    return jnp.concatenate([out, pad], axis=-1)  # (R, 128)


def k_pad_rollhalves(x_ref, o_ref):
    # lane-pad to 128, THEN the (R,128)->(R/2,256) lane-merge reshape is
    # tile-aligned; pieces come out 128-wide, output keeps the pad columns
    xp = _pad128(x_ref[:])
    a = xp.reshape(G * H * (W // 2), 2 * 128)
    w0 = a[:, :128].reshape(G * (H // 2), 2, (W // 2), 128)
    w1 = a[:, 128:].reshape(G * (H // 2), 2, (W // 2), 128)
    ps = [w0[:, 0], w0[:, 1], w1[:, 0], w1[:, 1]]
    o_ref[:] = jnp.concatenate([p.reshape(R4, 128) for p in ps], axis=-1)


def k_pad_sumdots(x_ref, w_ref, o_ref):
    # padded pieces + (128,2C)-sliced zero-padded weight: no concat at all
    xp = _pad128(x_ref[:])
    a = xp.reshape(G * H * (W // 2), 2 * 128)
    w0 = a[:, :128].reshape(G * (H // 2), 2, (W // 2), 128)
    w1 = a[:, 128:].reshape(G * (H // 2), 2, (W // 2), 128)
    ps = [w0[:, 0], w0[:, 1], w1[:, 0], w1[:, 1]]
    acc = jnp.zeros((R4, 2 * C), jnp.float32)
    for i, p in enumerate(ps):
        acc = acc + jnp.dot(p.reshape(R4, 128), w_ref[i * 128:(i + 1) * 128],
                            preferred_element_type=jnp.float32)
    o_ref[:] = acc


def run(name, kern, n_out=1, extra=None, out_lanes=None):
    x = jnp.asarray(np.random.RandomState(0).randn(G * L, C), jnp.float32)
    args = [x] + ([extra] if extra is not None else [])
    lanes = out_lanes or (C if n_out == 4 else 4 * C)
    outs = [jax.ShapeDtypeStruct((R4, lanes), jnp.float32)] * n_out
    try:
        t0 = time.perf_counter()
        f = pl.pallas_call(kern, out_shape=outs if n_out > 1 else outs[0])
        y = jax.jit(f)(*args)
        dt = time.perf_counter() - t0
        y = [np.asarray(v) for v in (y if n_out > 1 else [y])]
        ps = oracle_pieces(np.asarray(x))
        if n_out == 4:
            dev = max(np.abs(a - b).max() for a, b in zip(y, ps))
        elif extra is not None:
            we = np.asarray(extra)
            if we.shape[0] == 4 * 128:  # padded weight
                ref = sum(np.pad(p, ((0, 0), (0, 32))) @ we[i * 128:(i + 1) * 128]
                          for i, p in enumerate(ps))
            else:
                ref = np.concatenate(ps, -1) @ we
            dev = np.abs(y[0] - ref).max()
        else:
            cat = np.concatenate(ps, -1)
            dev = np.abs(y[0][:, :cat.shape[1]] - cat).max() \
                if y[0].shape[1] == cat.shape[1] else \
                max(np.abs(y[0][:, i * 128:i * 128 + C] - ps[i]).max()
                    for i in range(4))
        print(f"[{name}] OK {dt:.1f}s  max dev {dev:.2e}", flush=True)
    except Exception as e:  # noqa: BLE001
        msg = str(e)
        i = msg.find("Mosaic failed")
        print(f"[{name}] FAIL: {msg[i:i + 200] if i >= 0 else msg[:200]}",
              flush=True)


if __name__ == "__main__":
    rs = np.random.RandomState(1)
    wred = jnp.asarray(rs.randn(4 * C, 2 * C) * 0.05, jnp.float32)
    wpad = jnp.asarray(np.concatenate([np.pad(np.asarray(wred)[i * C:(i + 1) * C],
                                              ((0, 32), (0, 0)))
                                       for i in range(4)]), jnp.float32)
    run("rowsel-pieces", k_rowsel_pieces, n_out=4)
    run("rowsel-concat", k_rowsel_concat)
    run("rowsel-sumdots", k_rowsel_sumdots, extra=wred, out_lanes=2 * C)
    run("pad-rollhalves", k_pad_rollhalves, out_lanes=4 * 128)
    run("pad-sumdots", k_pad_sumdots, extra=wpad, out_lanes=2 * C)
