#!/usr/bin/env python
"""Per-config roofline accounting (round-5 review item #6).

Computes analytic PADDED MAC counts (every Pallas dot's K/N padded to 128
lanes — what the MXU actually executes) for each BASELINE.json config's
device step, and prints achieved padded-TMAC/s against the measured
in-Pallas dense ceiling (scripts/perf_r9c_probe.py calib_true), so the
lowest-MFU config is self-evident each round. XLA conv sections (CNN14
blocks 5-6) are counted at REAL MACs — XLA's conv emitter has its own
padding story; the mixed convention is labeled per row.

Validated: swin_block_padded_macs reproduces r7b's hand-derived stage-0
headdot count (1.74G/image) exactly — see test in __main__.

Usage: python scripts/roofline.py  (pure host math; ms numbers are pasted
from the latest bench_all run — update MEASURED below each refresh).
"""

import math


def pad(x, g=128):
    return -(-x // g) * g


# ---------------------------------------------------------------- swin


def swin_block_padded_macs(L, C, nh, window=8, pair=True, headdot=False,
                           mlp_ratio=4.0, sum_pv=True, merge=False):
    """Padded MACs per image for one fused Swin block (serving layout)."""
    N = window * window
    nW = L // N
    NP = 2 * N if (pair and nW % 2 == 0) else N
    nWp = nW // (NP // N)
    hd = C // nh
    hidden = int(C * mlp_ratio)
    m = 0
    if headdot:
        # q/k/vp per-head direct dots (vp folds proj): 3 sets of nh (C, hd)
        # dots, N-dim padded to 128
        m += 3 * nh * L * pad(C) * pad(hd)
    else:
        cols = 2 * C + nh * (hd + (1 if sum_pv else 0))
        m += L * pad(C) * pad(cols)  # packed qkv
        m += L * pad(C) * pad(C)  # proj
    # scores + PV (paired windows): contraction K = hd (or hd+1) pads to 128
    m += 2 * nh * nWp * NP * NP * pad(hd)
    # mlp
    m += 2 * L * pad(C) * pad(hidden)
    if merge:  # PatchMerging fold: 4 partial (Cp-aligned) reduction dots
        m += (L // 4) * pad(4 * C) * pad(2 * C)
    return m


def htsat_step_padded_macs(B=128, spec=256, patch=4, embed=96,
                           depths=(2, 2, 6, 2), heads=(4, 8, 16, 32)):
    grid = spec // patch  # 64
    total = 0
    for i, (d, nh) in enumerate(zip(depths, heads)):
        L = (grid // 2 ** i) ** 2
        C = embed * 2 ** i
        win = 8 if (grid // 2 ** i) > 8 else grid // 2 ** i
        for j in range(d):
            merge = (j == d - 1) and i < len(depths) - 1
            total += swin_block_padded_macs(L, C, nh, window=win,
                                            headdot=(nh <= 4), merge=merge)
    # patch-embed einsum: (4,4,7,96) per token
    total += grid * grid * pad(4 * 4 * 7) * pad(embed)
    return total * B


# ---------------------------------------------------------------- vit


def vit_block_padded_macs(N=602, C=768, nh=12, hidden=3072, sum_pv=True):
    hd = C // nh
    cols = 2 * C + nh * (hd + (1 if sum_pv else 0))
    m = N * pad(C) * pad(cols)  # qkv
    m += 2 * nh * N * N * pad(hd)  # scores + PV
    m += N * pad(C) * pad(C)  # proj
    m += 2 * N * pad(C) * pad(hidden)  # mlp
    return m


def passt_step_padded_macs(B=128, depth=7, N=602, C=768):
    blocks = depth * vit_block_padded_macs(N=N, C=C)
    patch_embed = 600 * pad(16 * 16 * 7) * pad(C)  # (6,100) grid einsum
    return (blocks + patch_embed) * B


# ---------------------------------------------------------------- cnn


def cnn14_trunk_macs(B=128, feats=(64, 128, 256, 512, 1024, 2048),
                     T=1001, F=64, cin=7, padded_kernel_blocks=4):
    """(real_macs, padded_macs_kernel_part): blocks <= padded_kernel_blocks
    run the fused Pallas conv (im2col 9*Cin dot, K/N padded); the rest XLA
    (real MACs)."""
    real = kern_padded = 0
    pools = [(2, 2)] * 3 + [(1, 2)] * (len(feats) - 3)
    c_in = cin
    t, f = T, F
    for i, c_out in enumerate(feats):
        for (ci, co) in ((c_in, c_out), (c_out, c_out)):
            r = t * f * 9 * ci * co
            real += r
            if i < padded_kernel_blocks:
                kern_padded += t * f * pad(9 * ci) * pad(co)
        t, f = t // pools[i][0], f // pools[i][1]
        c_in = c_out
    return real * B, kern_padded * B


MEASURED = {
    # config: (ms_per_batch, B, padded_macs_fn) — update each bench refresh
    "htsat_maccdoa": (44.51, 128, htsat_step_padded_macs),
    "passt_maccdoa": (66.90, 128, passt_step_padded_macs),  # r9c G=1 defaults
    "cnn14_accdoa": (93.42, 128, None),  # conv table printed separately;
    # r9b trunk-only bucket: 52.1 ms of it is the conv trunk = ~85 TMAC/s
    # REAL — above the 75.5 TMAC/s in-Pallas dense ceiling (r9c calib_true)
}


def main():
    # sanity: reproduce r7b's stage-0 headdot derivation (1.74G/image)
    s0 = swin_block_padded_macs(4096, 96, 4, headdot=True, pair=True)
    assert abs(s0 - 1.74e9) / 1.74e9 < 0.02, s0

    print(f"{'config':>16} {'ms':>8} {'padded MACs/step':>18} "
          f"{'TMAC/s':>8}")
    for name, (ms, B, fn) in MEASURED.items():
        if fn is None:
            real, kern = cnn14_trunk_macs(B=B)
            print(f"{name:>16} {ms:8.2f} trunk real {real/1e12:.2f}T "
                  f"(pallas-part padded {kern/1e12:.2f}T) "
                  f"{real/(ms/1e3)/1e12:8.1f}")
            continue
        macs = fn(B=B)
        print(f"{name:>16} {ms:8.2f} {macs/1e12:18.3f}T "
              f"{macs/(ms/1e3)/1e12:8.1f}")


if __name__ == "__main__":
    main()
