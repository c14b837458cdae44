"""SELD metric + DCASE-format parity tests against the reference implementation
(imported as oracle) on randomized event streams."""

import sys, os

sys.path.insert(0, os.path.dirname(__file__))

import numpy as np

from reference_oracle import load_reference
from pseldnets_tpu import metrics as M

load_reference()
import torch  # noqa: E402
from utils import SELD_metrics as ref_metrics  # noqa: E402
from utils import data_utilities as ref_du  # noqa: E402


def _random_event_stream(rng, num_frames=200, K=6, max_ev=3):
    out = {}
    for f in range(num_frames):
        n = rng.integers(0, max_ev + 1)
        if n == 0:
            continue
        rows = []
        for _ in range(n):
            cls = int(rng.integers(0, K))
            azi = float(rng.integers(-180, 181))
            ele = float(rng.integers(-60, 61))
            rows.append([cls, azi, ele])
        out[f] = rows
    return out


def test_to_metrics_format_parity(rng):
    stream = _random_event_stream(rng)
    ref = ref_du.to_metrics_format(stream, 200)
    got = M.to_metrics_format(stream, 200)
    assert ref == got


def test_polar_cartesian_roundtrip_parity(rng):
    stream = _random_event_stream(rng, num_frames=50)
    ref = ref_du.convert_output_format_polar_to_cartesian(stream)
    got = M.convert_output_format_polar_to_cartesian(stream)
    for f in ref:
        np.testing.assert_allclose(ref[f], got[f], atol=1e-12)
    back_ref = ref_du.convert_output_format_cartesian_to_polar(ref)
    back_got = M.convert_output_format_cartesian_to_polar(got)
    for f in back_ref:
        np.testing.assert_allclose(back_ref[f], back_got[f], atol=1e-9)


def _perturb(stream, rng, drop_p=0.2, jitter=25.0, K=6):
    out = {}
    for f, rows in stream.items():
        kept = []
        for r in rows:
            if rng.random() < drop_p:
                continue
            kept.append([r[0],
                         r[1] + rng.normal() * jitter,
                         np.clip(r[2] + rng.normal() * jitter, -90, 90)])
        if rng.random() < 0.1:
            kept.append([int(rng.integers(0, K)), float(rng.integers(-180, 181)),
                         float(rng.integers(-60, 61))])
        if kept:
            out[f] = kept
    return out


def test_seld_metrics_parity(rng):
    K = 6
    for avg in ("macro", "micro"):
        ref_m = ref_metrics.SELDMetrics(doa_threshold=20, nb_classes=K)
        got_m = M.SELDMetrics(doa_threshold=20, nb_classes=K)
        for _ in range(4):  # several files
            gt = _random_event_stream(rng, K=K)
            pred = _perturb(gt, rng, K=K)
            gt_cart = ref_du.convert_output_format_polar_to_cartesian(gt)
            pred_cart = ref_du.convert_output_format_polar_to_cartesian(pred)
            gt_seg = ref_du.to_metrics_format(gt_cart, 200)
            pred_seg = ref_du.to_metrics_format(pred_cart, 200)
            ref_m.update_seld_scores(pred_seg, gt_seg)
            got_m.update_seld_scores(pred_seg, gt_seg)
        ref_scores, ref_cls = ref_m.compute_seld_scores(avg)
        got_scores, got_cls = got_m.compute_seld_scores(avg)
        for k in ref_scores:
            np.testing.assert_allclose(got_scores[k], ref_scores[k], rtol=1e-9,
                                       err_msg=f"{avg}/{k}")
        if avg == "macro":
            np.testing.assert_allclose(np.asarray(got_cls), np.asarray(ref_cls),
                                       rtol=1e-9)


def test_accdoa_decode_parity(rng):
    K = 6
    x = rng.standard_normal((40, 3 * K)).astype(np.float32) * 0.5
    ref_sed, _ = ref_du.get_accdoa_labels(torch.from_numpy(x[None]), K,
                                          sed_threshold=0.5, max_ov=3)
    got_sed, _ = M.get_accdoa_labels(x[None], K, sed_threshold=0.5, max_ov=3)
    np.testing.assert_array_equal(got_sed[0], ref_sed[0].numpy())
    ref_dict = ref_du.accdoa_label_to_dcase_format(ref_sed[0].numpy(), x, nb_classes=K)
    got_dict = M.accdoa_label_to_dcase_format(got_sed[0], x, nb_classes=K)
    assert ref_dict.keys() == got_dict.keys()
    for f in ref_dict:
        np.testing.assert_allclose(np.array(ref_dict[f], float),
                                   np.array(got_dict[f], float), atol=1e-7)


def test_multi_accdoa_decode_parity(rng):
    K = 5
    x = rng.standard_normal((1, 30, 9 * K)).astype(np.float32) * 0.6
    ref_sed, ref_doa = ref_du.get_multi_accdoa_labels(torch.from_numpy(x), K,
                                                      sed_threshold=0.5)
    got_sed, got_doa = M.get_multi_accdoa_labels(x, K, sed_threshold=0.5)
    np.testing.assert_array_equal(got_sed, ref_sed.numpy())
    # squeeze batch for the unification step (reference call site does this)
    r = ref_du.multi_accdoa_to_dcase_format(ref_sed[:, 0].numpy(), ref_doa[:, 0].numpy(),
                                            threshold_unify=15, nb_classes=K)
    g = M.multi_accdoa_to_dcase_format(got_sed[:, 0], got_doa[:, 0],
                                       threshold_unify=15, nb_classes=K)
    assert r.keys() == g.keys()
    for f in r:
        np.testing.assert_allclose(np.array(r[f], float), np.array(g[f], float),
                                   atol=1e-6)


def test_segment_index_parity(rng):
    for x_len, chunk, hop, pad_last in [(600, 100, 100, False), (650, 100, 100, False),
                                        (649, 100, 100, True), (50, 100, 100, False),
                                        (730, 100, 50, False), (730, 100, 50, True)]:
        dummy = np.zeros((1, x_len))
        ref_idx, ref_pad = ref_du.segment_index(dummy, chunk, hop, pad_last)
        got_idx, got_pad = M.segment_index(x_len, chunk, hop, pad_last)
        assert list(map(tuple, ref_idx)) == got_idx
        assert list(map(tuple, ref_pad)) == got_pad


def test_track_decode_parity(rng):
    sed = rng.random((20, 3, 5)) > 0.8
    doa = rng.standard_normal((20, 3, 2)).astype(np.float32)
    r = ref_du.track_to_dcase_format(sed, doa)
    g = M.track_to_dcase_format(sed, doa)
    assert r.keys() == g.keys()
    for f in r:
        assert r[f] == g[f]
