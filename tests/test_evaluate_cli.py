"""Standalone scorer CLI: scores prediction CSVs against GT, with jackknife
CIs and per-room consolidation (reference src/evaluate.py)."""

import sys, os

sys.path.insert(0, os.path.join(os.path.dirname(__file__), "..", "src"))

import numpy as np


def _write_stream(path, stream):
    with open(path, "w") as f:
        for frame, rows in sorted(stream.items()):
            for r in rows:
                f.write(f"{frame},{r[0]},{int(r[1])},{int(r[2])}\n")


def _random_stream(rng, num_frames=120, K=5):
    out = {}
    for fr in range(0, num_frames, 2):
        out[fr] = [[int(rng.integers(0, K)), int(rng.integers(-180, 181)),
                    int(rng.integers(-60, 61))]]
    return out


def test_evaluate_cli(tmp_path, rng):
    from cli_loader import load_cli; ev = load_cli("evaluate")

    gt_dir = tmp_path / "gt"
    pred_dir = tmp_path / "pred"
    gt_dir.mkdir()
    pred_dir.mkdir()
    for i in range(4):
        stream = _random_stream(rng)
        _write_stream(gt_dir / f"fold1_room{i % 2}_mix{i:03d}.csv", stream)
        # imperfect predictions: perturb angles
        pred = {fr: [[r[0], r[1] + int(rng.integers(-30, 30)),
                      np.clip(r[2] + int(rng.integers(-20, 20)), -90, 90)]
                     for r in rows]
                for fr, rows in stream.items()}
        _write_stream(pred_dir / f"fold1_room{i % 2}_mix{i:03d}.csv", pred)

    res = ev.main(["--gt_csv_dir", str(gt_dir), "--pred_csv_dir", str(pred_dir),
                   "--nb_classes", "5"])
    ER, F, LE, LR, seld, _ = res
    assert 0 <= F <= 1 and 0 <= LR <= 1 and 0 <= LE <= 180
    assert seld < 1.0  # imperfect but correlated predictions score below chance

    # jackknife CIs bracket the point estimates
    res = ev.main(["--gt_csv_dir", str(gt_dir), "--pred_csv_dir", str(pred_dir),
                   "--nb_classes", "5", "--jackknife"])
    (ERj, ci), *_ = res
    assert ci[0] <= ERj + 1e-6 and ERj - 1e-6 <= ci[1]

    # per-room consolidation parses room ids and scores each
    out = ev.main(["--gt_csv_dir", str(gt_dir), "--pred_csv_dir", str(pred_dir),
                   "--nb_classes", "5", "--consolidate_rooms"])
    assert out is None  # prints only
