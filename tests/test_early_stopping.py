"""EarlyStopping callback semantics (reference
configs/callbacks/early_stopping.yaml; VERDICT round-2 missing #4)."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pseldnets_tpu.config import compose  # noqa: E402
from pseldnets_tpu.train.loop import (EarlyStopping,  # noqa: E402
                                      make_early_stopping)


def test_patience_counts_checks_without_improvement():
    es = EarlyStopping("val/macro/SELD_scr", mode="min", patience=2,
                       min_delta=0.0)
    assert es.should_stop({"val/macro/SELD_scr": 0.5}) is None  # best=0.5
    assert es.should_stop({"val/macro/SELD_scr": 0.4}) is None  # improved
    assert es.should_stop({"val/macro/SELD_scr": 0.4}) is None  # wait 1
    r = es.should_stop({"val/macro/SELD_scr": 0.45})            # wait 2
    assert r is not None and "did not improve" in r


def test_improvement_resets_wait_and_min_delta_gates():
    es = EarlyStopping("m", mode="min", patience=2, min_delta=0.1)
    assert es.should_stop({"m": 1.0}) is None
    assert es.should_stop({"m": 0.95}) is None   # < min_delta: wait 1
    assert es.should_stop({"m": 0.5}) is None    # real improvement resets
    assert es.wait_count == 0
    assert es.should_stop({"m": 0.5}) is None
    assert es.should_stop({"m": 0.5}) is not None


def test_max_mode_and_thresholds_and_nan():
    es = EarlyStopping("f1", mode="max", patience=5,
                       stopping_threshold=0.9)
    assert es.should_stop({"f1": 0.5}) is None
    assert "stopping_threshold" in es.should_stop({"f1": 0.95})
    es2 = EarlyStopping("f1", mode="max", patience=5,
                        divergence_threshold=0.1)
    assert "divergence_threshold" in es2.should_stop({"f1": 0.05})
    es3 = EarlyStopping("f1", mode="max", patience=5)
    assert "not finite" in es3.should_stop({"f1": float("nan")})
    # missing monitor key (e.g. a non-validation epoch): no-op
    assert es3.should_stop({"other": 1.0}) is None


def test_config_arming_matches_reference_semantics():
    # default callbacks: inert block (no _target_) -> NOT armed
    cfg = compose(str(REPO / "configs"), "train",
                  ["model.kwargs.pretrained_path=null"])
    assert "early_stopping" in (cfg.get("callbacks") or {})
    assert make_early_stopping(cfg) is None
    # explicitly composing early_stopping.yaml arms it
    cfg2 = compose(str(REPO / "configs"), "train",
                   ["callbacks=early_stopping",
                    "callbacks.early_stopping.monitor=val/macro/SELD_scr",
                    "model.kwargs.pretrained_path=null"])
    es = make_early_stopping(cfg2)
    assert es is not None and es.monitor == "val/macro/SELD_scr"
