"""Observability utilities.

Parity: reference src/utils/utilities.py — rank-zero python logger (:35-46),
rich config tree printing (:145-203), convert_ordinal, param counting — plus
logger backends (TensorBoard / CSV / JSONL) instantiated from the reference's
configs/logger/* `_target_` strings.
"""

import json
import logging
from pathlib import Path
from typing import Dict, Optional


def get_pylogger(name=__name__) -> logging.Logger:
    """Rank-zero-only logger: on multi-process JAX, non-zero hosts log at
    WARNING and above only."""
    logger = logging.getLogger(name)
    try:
        import jax

        if jax.process_index() != 0:
            logger.setLevel(logging.WARNING)
    except Exception:
        pass
    return logger


def convert_ordinal(n: int) -> str:
    suffix = {1: "st", 2: "nd", 3: "rd"}.get(n % 10 if n % 100 not in (11, 12, 13) else 0, "th")
    return f"{n}{suffix}"


def count_params(params) -> int:
    import jax

    return sum(x.size for x in jax.tree_util.tree_leaves(params))


def print_config_tree(cfg, resolve: bool = True):
    """Rich tree of the composed config (reference utilities.py:145-203)."""
    try:
        import rich
        import rich.syntax
        import rich.tree
        import yaml

        from ..config import to_dict

        tree = rich.tree.Tree("CONFIG", style="dim")
        for key, value in to_dict(cfg).items():
            branch = tree.add(str(key))
            if isinstance(value, dict):
                branch.add(rich.syntax.Syntax(
                    yaml.dump(value, default_flow_style=False), "yaml"))
            else:
                branch.add(str(value))
        rich.print(tree)
    except Exception:
        logging.getLogger("pseldnets").info("config: %s", cfg)


class JsonlLogger:
    def __init__(self, path: Path):
        self.path = Path(path)
        self.path.parent.mkdir(parents=True, exist_ok=True)

    def log_metrics(self, metrics: Dict, step: int):
        with open(self.path, "a") as f:
            f.write(json.dumps({"step": step, **metrics}) + "\n")

    def close(self):
        pass


class CsvLogger:
    def __init__(self, save_dir, name="csv", **_):
        self.path = Path(save_dir) / name / "metrics.csv"
        self.path.parent.mkdir(parents=True, exist_ok=True)
        self._keys = None

    def log_metrics(self, metrics: Dict, step: int):
        row = {"step": step, **metrics}
        if self._keys is None:
            self._keys = list(row.keys())
            with open(self.path, "a") as f:
                f.write(",".join(self._keys) + "\n")
        with open(self.path, "a") as f:
            f.write(",".join(str(row.get(k, "")) for k in self._keys) + "\n")

    def close(self):
        pass


class TensorBoardLogger:
    def __init__(self, save_dir, name=None, **_):
        from torch.utils.tensorboard import SummaryWriter

        path = Path(save_dir) / (name or "")
        path.mkdir(parents=True, exist_ok=True)
        self.writer = SummaryWriter(str(path))

    def log_metrics(self, metrics: Dict, step: int):
        for k, v in metrics.items():
            if isinstance(v, (int, float)):
                self.writer.add_scalar(k, v, step)

    def close(self):
        self.writer.close()


_LOGGER_TARGETS = {
    "lightning.pytorch.loggers.tensorboard.TensorBoardLogger": TensorBoardLogger,
    "lightning.pytorch.loggers.csv_logs.CSVLogger": CsvLogger,
}


def instantiate_loggers(logger_cfg: Optional[Dict], output_dir: Path):
    """Resolve reference-style logger configs; unknown targets fall back to
    JSONL so runs never lose metrics."""
    loggers = []
    for name, sub in (logger_cfg or {}).items():
        if not isinstance(sub, dict) or "_target_" not in sub:
            continue
        cls = _LOGGER_TARGETS.get(sub["_target_"])
        kwargs = {k: v for k, v in sub.items() if k != "_target_"}
        try:
            if cls is not None:
                loggers.append(cls(**kwargs))
        except Exception as e:
            logging.getLogger("pseldnets").warning("logger %s failed: %s", name, e)
    loggers.append(JsonlLogger(Path(output_dir) / "metrics_stream.jsonl"))
    return loggers


def flatten_metrics(d: Dict, prefix: str = "") -> Dict:
    out = {}
    for k, v in d.items():
        key = f"{prefix}{k}"
        if isinstance(v, dict):
            out.update(flatten_metrics(v, key + "/"))
        elif isinstance(v, (int, float)):
            out[key] = float(v)
    return out
