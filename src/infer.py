#!/usr/bin/env python
"""Inference CLI (reference src/infer.py): mode=valid scores against GT;
mode=test writes DCASE submission CSVs to <output_dir>/submissions."""

import logging
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pseldnets_tpu.config import compose  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = compose(str(REPO / "configs"), "infer", argv)
    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s][%(name)s] %(message)s")
    log = logging.getLogger("pseldnets")

    import jax

    from pseldnets_tpu.data import SELDDataModule, get_dataset
    from pseldnets_tpu.metrics import SELDMetrics
    from pseldnets_tpu.train.loop import run_test, run_validation
    from pseldnets_tpu.train.module import SELDTask

    mode = cfg.get("mode", "valid")
    name_key = "valid_dataset" if mode == "valid" else "test_dataset"
    dataset = get_dataset(list(cfg["data"][name_key].keys())[0], cfg)
    datamodule = SELDDataModule(cfg, dataset, stage="fit" if mode == "valid" else "test")

    devices = cfg.get("trainer", {}).get("devices", 1)
    num_devices = None if devices in (-1, "auto") else int(devices)
    task = SELDTask(cfg, dataset, num_devices=num_devices)
    state = task.init_state(jax.random.PRNGKey(int(cfg.get("seed", 42))),
                            ckpt_path=cfg.get("ckpt_path"))

    output_dir = Path(cfg["paths"]["output_dir"])
    output_dir.mkdir(parents=True, exist_ok=True)
    if mode == "valid":
        metrics = SELDMetrics(nb_classes=task.num_classes, doa_threshold=20)
        macro, micro, losses = run_validation(task, datamodule, state, metrics)
        log.info("val/macro: %s", macro)
        log.info("val/micro: %s", micro)
        import json

        with open(output_dir / "results.json", "w") as f:
            json.dump({"macro": macro, "micro": micro, "losses": losses}, f, indent=2)
        return macro
    run_test(task, datamodule, state, output_dir / "submissions")


if __name__ == "__main__":
    main()
