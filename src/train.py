#!/usr/bin/env python
"""Training CLI (reference src/train.py): `python src/train.py experiment=... k=v ...`.

Composes configs/train.yaml with hydra-style overrides, builds the datamodule
and SELD task, and runs the fit loop on the local device mesh.
"""

import logging
import os
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pseldnets_tpu.config import compose  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = compose(str(REPO / "configs"), "train", argv)

    logging.basicConfig(level=logging.INFO,
                        format="[%(asctime)s][%(name)s] %(message)s")
    log = logging.getLogger("pseldnets")

    if cfg.get("extras", {}).get("print_config", False):
        from pseldnets_tpu.utils.utilities import print_config_tree

        print_config_tree(cfg)

    import numpy as np  # noqa: F401
    import jax

    # trainer.detect_anomaly (reference configs/debug/default.yaml:15): the
    # TPU-native analogue of torch.autograd.detect_anomaly is jax_debug_nans —
    # every jitted computation re-runs un-jitted on a NaN/Inf and raises at
    # the producing primitive
    if cfg.get("trainer", {}).get("detect_anomaly"):
        jax.config.update("jax_debug_nans", True)
        log.info("trainer.detect_anomaly: jax_debug_nans enabled")

    seed = int(cfg.get("seed", 2024))

    from pseldnets_tpu.data import SELDDataModule, get_dataset
    from pseldnets_tpu.train.loop import fit
    from pseldnets_tpu.train.module import SELDTask

    dataset = get_dataset(list(cfg["data"]["train_dataset"].keys())[0], cfg)
    datamodule = SELDDataModule(cfg, dataset, stage="fit")
    log.info("train clips: %d, val clips: %d",
             len(datamodule.train_set), len(datamodule.val_set))

    devices = cfg.get("trainer", {}).get("devices", 1)
    num_devices = None if devices in (-1, "auto") else int(devices)
    from pseldnets_tpu.train.loop import effective_steps_per_epoch

    task = SELDTask(cfg, dataset,
                    steps_per_epoch=effective_steps_per_epoch(datamodule, cfg),
                    num_devices=num_devices)
    ckpt_path = cfg.get("ckpt_path")
    from pathlib import Path as _P

    is_train_resume = bool(ckpt_path) and _P(str(ckpt_path)).is_dir() and         (_P(str(ckpt_path)) / "opt_state").exists()
    state = task.init_state(jax.random.PRNGKey(seed),
                            ckpt_path=None if is_train_resume else ckpt_path)

    from pseldnets_tpu.utils.utilities import count_params

    log.info("model parameters: %s (method=%s backbone=%s)",
             f"{count_params(state.params):,}", task.method,
             task.meta["backbone"])

    output_dir = Path(cfg["paths"]["output_dir"])
    output_dir.mkdir(parents=True, exist_ok=True)
    fit(task, datamodule, state, cfg, output_dir)


if __name__ == "__main__":
    main()
