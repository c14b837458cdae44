#!/usr/bin/env python
"""Preprocessing CLI (reference src/preproc.py): per-dataset segment indexes,
ACCDOA/track/ADPIT label HDF5s, L3DAS22 label conversion, offline mic features.
STARSS23-eval (no metadata) extracts indexes only."""

import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent.parent
sys.path.insert(0, str(REPO))

from pseldnets_tpu.config import compose  # noqa: E402


def main(argv=None):
    argv = argv if argv is not None else sys.argv[1:]
    cfg = compose(str(REPO / "configs"), "preproc", argv)

    from pseldnets_tpu.data.datasets import get_dataset
    from pseldnets_tpu.preproc import Preprocess

    dataset = get_dataset(cfg.get("dataset", "synth"), cfg)
    preproc = Preprocess(cfg, dataset)
    if cfg.get("dataset") == "L3DAS22":
        preproc.extract_l3das22_label()
    if cfg["data"]["audio_feature"] not in ("logmelIV", "logmel"):
        preproc.extract_mic_features()
    preproc.extract_index()
    if not (cfg.get("dataset") == "STARSS23" and cfg.get("dataset_type") == "eval"):
        preproc.extract_accdoa_label()
        preproc.extract_track_label()
        preproc.extract_adpit_label()


if __name__ == "__main__":
    main()
