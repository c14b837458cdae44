#!/usr/bin/env bash
# DCASE2021 Task 3 preprocessing (download the zenodo archives first — see
# the dataset page; this box has no network egress).
set -e
python src/preproc.py dataset=DCASE2021 wav_format=.wav
python src/preproc.py dataset=DCASE2021 dataset_type=eval wav_format=.wav
