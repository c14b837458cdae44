#!/usr/bin/env bash
# L3DAS22 Task 2 preprocessing: label CSV conversion + indexes + labels.
set -e
python src/preproc.py dataset=L3DAS22 wav_format=.wav
python src/preproc.py dataset=L3DAS22 dataset_type=eval wav_format=.wav
