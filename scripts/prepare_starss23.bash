#!/usr/bin/env bash
# STARSS23 preprocessing: dev (with labels) + eval (indexes only).
set -e
python src/preproc.py dataset=STARSS23
python src/preproc.py dataset=STARSS23 dataset_type=eval wav_format=.wav
