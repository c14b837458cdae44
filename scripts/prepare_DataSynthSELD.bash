#!/usr/bin/env bash
# Offline preprocessing for the DataSynthSELD synthetic corpus
# (reference scripts/prepare_DataSynthSELD.bash): segment indexes +
# ACCDOA/track/ADPIT labels for every split.
set -e
for ds in train20000_ov1_1 train20000_ov1_2 train10000_ov2_1 train10000_ov2_2 \
          train3500_ov3_1 train3500_ov3_2 test1800_ov1 test900_ov2 test360_ov3; do
  python src/preproc.py dataset=$ds
done
