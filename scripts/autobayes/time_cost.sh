#!/bin/bash
# ≙ Hardware_Artifact/autobayes/time_cost.sh: 100-loop conversion+compile timing.
set -e
for NET in lenet lenet1 lenet5 vgg11 resnet18; do
  python -m bayestpu.cli.time_cost "$NET" --loops "${LOOPS:-100}" \
    --out_dir "timing"
done
