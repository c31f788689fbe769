#!/bin/bash
# ≙ scripts/lat_resource_eval/mnist_lenet/mask_ensemble: mask-count sweep.
set -e
python -m bayestpu.cli.sweep masks --max_n 8 \
  --out "${OUT:-sweeps/mnist_lenet/mask_ensemble}"
