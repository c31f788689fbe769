#!/bin/bash
# ≙ scripts/lat_resource_eval/mnist_lenet/bayes_me: multi-exit model, mc sweep.
set -e
python -m bayestpu.cli.sweep samples --model lenet_me --values 2 3 5 7 9 \
  --out "${OUT:-sweeps/mnist_lenet/bayes_me}"
