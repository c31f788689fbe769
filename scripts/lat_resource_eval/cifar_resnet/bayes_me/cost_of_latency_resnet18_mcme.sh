#!/bin/bash
# ≙ scripts/lat_resource_eval/cifar_resnet/bayes_me: multi-exit model, mc sweep.
set -e
python -m bayestpu.cli.sweep samples --model resnet18_me --values 2 3 5 7 9 \
  --out "${OUT:-sweeps/cifar_resnet/bayes_me}"
