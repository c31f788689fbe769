#!/bin/bash
# ≙ scripts/lat_resource_eval/cifar_resnet/mc_dropout/cost_of_latency_*: mc_samples
# sweep {2,3,5,7,9}; spatial/temporal mapping replaces Strategy latency/resource.
set -e
python -m bayestpu.cli.sweep samples --model resnet18 --values 2 3 5 7 9 \
  --out "${OUT:-sweeps/cifar_resnet/mc_dropout}"
