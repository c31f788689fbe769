#!/bin/bash
# ≙ scripts/lat_resource_eval/cifar_resnet/mc_dropout/cost_of_resource_*: mc_samples
# sweep {2,3,5,7,9} under Strategy=Resource — here the temporal mapping
# (lax.scan time-multiplexes one set of head hardware ≙ ReuseFactor).
set -e
python -m bayestpu.cli.sweep samples --model resnet18 --values 2 3 5 7 9 \
  --modes temporal --out "${OUT:-sweeps/cifar_resnet/mc_dropout_resource}"
