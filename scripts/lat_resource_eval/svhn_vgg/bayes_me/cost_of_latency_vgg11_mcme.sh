#!/bin/bash
# ≙ scripts/lat_resource_eval/svhn_vgg/bayes_me: multi-exit model, mc sweep.
set -e
python -m bayestpu.cli.sweep samples --model vgg11_me --values 2 3 5 7 9 \
  --out "${OUT:-sweeps/svhn_vgg/bayes_me}"
