#!/bin/bash
# ≙ scripts/lat_resource_eval/svhn_vgg/mask_ensemble: mask-count sweep.
set -e
python -m bayestpu.cli.sweep masks --max_n 8 \
  --out "${OUT:-sweeps/svhn_vgg/mask_ensemble}"
