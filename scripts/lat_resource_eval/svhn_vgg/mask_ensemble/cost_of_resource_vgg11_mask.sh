#!/bin/bash
# ≙ cost_of_resource_*_mask.sh: mask-count sweep under Strategy=Resource
# (temporal per-mask re-run, the fork's predict(x, mask_index=i) loop).
set -e
python -m bayestpu.cli.sweep samples --model vgg11 --values 2 3 5 7 9 \
  --dropout_type mask --modes temporal \
  --out "${OUT:-sweeps/svhn_vgg/mask_ensemble_resource}"
