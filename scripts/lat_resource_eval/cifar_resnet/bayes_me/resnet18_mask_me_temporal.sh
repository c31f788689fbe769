#!/bin/bash
# ≙ cifar_resnet/bayes_me/*_mask_me_temporal.sh: multi-exit Masksembles, temporal
# per-mask build (resource strategy).
set -e
OUT=${OUT:-snapshots/cifar_resnet/resnet18_mask_me}
python -m bayestpu.cli.train --model resnet18_me --dataset cifar10 --dropout_type mask \
  --num_masks 4 --mc_samples 4 --epochs "${EPOCHS:-10}" --out "$OUT"
python -m bayestpu.cli.build --model resnet18_me --dataset cifar10 --dropout_type mask \
  --num_masks 4 --mc_samples 4 --load_model "$OUT" \
  --build_strategy resource --output_dir "$OUT/build" --bench
