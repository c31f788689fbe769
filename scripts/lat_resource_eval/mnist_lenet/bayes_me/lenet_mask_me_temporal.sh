#!/bin/bash
# ≙ mnist_lenet/bayes_me/*_mask_me_temporal.sh: multi-exit Masksembles, temporal
# per-mask build (resource strategy).
set -e
OUT=${OUT:-snapshots/mnist_lenet/lenet_mask_me}
python -m bayestpu.cli.train --model lenet_me --dataset mnist --dropout_type mask \
  --num_masks 4 --mc_samples 4 --epochs "${EPOCHS:-10}" --out "$OUT"
python -m bayestpu.cli.build --model lenet_me --dataset mnist --dropout_type mask \
  --num_masks 4 --mc_samples 4 --load_model "$OUT" \
  --build_strategy resource --output_dir "$OUT/build" --bench
