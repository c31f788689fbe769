#!/bin/bash
# ≙ svhn_vgg/bayes_me/*_mask_me_temporal.sh: multi-exit Masksembles, temporal
# per-mask build (resource strategy).
set -e
OUT=${OUT:-snapshots/svhn_vgg/vgg11_mask_me}
python -m bayestpu.cli.train --model vgg11_me --dataset svhn --dropout_type mask \
  --num_masks 4 --mc_samples 4 --epochs "${EPOCHS:-10}" --out "$OUT"
python -m bayestpu.cli.build --model vgg11_me --dataset svhn --dropout_type mask \
  --num_masks 4 --mc_samples 4 --load_model "$OUT" \
  --build_strategy resource --output_dir "$OUT/build" --bench
