#!/bin/bash
# ≙ mnist_lenet/bayes_me/*_mc_me_temporal.sh: multi-exit MC model, temporal
# (resource) build — train, then AOT-build with the resource strategy and
# write the cost report (≙ the Vivado synth report).
set -e
OUT=${OUT:-snapshots/mnist_lenet/lenet_mc_me}
python -m bayestpu.cli.train --model lenet_me --dataset mnist --dropout_type mc \
  --mc_samples 5 --epochs "${EPOCHS:-10}" --out "$OUT"
python -m bayestpu.cli.build --model lenet_me --dataset mnist --dropout_type mc \
  --mc_samples 5 --load_model "$OUT" --build_strategy resource \
  --output_dir "$OUT/build" --bench
