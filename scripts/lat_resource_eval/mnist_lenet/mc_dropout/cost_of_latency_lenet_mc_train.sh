#!/bin/bash
# ≙ cost_of_latency_*_mc_train.sh: train the MC-dropout model feeding the
# latency/resource sweeps (one set of weights serves every mc_samples point —
# spatial weight tying is structural here, no per-count retrain needed).
set -e
python -m bayestpu.cli.train --model lenet --dataset mnist --dropout_type mc \
  --mc_samples 5 --epochs "${EPOCHS:-10}" \
  --out "${OUT:-snapshots/mnist_lenet/lenet_mc}"
