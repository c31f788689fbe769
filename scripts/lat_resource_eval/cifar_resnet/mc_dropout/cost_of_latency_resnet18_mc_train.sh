#!/bin/bash
# ≙ cost_of_latency_*_mc_train.sh: train the MC-dropout model feeding the
# latency/resource sweeps (one set of weights serves every mc_samples point —
# spatial weight tying is structural here, no per-count retrain needed).
set -e
python -m bayestpu.cli.train --model resnet18 --dataset cifar10 --dropout_type mc \
  --mc_samples 5 --epochs "${EPOCHS:-10}" \
  --out "${OUT:-snapshots/cifar_resnet/resnet18_mc}"
