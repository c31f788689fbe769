#!/bin/bash
# ≙ Software_Artifact/script_figs resnet18 MC+ME pipeline: train with the SW
# recipe (SGD .1/MultiStep), then the FullAnalysis battery (overthinking,
# KDE-ECE, early-exit/FLOPs sweep, 1..49 multipass).
set -e
OUT=${OUT:-snapshots/sw_resnet18_mcme}
python -m bayestpu.cli.train --model resnet18_me --dataset cifar10 \
  --dropout_type mc --dropout_rate 0.5 --mc_samples 10 \
  --epochs "${EPOCHS:-200}" --augment --out "$OUT"
python -m bayestpu.cli.analyze --model resnet18_me --dataset cifar10 \
  --dropout_type mc --dropout_rate 0.5 --mc_samples 10 \
  --load_model "$OUT" --out "$OUT/analysis" --multipass --model_type resnet18
