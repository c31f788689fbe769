#!/bin/bash
# ≙ train_pred_eval cifar10 QResNet18 MCME (train_qkeras_mcme.py recipes).
set -e
OUT=${OUT:-snapshots/cifar_resnet_mcme}
python -m bayestpu.cli.train --model resnet18_me --dataset cifar10 \
  --dropout_type mc --dropout_rate 0.25 --mc_samples 5 \
  --quant_tbit 8 --quant_ibit 0 --epochs "${EPOCHS:-5}" --augment --out "$OUT"
python -m bayestpu.cli.predict --model resnet18_me --dataset cifar10 \
  --dropout_type mc --dropout_rate 0.25 --mc_samples 5 \
  --quant_tbit 8 --quant_ibit 0 --load_model "$OUT"
