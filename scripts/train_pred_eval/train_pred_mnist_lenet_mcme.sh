#!/bin/bash
# ≙ Hardware_Artifact/bayes_hw/scripts/train_pred_eval/train_pred_mnist_lenet_mcme.sh:
# 8-bit quantized 2-exit LeNet with MC dropout, train → predict → analyze.
set -e
OUT=${OUT:-snapshots/mnist_lenet_mcme}
python -m bayestpu.cli.train --model lenet_me --dataset mnist \
  --dropout_type mc --dropout_rate 0.25 --mc_samples 5 \
  --quant_tbit 8 --quant_ibit 0 --epochs "${EPOCHS:-5}" --out "$OUT"
python -m bayestpu.cli.predict --model lenet_me --dataset mnist \
  --dropout_type mc --dropout_rate 0.25 --mc_samples 5 \
  --quant_tbit 8 --quant_ibit 0 --load_model "$OUT" --passes 10
python -m bayestpu.cli.analyze --model lenet_me --dataset mnist \
  --dropout_type mc --dropout_rate 0.25 --mc_samples 5 \
  --quant_tbit 8 --quant_ibit 0 --load_model "$OUT" --out "$OUT/analysis"
