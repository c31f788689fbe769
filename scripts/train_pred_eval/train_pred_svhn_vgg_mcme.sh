#!/bin/bash
# ≙ train_pred_eval svhn QVGG11 MCME (CosineAnnealing recipe, train_qkeras.py:165-180).
set -e
OUT=${OUT:-snapshots/svhn_vgg_mcme}
python -m bayestpu.cli.train --model vgg11_me --dataset svhn \
  --dropout_type mc --dropout_rate 0.25 --mc_samples 5 \
  --quant_tbit 8 --quant_ibit 0 --epochs "${EPOCHS:-5}" --augment --out "$OUT"
python -m bayestpu.cli.predict --model vgg11_me --dataset svhn \
  --dropout_type mc --dropout_rate 0.25 --mc_samples 5 \
  --quant_tbit 8 --quant_ibit 0 --load_model "$OUT"
