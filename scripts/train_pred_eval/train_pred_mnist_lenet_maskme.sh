#!/bin/bash
# ≙ train_pred_eval masksembles variant: fixed mask bank, per-mask predict.
set -e
OUT=${OUT:-snapshots/mnist_lenet_maskme}
python -m bayestpu.cli.train --model lenet_me --dataset mnist \
  --dropout_type mask --num_masks 4 --scale 2.0 \
  --quant_tbit 8 --quant_ibit 0 --epochs "${EPOCHS:-5}" --out "$OUT"
python -m bayestpu.cli.predict --model lenet_me --dataset mnist \
  --dropout_type mask --num_masks 4 --scale 2.0 \
  --quant_tbit 8 --quant_ibit 0 --load_model "$OUT"
