#!/bin/bash
set -e
OUT=${OUT:-snapshots/cifar_resnet_maskme}
python -m bayestpu.cli.train --model resnet18_me --dataset cifar10 \
  --dropout_type mask --num_masks 4 --scale 2.0 \
  --quant_tbit 8 --quant_ibit 0 --epochs "${EPOCHS:-5}" --augment --out "$OUT"
python -m bayestpu.cli.predict --model resnet18_me --dataset cifar10 \
  --dropout_type mask --num_masks 4 --scale 2.0 \
  --quant_tbit 8 --quant_ibit 0 --load_model "$OUT"
