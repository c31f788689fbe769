#!/bin/bash
# ≙ script_figs vgg19 Masksembles+ME pipeline (Cosine T=200 recipe).
set -e
OUT=${OUT:-snapshots/sw_vgg19_maskme}
python -m bayestpu.cli.train --model vgg19_me --dataset cifar10 \
  --dropout_type mask --num_masks 4 --scale 2.0 \
  --epochs "${EPOCHS:-200}" --augment --out "$OUT"
python -m bayestpu.cli.analyze --model vgg19_me --dataset cifar10 \
  --dropout_type mask --num_masks 4 --scale 2.0 \
  --load_model "$OUT" --out "$OUT/analysis" --multipass --model_type vgg19
