#!/bin/bash
# ≙ cost_of_latency_*_mask_train.sh: Masksembles training per mask count —
# the bank is part of the model, so each num_masks point gets its own run.
set -e
for n in 2 3 5 7 9; do
  python -m bayestpu.cli.train --model vgg11 --dataset svhn --dropout_type mask \
    --num_masks $n --mc_samples $n --epochs "${EPOCHS:-10}" \
    --out "${OUT:-snapshots/svhn_vgg/vgg11_mask}_n$n"
done
