#!/bin/bash
# ≙ autobayes/verify_accuracy.sh: golden per-mask + averaged accuracy compare.
set -e
python -m bayestpu.cli.verify_accuracy --dataset mnist \
  --num_masks 4 --scale 2.0 --epochs "${EPOCHS:-3}"
