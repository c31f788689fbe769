#!/bin/bash
# ≙ Software_Artifact/script_figs/table1_script_orig.sh: the paper's Table-1
# matrix on CIFAR-100 — baseline single-exit, MCD at acc-opt (p=0.125) and
# ece-opt (p=0.5), multi-exit, and MC+ME — each with the FullAnalysis stage.
set -e
DS=cifar100
EP=${EPOCHS:-200}
run () {  # run <tag> <extra train flags...>
  local tag=$1; shift
  local out="snapshots/table1_${DS}_${tag}"
  python -m bayestpu.cli.train --model resnet18_me --dataset $DS \
    --epochs "$EP" --augment --out "$out" "$@"
  python -m bayestpu.cli.analyze --model resnet18_me --dataset $DS \
    --load_model "$out" --out "$out/analysis" --model_type resnet18 "$@"
}
run baseline    --dropout_type none
run mc_acc_opt  --dropout_type mc --dropout_rate 0.125 --mc_samples 10
run mc_ece_opt  --dropout_type mc --dropout_rate 0.5   --mc_samples 10
run me_acc_opt  --dropout_type none
run mcme        --dropout_type mc --dropout_rate 0.5   --mc_samples 10
