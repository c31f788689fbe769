#!/bin/bash
# ≙ autobayes/diff_masksembles.sh: n Masksembles layers, scale=2.
set -e
# FUSED=0 disables the fused Pallas masked kernels (dropout-in-fabric)
if [ "${FUSED:-1}" = "1" ]; then FUSED_FLAG=--fused; else FUSED_FLAG=; fi
python -m bayestpu.cli.sweep masks --max_n 8 $FUSED_FLAG --out "${OUT:-sweeps/autobayes}"
