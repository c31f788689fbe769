#!/bin/bash
# ≙ autobayes/diff_scale.sh: Masksembles scale sweep on LeNet.
set -e
# FUSED=0 disables the fused Pallas masked kernels (dropout-in-fabric)
if [ "${FUSED:-1}" = "1" ]; then FUSED_FLAG=--fused; else FUSED_FLAG=; fi
python -m bayestpu.cli.sweep scale --values 1.5 2 3 4 6 8 $FUSED_FLAG --out "${OUT:-sweeps/autobayes}"
