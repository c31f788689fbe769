#!/bin/bash
# ≙ autobayes/diff_masksembles.sh: n Masksembles layers, scale=2.
set -e
# FUSED=0 disables the fused Pallas masked kernels (dropout-in-fabric)
FUSED_FLAG=$([ "${FUSED:-1}" = "1" ] && echo --fused)
python -m bayestpu.cli.sweep masks --max_n 8 $FUSED_FLAG --out "${OUT:-sweeps/autobayes}"
