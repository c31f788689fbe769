#!/bin/bash
# ≙ autobayes/diff_dropouts.sh: one build per n ∈ 1..8 inserted MCD layers.
set -e
# FUSED=0 disables the fused Pallas masked kernels (dropout-in-fabric)
if [ "${FUSED:-1}" = "1" ]; then FUSED_FLAG=--fused; else FUSED_FLAG=; fi
python -m bayestpu.cli.sweep dropouts --max_n 8 $FUSED_FLAG --out "${OUT:-sweeps/autobayes}"
python -m bayestpu.cli.figures "${OUT:-sweeps/autobayes}/dropouts.json" --out "${OUT:-sweeps/autobayes}/figs"
