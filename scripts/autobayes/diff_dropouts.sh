#!/bin/bash
# ≙ autobayes/diff_dropouts.sh: one build per n ∈ 1..8 inserted MCD layers.
set -e
python -m bayestpu.cli.sweep dropouts --max_n 8 --out "${OUT:-sweeps/autobayes}"
python -m bayestpu.cli.figures "${OUT:-sweeps/autobayes}/dropouts.json" --out "${OUT:-sweeps/autobayes}/figs"
