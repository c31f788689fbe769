#!/bin/bash
# ≙ autobayes/diff_scale.sh: Masksembles scale sweep on LeNet.
set -e
python -m bayestpu.cli.sweep scale --values 1.5 2 3 4 6 8 --out "${OUT:-sweeps/autobayes}"
