#!/bin/bash
# ≙ autobayes/diff_masksembles.sh: n Masksembles layers, scale=2.
set -e
python -m bayestpu.cli.sweep masks --max_n 8 --out "${OUT:-sweeps/autobayes}"
