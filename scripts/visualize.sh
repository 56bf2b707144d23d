#!/bin/bash
# Render all predictions of a saved evaluation to jpg + obj (ref bash/visualize.sh).
# usage: scripts/visualize.sh <method: baseline|mlp|optimize> <dataset: hand26m>
set -euo pipefail
method=${1:-optimize}
dataset=${2:-hand26m}
python -m ihmr_tpu.cli visualize --results "evaluate_results/$method/$dataset.pkl"
