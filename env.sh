#!/usr/bin/env bash
# Environment bootstrap (reference: env.sh:4-8): PYTHONPATH, results and
# data roots.  Source before running train.py / eval.py.
export PYTHONPATH="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd):${PYTHONPATH}"
export RESULTS_DIR="${RESULTS_DIR:-$HOME/results/greedy_multimodal_learning_tpu}"
export DATA_DIR="${DATA_DIR:-$HOME/datasets/ModelNet40/preprocessed}"
mkdir -p "$RESULTS_DIR"
