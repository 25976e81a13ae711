#!/bin/bash
# Experiment sweep driver (reference run_experiment.sh pattern: nested loops
# over algorithm x trial x dataset).  Usage:
#   scripts/run_experiments.sh gaussian [trials]
#   scripts/run_experiments.sh synthetic_vectors [trials]
#   scripts/run_experiments.sh logistic_poisson [trials]
#   scripts/run_experiments.sh linear_regression [trials]
set -euo pipefail

EXP="${1:-gaussian}"
TRIALS="${2:-3}"
PY="python -m bayesian_coresets_tpu.experiments"

case "$EXP" in
  gaussian)
    for alg in SVI SVI-EXACT GIGA-OPT GIGA-OPT-EXACT GIGA-REAL GIGA-REAL-EXACT US; do
      for t in $(seq 1 "$TRIALS"); do
        $PY.gaussian run --alg "$alg" --trial "$t"
      done
    done
    ;;
  synthetic_vectors)
    for data in normal axis; do
      for alg in FW GIGA OMP US; do
        for t in $(seq 1 "$TRIALS"); do
          $PY.synthetic_vectors run --alg "$alg" --data_type "$data" --trial "$t"
        done
      done
    done
    ;;
  logistic_poisson)
    for model_ds in "lr synth_lr" "lr phishing" "lr ds1" "poiss synth_poiss" "poiss biketrips" "poiss airportdelays"; do
      set -- $model_ds
      for alg in SVI GIGA-OPT GIGA-REAL US; do
        for t in $(seq 1 "$TRIALS"); do
          $PY.logistic_poisson run --model "$1" --dataset "$2" --alg "$alg" --trial "$t"
        done
      done
    done
    ;;
  linear_regression)
    for alg in SVI SVI-EXACT GIGA-OPT GIGA-OPT-EXACT GIGA-REAL GIGA-REAL-EXACT US; do
      for t in $(seq 1 "$TRIALS"); do
        $PY.linear_regression run --alg "$alg" --trial "$t"
      done
    done
    ;;
  *)
    echo "unknown experiment: $EXP" >&2
    exit 1
    ;;
esac
