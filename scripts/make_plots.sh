#!/bin/bash
# Plot sweeps (reference make_plots.sh pattern): one figure per metric pair.
# Usage: scripts/make_plots.sh gaussian
set -euo pipefail

EXP="${1:-gaussian}"
PY="python -m bayesian_coresets_tpu.experiments"

case "$EXP" in
  gaussian)
    for y in rklw fklw mu_errs Sig_errs cputs; do
      $PY.gaussian plot Ms "$y" --plot_legend alg --groupby Ms \
        --summarize trial alg --plot_out "gaussian_${y}_vs_Ms.png"
    done
    ;;
  synthetic_vectors)
    for y in err cput; do
      $PY.synthetic_vectors plot Ms "$y" --plot_legend alg --groupby Ms \
        --summarize trial alg --plot_out "synthvec_${y}_vs_Ms.png"
    done
    ;;
  logistic_poisson)
    for y in rklw fklw Fs cputs; do
      $PY.logistic_poisson plot Ms "$y" --plot_legend alg --groupby Ms \
        --summarize trial alg --plot_out "logpoiss_${y}_vs_Ms.png"
    done
    ;;
  linear_regression)
    for y in rklw fklw mu_errs Sig_errs; do
      $PY.linear_regression plot Ms "$y" --plot_legend alg --groupby Ms \
        --summarize trial alg --plot_out "linreg_${y}_vs_Ms.png"
    done
    ;;
  *)
    echo "unknown experiment: $EXP" >&2
    exit 1
    ;;
esac
