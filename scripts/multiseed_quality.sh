#!/bin/sh
# Multi-seed quality validation of the production perf defaults (round-2
# verdict next #5): 3 seeds x {production, fp32-moments+erf-GELU} through
# scripts/fullsize_train_demo.py (full-size 86M PaSST-S, complete AudioSet
# recipe, 50-tone task, 12 epochs). Appends one line per run to $OUT.
OUT=${OUT:-/tmp/multiseed_quality.log}
cd "$(dirname "$0")/.."
for seed in 0 1 2; do
  for arm in prod ref; do
    if [ "$arm" = prod ]; then extra=""; else
      extra="trainer.opt_moments_dtype=null model.gelu=erf"; fi
    echo "=== seed=$seed arm=$arm ===" >> "$OUT"
    timeout 1800 python scripts/fullsize_train_demo.py \
      trainer.seed=$seed $extra 2>&1 | tail -3 >> "$OUT"
  done
done
echo "ALL DONE" >> "$OUT"
