#!/usr/bin/env bash
# Grid sweep over seq_length / lr / tau / overlap (capability match of
# reference scripts/launch/launch_train_batch.sh's 135-run nested loop).
set -euo pipefail
cd "$(dirname "$0")/../.."

for seq_length in 10 20 40; do
  for lr in 1e-2 1e-3 1e-4; do
    for tau in 1e-1 1e-2 1e-3; do
      for overlap in "8 0" "12 0" "14 0"; do
        name="crw_s${seq_length}_lr${lr}_tau${tau}_ov${overlap// /_}"
        echo "=== ${name} ==="
        python scripts/train.py \
          --seq_length "${seq_length}" --lr "${lr}" --tau "${tau}" \
          --overlap ${overlap} --output_name "${name}" "$@"
      done
    done
  done
done
