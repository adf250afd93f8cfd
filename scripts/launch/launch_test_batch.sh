#!/usr/bin/env bash
# Grid sweep over label-prop radius / temperature / knn (capability match of
# reference scripts/launch/launch_test_batch.sh's 162-run nested loop).
set -euo pipefail
cd "$(dirname "$0")/../.."

for radius in 5 10 20; do
  for temp in 0.01 0.1 1.0; do
    for knn in 5 10 20; do
      echo "=== radius=${radius} temp=${temp} knn=${knn} ==="
      python scripts/test_all.py \
        --radius "${radius}" --temp "${temp}" --knn "${knn}" --no_plots "$@"
    done
  done
done
