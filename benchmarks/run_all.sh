#!/usr/bin/env bash
# Run every benchmark and capture results (engineering harness; the driver
# contract is bench.py at the repo root).
set -euo pipefail
cd "$(dirname "$0")/.."
echo "== train throughput (driver metric) =="
python bench.py
echo "== propagation latency =="
python benchmarks/bench_propagation.py
echo "== full ablation study (slow: several compiles) =="
python benchmarks/perf_study.py
