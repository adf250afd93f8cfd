#!/usr/bin/env bash
# Single evaluation run (reference: scripts/launch/launch_test.sh).
set -euo pipefail
cd "$(dirname "$0")/../.."
python scripts/test_all.py "$@"
