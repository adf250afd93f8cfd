#!/usr/bin/env bash
# Single training run (reference: scripts/launch/launch_train.sh, minus the
# docker exec indirection — TPU VMs run the framework directly).
set -euo pipefail
cd "$(dirname "$0")/../.."
python scripts/train.py "$@"
