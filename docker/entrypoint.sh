#!/usr/bin/env bash
# Editable install + keep the container alive for exec-style launches
# (capability match of reference entrypoint.sh).
set -euo pipefail
pip install --no-cache-dir -e "${REPO_DIR}"
exec sleep infinity
