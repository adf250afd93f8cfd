#!/usr/bin/env bash
# Editable install + keep the container alive for exec-style launches
# (capability match of reference entrypoint.sh).
set -euo pipefail
# --user: the container runs as the non-root ${USERNAME}, which cannot
# write the system site-packages of the base image
pip install --no-cache-dir --user -e "${REPO_DIR}"
exec sleep infinity
