#!/usr/bin/env bash
# Build + run on a TPU VM (capability match of reference launch_docker.sh,
# with --privileged/--net=host for TPU device access instead of --gpus).
# Usage: bash docker/launch_docker.sh <container-name> <image-tag> [data-dir]
set -euo pipefail
NAME=${1:?container name}
TAG=${2:?image tag}
DATA=${3:-/datasets}

docker build -f docker/Dockerfile -t "${TAG}" .
docker run -d --name "${NAME}" \
  --privileged --net=host \
  -v "${DATA}":/datasets:ro \
  -e RSCRW_DATA_ROOT=/datasets \
  "${TAG}"
echo "started ${NAME}; run jobs with: docker exec ${NAME} bash scripts/launch/launch_train.sh"
