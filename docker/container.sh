#!/usr/bin/env bash
# Container lifecycle wrapper (reference parity: docker/container.sh).
# Usage: ./docker/container.sh {build|start|enter|stop|job -- <cmd...>}
set -euo pipefail
cd "$(dirname "$0")/.."

case "${1:-}" in
  build)
    docker build -t isaaclab-tpu -f docker/Dockerfile .
    ;;
  start)
    docker compose -f docker/docker-compose.yaml up -d
    ;;
  enter)
    docker compose -f docker/docker-compose.yaml exec isaaclab-tpu bash
    ;;
  stop)
    docker compose -f docker/docker-compose.yaml down
    ;;
  job)
    shift; [ "${1:-}" = "--" ] && shift
    docker run --rm --privileged --network host \
      -v "$(pwd)/logs:/workspace/isaaclab_tpu/logs" \
      isaaclab-tpu "$@"
    ;;
  *)
    echo "usage: $0 {build|start|enter|stop|job -- <cmd...>}" >&2
    exit 1
    ;;
esac
