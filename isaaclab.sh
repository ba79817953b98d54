#!/usr/bin/env bash
# Umbrella CLI (reference isaaclab.sh:242-254) for the TPU-native build.
#   -p|--python   run python with the repo on PYTHONPATH
#   -t|--test     run the test suite
#   -f|--format   format/lint (ruff if available, else python -m compileall)
#   -b|--bench    run the headline benchmark
#   -n|--new      scaffold a new external project from the template
#   -l|--list     list registered tasks
#   -h|--help     this message
set -e
REPO_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
export PYTHONPATH="${REPO_DIR}:${PYTHONPATH}"

usage() { grep '^#   ' "$0" | sed 's/^#   //'; }

case "$1" in
  -p|--python) shift; exec python "$@" ;;
  -t|--test)  shift; exec python -m pytest "${REPO_DIR}/tests" -q "$@" ;;
  -f|--format)
    shift
    if command -v ruff >/dev/null 2>&1; then
      exec ruff check --fix "${REPO_DIR}/isaaclab_tpu" "$@"
    else
      exec python -m compileall -q "${REPO_DIR}/isaaclab_tpu"
    fi ;;
  -b|--bench) shift; exec python "${REPO_DIR}/bench.py" "$@" ;;
  -l|--list)  shift; exec python "${REPO_DIR}/scripts/environments/list_envs.py" "$@" ;;
  -n|--new)   shift; exec python "${REPO_DIR}/tools/template/scaffold.py" "$@" ;;
  -h|--help|*) usage ;;
esac
