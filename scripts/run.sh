#!/usr/bin/env bash
# CLI wrapper with the reference's surface (run.sh:26-34):
#   bash scripts/run.sh -m {ITC,SSL} -d <data-folder> [-a args.json]
# stdout is tee'd to log/<dataset>_<mode>_<ts>.log like the reference.
set -euo pipefail

MODE=""
DATA=""
ARGS=""
while getopts "m:d:a:" opt; do
  case $opt in
    m) MODE=$OPTARG ;;
    d) DATA=$OPTARG ;;
    a) ARGS=$OPTARG ;;
    *) echo "usage: $0 -m {ITC,SSL} -d <data-folder> [-a args.json]" >&2; exit 2 ;;
  esac
done
[ -n "$MODE" ] && [ -n "$DATA" ] || { echo "usage: $0 -m {ITC,SSL} -d <data-folder> [-a args.json]" >&2; exit 2; }

REPO_DIR=$(cd "$(dirname "$0")/.." && pwd)
mkdir -p "$REPO_DIR/log"
DS=$(basename "${DATA%/}")
TS=$(date +%Y%m%d%H%M%S)
LOG="$REPO_DIR/log/${DS}_${MODE}_${TS}.log"

EXTRA=()
[ -n "$ARGS" ] && EXTRA=(--args "$ARGS")
cd "$REPO_DIR"
python -m multike_tpu.cli -m "$MODE" -d "$DATA" "${EXTRA[@]}" 2>&1 | tee "$LOG"
