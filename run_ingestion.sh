#!/usr/bin/env bash
# Cron wrapper for the ingestion job — same operational contract as the
# reference harness (run_ingestion_with_metrics.sh in /root/reference):
# daily log redirect, atomic mkdir lock (single-flight), run metrics
# (run_id / start / end / duration / status) to the log.
set -euo pipefail

BASE_DIR="$(cd "$(dirname "${BASH_SOURCE[0]}")" && pwd)"
LOG_DIR="${LOG_DIR:-$BASE_DIR/logs}"
LOCK_DIR="${LOCK_DIR:-$BASE_DIR/.ingestion.lock}"
mkdir -p "$LOG_DIR"

LOG="$LOG_DIR/ingestion_$(date -u +%Y%m%d).log"
exec >>"$LOG" 2>&1

# single-flight: atomic mkdir lock + cleanup trap
if ! mkdir "$LOCK_DIR" 2>/dev/null; then
  echo "$(date -u +%FT%TZ) SKIP: another run holds $LOCK_DIR"
  exit 0
fi
trap 'rmdir "$LOCK_DIR"' EXIT

RUN_ID="$(date -u +%Y%m%dT%H%M%SZ)-$$"
START_TS=$(date +%s)
echo "run_id=$RUN_ID start=$(date -u +%FT%TZ)"

STATUS=ok
# run from the repo root so the package resolves regardless of the
# caller's cwd (cron jobs typically start in $HOME)
(cd "$BASE_DIR" && python -m data_ingestion_project_spark.job "$@") || STATUS=failed

END_TS=$(date +%s)
echo "run_id=$RUN_ID end=$(date -u +%FT%TZ) duration_s=$((END_TS - START_TS)) status=$STATUS"
[ "$STATUS" = ok ]
