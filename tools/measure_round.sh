#!/bin/bash
# One-shot on-chip measurement sweep for a round: emits the per-round
# machine-readable records in docs/records/ (selfcheck, geomsweep,
# roofline/bench/configs via record_round.py) and runs the cross-round
# regression gate.  Runs every measurement serially on the single
# relay-attached TPU (two concurrent TPU jobs are untested — CLAUDE.md)
# and appends one log per step under $OUT (default /tmp/asp_measure).
#
#   PYTHONPATH=/root/.axon_site:/root/repo tools/measure_round.sh ROUND [OUT]
#
# Steps:
#   1 selfcheck      kernel parity JSON -> docs/records/selfcheck_rNN.json
#   2 geomsweep      geometry matrix    -> docs/records/geomsweep_rNN.jsonl
#   3 record_round   roofline (>=3 reps + 0.8 gate), bench modes (>=3
#                    reps, min/median/max), configs 1-5 --check --bench
#   4 check_regression  round N vs N-1 diff (quote output in PERF.md)
set -u
ROUND="${1:?usage: measure_round.sh ROUND [OUT]}"
OUT="${2:-/tmp/asp_measure}"
TAG="$(printf 'r%02d' "$ROUND")"
mkdir -p "$OUT"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
export PYTHONPATH="${PYTHONPATH:-/root/.axon_site:$REPO}"
cd "$REPO"

run() { # run <name> <timeout_s> <cmd...>  (log truncated per invocation:
  # the record extraction below greps the log, so stale lines from a
  # previous run must not leak into this round's records)
  local name="$1" to="$2"; shift 2
  echo "=== $name $(date +%H:%M:%S) ===" | tee "$OUT/$name.log"
  timeout "$to" "$@" >> "$OUT/$name.log" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
}

run selfcheck 7200 python tools/tpu_selfcheck.py
grep -h '^{' "$OUT/selfcheck.log" | tail -1 > "docs/records/selfcheck_$TAG.json" || true

run geomsweep 10800 python tools/tpu_geomsweep.py
grep -h '^{' "$OUT/geomsweep.log" > "docs/records/geomsweep_$TAG.jsonl" || true

run records 10800 python tools/record_round.py --round "$ROUND"

run regression 600 python tools/check_regression.py --round "$ROUND"
cat "$OUT/regression.log"
echo "ALL DONE -> $OUT (records in docs/records/*_$TAG.*)"
