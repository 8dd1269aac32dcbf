#!/bin/bash
# One-shot on-chip measurement sweep for a round: emits the per-round
# machine-readable records in docs/records/ (selfcheck, geomsweep, ring,
# roofline/bench/configs via record_round.py) and runs the cross-round
# regression gate.  Runs every measurement serially on the single
# relay-attached TPU (two concurrent TPU jobs are untested — CLAUDE.md)
# and writes one log per step under $OUT (default /tmp/asp_measure).
#
#   PYTHONPATH=/root/.axon_site:/root/repo tools/measure_round.sh ROUND [OUT]
#
# Steps:
#   1 selfcheck      kernel parity JSON -> docs/records/selfcheck_rNN.json
#   2 geomsweep      geometry matrix    -> docs/records/geomsweep_rNN.jsonl
#   3 ring           config-5 ring-mode bench -> docs/records/ring_rNN.json
#                    (K=1, the measured default on this transport; the
#                    K>1 A/B conclusion is docs/PERF.md "Ring-batch A/B")
#   4 record_round   roofline (>=3 reps + 0.8 gate), bench modes (>=3
#                    reps, min/median/max), configs 1-5 --check --bench
#   5 check_regression  round N vs N-1 diff (quote output in PERF.md)
#
# Exit code: nonzero if ANY step failed, produced no record, or the
# regression gate found findings — a failed sweep must not read as a
# clean round.
set -u
ROUND="${1:?usage: measure_round.sh ROUND [OUT]}"
OUT="${2:-/tmp/asp_measure}"
TAG="$(printf 'r%02d' "$ROUND")"
mkdir -p "$OUT"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
export PYTHONPATH="${PYTHONPATH:-/root/.axon_site:$REPO}"
cd "$REPO"
FAILED=0

run() { # run <name> <timeout_s> <cmd...>  (log truncated per invocation:
  # the record extraction below greps the log, so stale lines from a
  # previous run must not leak into this round's records)
  local name="$1" to="$2" rc; shift 2
  echo "=== $name $(date +%H:%M:%S) ===" | tee "$OUT/$name.log"
  timeout "$to" "$@" >> "$OUT/$name.log" 2>&1
  rc=$?
  if [ "$rc" -ne 0 ]; then FAILED=1; fi
  echo "--- exit $rc $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
}

run selfcheck 7200 python tools/tpu_selfcheck.py
SC="$(grep -h '^{' "$OUT/selfcheck.log" | tail -1 || true)"
if [ -n "$SC" ]; then
  printf '%s\n' "$SC" > "docs/records/selfcheck_$TAG.json"
else
  echo "selfcheck produced NO record line — not writing selfcheck_$TAG.json" >&2
  FAILED=1
fi

run geomsweep 10800 python tools/tpu_geomsweep.py
if grep -q '^{' "$OUT/geomsweep.log"; then
  grep -h '^{' "$OUT/geomsweep.log" > "docs/records/geomsweep_$TAG.jsonl"
else
  echo "geomsweep produced NO record lines — not writing geomsweep_$TAG.jsonl" >&2
  FAILED=1
fi

run ring 2400 python tools/run_config_5.py --mode ring --bench --json
RG="$(grep -h '^{' "$OUT/ring.log" | tail -1 || true)"
if [ -n "$RG" ]; then
  printf '%s\n' "$RG" > "docs/records/ring_$TAG.json"
else
  echo "ring produced NO record line — not writing ring_$TAG.json" >&2
  FAILED=1
fi

# round 5: soaks run 512 blocks (the long-stream bound, VERDICT r4 #2)
# at BOTH ratios, plus the drained composite-chain soak (item #8)
run soak 10800 python tools/tpu_selfcheck.py --soak 4 3 --blocks 512
SK="$(grep -h '^{' "$OUT/soak.log" | tail -1 || true)"
if [ -n "$SK" ]; then
  printf '%s\n' "$SK" > "docs/records/soak_${TAG}_bf16x3.json"
else
  echo "soak produced NO record line — not writing soak_${TAG}_bf16x3.json" >&2
  FAILED=1
fi

run soak87 10800 python tools/tpu_selfcheck.py --soak 8 7 --blocks 512
SK87="$(grep -h '^{' "$OUT/soak87.log" | tail -1 || true)"
if [ -n "$SK87" ]; then
  printf '%s\n' "$SK87" > "docs/records/soak_${TAG}_bf16x3_pq87.json"
else
  echo "soak87 produced NO record line" >&2
  FAILED=1
fi

run soakcomp 10800 python tools/tpu_selfcheck.py --soak-composite --blocks 128
SKC="$(grep -h '^{' "$OUT/soakcomp.log" | tail -1 || true)"
if [ -n "$SKC" ]; then
  printf '%s\n' "$SKC" > "docs/records/soak_${TAG}_composite.json"
else
  echo "soak-composite produced NO record line" >&2
  FAILED=1
fi

run records 10800 python tools/record_round.py --round "$ROUND"

run regression 600 python tools/check_regression.py --round "$ROUND"
cat "$OUT/regression.log"
if [ "$FAILED" -ne 0 ]; then
  echo "SWEEP FAILED (see logs in $OUT)" >&2
  exit 1
fi
echo "ALL DONE -> $OUT (records in docs/records/*_$TAG.*)"
