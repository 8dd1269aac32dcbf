#!/bin/bash
# One-shot on-chip measurement sweep for a round (docs/PERF.md +
# BASELINE.md refresh).  Runs every measurement serially on the single
# relay-attached TPU (two concurrent TPU jobs are untested — CLAUDE.md)
# and appends one log per step under $OUT (default /tmp/asp_measure).
#
#   PYTHONPATH=/root/.axon_site:/root/repo tools/measure_round.sh [OUT]
#
# Steps (each skippable by prior completion — logs are append-only):
#   1 selfcheck     kernel parity JSON (>=60 dB gate, exit code)
#   2 bench         headline chain samples/s (driver metric)
#   3 bench modes   res_two / res_step / res_env_step / stream1
#   4 roofline      pallas_sk vs xla, batch 8192 and 32768 (80% target)
#   5 configs       run_config_{1..5} --bench --json (product path)
#   6 ring A/B      config 5 ring mode, --ring-batch 1 vs 8
set -u
OUT="${1:-/tmp/asp_measure}"
mkdir -p "$OUT"
REPO="$(cd "$(dirname "$0")/.." && pwd)"
export JAX_COMPILATION_CACHE_DIR="${JAX_COMPILATION_CACHE_DIR:-/tmp/jaxcache}"
export PYTHONPATH="${PYTHONPATH:-/root/.axon_site:$REPO}"
cd "$REPO"

run() { # run <name> <timeout_s> <cmd...>
  local name="$1" to="$2"; shift 2
  echo "=== $name $(date +%H:%M:%S) ===" | tee -a "$OUT/$name.log"
  timeout "$to" "$@" >> "$OUT/$name.log" 2>&1
  echo "--- exit $? $(date +%H:%M:%S)" | tee -a "$OUT/$name.log"
}

run selfcheck   3600 python tools/tpu_selfcheck.py
run bench       1800 python bench.py
run bench_res2  1800 python bench.py res_two
run bench_rstep 2400 python bench.py res_step
run bench_renv  2400 python bench.py res_env_step
run bench_s1    1800 python bench.py stream1
run roofline8k  3600 python benchmarks/roofline.py \
    --impls pallas_sk,xla --sizes 1024,4096 --batch 8192 --json
run roofline32k 3600 python benchmarks/roofline.py \
    --impls pallas_sk,xla --sizes 1024,4096 --batch 32768 --json
for c in 1 2 3 4 5; do
  run "config$c" 2400 python "tools/run_config_$c.py" --bench --json
done
run ring_b1 2400 python tools/run_config_5.py --mode ring --bench --json
run ring_b8 2400 python tools/run_config_5.py --mode ring --bench --json \
    --ring-batch 8
run ring_b8c 2400 python tools/run_config_5.py --mode ring --bench --json \
    --ring-batch 8 --composite
echo "ALL DONE -> $OUT"
