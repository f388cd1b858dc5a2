#!/bin/bash
# Sequential TPU measurement queue (docs/ROUND6_NOTES.md recipe).
# Each step is bounded by `timeout` and logged; steps whose artifact
# already exists are skipped so the queue resumes across tunnel outages.
# Usage: bash scripts/run_measurements.sh [logfile]
set -u
cd "$(dirname "$0")/.."
LOG=${1:-/tmp/measure_queue.log}
say() { echo "[$(date +%H:%M:%S)] $*" | tee -a "$LOG"; }

run_step() { # name artifact timeout cmd...
  local name=$1 artifact=$2 tmo=$3; shift 3
  if [ -n "$artifact" ] && [ -e "$artifact" ]; then
    say "SKIP $name ($artifact exists)"; return 0
  fi
  say "START $name: $*"
  timeout "$tmo" "$@" >>"$LOG" 2>&1
  local rc=$?
  say "END $name rc=$rc"
  return $rc
}

run_step int8_ab INT8_AB.json 2400 python scripts/bench_int8_ab.py
run_step versa_int8store VERSA_SCALE_int8store.json 3600 \
  python scripts/versa_at_scale.py --store_dtype int8
run_step versa_eva VERSA_SCALE_eva.json 3600 \
  python scripts/versa_at_scale.py --geometry eva
run_step serve_int8 SERVE_BENCH_int8.json 2400 \
  python scripts/serve_bench.py --quant int8 --http --batches 1,32,256 \
    --out SERVE_BENCH_int8.json
run_step tpu_kernel_tier "" 2400 env IISAN_TEST_PLATFORM=tpu \
  python -m pytest tests/test_fused_user_encoder.py \
    tests/test_fused_attention.py tests/test_fused_san.py -q
# Office proxy accuracy last: longest step; resumes row-by-row.
if [ -f PROXY_ACCURACY.json ] && [ ! -f PROXY_ACCURACY_partial.json ]; then
  python - <<'EOF'
import json
rep = json.load(open("PROXY_ACCURACY.json"))
runs = [r for d in rep.get("datasets", {}).values() for r in d.get("runs", [])]
json.dump(runs, open("PROXY_ACCURACY_partial.json", "w"))
print("seeded partial with", len(runs), "rows")
EOF
fi
run_step proxy_office "" 7200 \
  python scripts/proxy_accuracy.py --datasets scientific,instrument,office
say "QUEUE DONE"
