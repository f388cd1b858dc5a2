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
  # Commit the artifact as soon as it lands (VERDICT r3 next #6: round
  # evidence must reach history when it is produced, not at round end).
  if [ $rc -eq 0 ] && [ -n "$artifact" ] && [ -e "$artifact" ]; then
    git add "$artifact" && \
      git commit -q -m "measurement: $name ($artifact)" && \
      say "COMMITTED $artifact" || say "commit of $artifact skipped"
  fi
  return $rc
}

# Subblock kernel on-chip verdict (round 4): the artifact is
# merge-preserving, so gate on the row rather than the file.
if ! python -c "import json,sys; sys.exit(0 if 'subblock' in json.load(open('VIT_BLOCK_VARIANTS.json')) else 1)" 2>/dev/null; then
  run_step vit_subblock "" 2400 \
    python scripts/vit_block_variants.py --variants baseline,subblock
  if [ -n "$(git status --porcelain -- VIT_BLOCK_VARIANTS.json)" ]; then
    git add VIT_BLOCK_VARIANTS.json && \
      git commit -q -m "measurement: subblock variant on-chip (VIT_BLOCK_VARIANTS.json)" && \
      say "COMMITTED VIT_BLOCK_VARIANTS.json"
  fi
else
  say "SKIP vit_subblock (row exists)"
fi

run_step bert_attn BERT_ATTN_VARIANTS.json 2400 \
  python scripts/bert_attn_variants.py

# PRNG dropout-mask A/B: one process per impl (default-prng config must
# be set before any key is traced).  Gate on the rbg row, not the file.
if ! python -c "import json,sys; sys.exit(0 if 'rbg' in json.load(open('PRNG_IMPL_AB.json')) else 1)" 2>/dev/null; then
  run_step prng_threefry "" 1800 \
    python scripts/prng_impl_ab.py --impl threefry2x32
  run_step prng_rbg "" 1800 python scripts/prng_impl_ab.py --impl rbg
  if [ -n "$(git status --porcelain -- PRNG_IMPL_AB.json)" ]; then
    git add PRNG_IMPL_AB.json && \
      git commit -q -m "measurement: dropout PRNG impl A/B (PRNG_IMPL_AB.json)" && \
      say "COMMITTED PRNG_IMPL_AB.json"
  fi
else
  say "SKIP prng_ab (rbg row exists)"
fi

run_step int8_ab INT8_AB.json 2400 python scripts/bench_int8_ab.py
run_step versa_bertlarge VERSA_SCALE_bertlarge.json 3600 \
  python scripts/versa_at_scale.py --geometry bertlarge
run_step versa_int8store VERSA_SCALE_int8store.json 3600 \
  python scripts/versa_at_scale.py --store_dtype int8
run_step versa_eva VERSA_SCALE_eva.json 3600 \
  python scripts/versa_at_scale.py --geometry eva
run_step serve_int8 SERVE_BENCH_int8.json 2400 \
  python scripts/serve_bench.py --quant int8 --http --batches 1,32,256 \
    --out SERVE_BENCH_int8.json
run_step tpu_kernel_tier "" 2400 env IISAN_TEST_PLATFORM=tpu \
  python -m pytest tests/test_fused_user_encoder.py \
    tests/test_fused_attention.py tests/test_fused_san.py \
    tests/test_fused_attn_subblock.py -q
# Proxy accuracy last: longest step; resumes row-by-row.  Seed the
# partial file from the last published report so already-measured rows
# (matching epoch budget AND carrying test-split metrics) are skipped.
if [ -f PROXY_ACCURACY.json ] && [ ! -f PROXY_ACCURACY_partial.json ]; then
  python - <<'EOF'
import json
rep = json.load(open("PROXY_ACCURACY.json"))
done = {}
for ds, d in rep.get("datasets", {}).items():
    for variant, recs in d.get("runs", {}).items():
        for r in recs:
            done[f"{ds}/{variant}/seed{r['seed']}"] = r
json.dump(done, open("PROXY_ACCURACY_partial.json", "w"), indent=1)
print("seeded partial with", len(done), "rows")
EOF
fi
run_step proxy_all "" 14400 \
  python scripts/proxy_accuracy.py --datasets scientific,instrument,office
# Extra seeds on the one <2-sigma cell (instrument test-split
# informative-vs-random, 0.99 sigma at 3 seeds — VERDICT r3 next #5);
# merge-preserving report keeps the other datasets' 3-seed rows.
run_step proxy_instrument_seeds "" 14400 \
  python scripts/proxy_accuracy.py --datasets instrument \
    --seeds 0,1,2,3,4,5,6,7,8
# Round 4: lift Scientific and Office to the same 6-seed strength as
# Instrument (uniform statistical basis for every README margin; rows
# already in the partial are skipped, so only seeds 3-5 run).
run_step proxy_scientific_seeds "" 14400 \
  python scripts/proxy_accuracy.py --datasets scientific \
    --seeds 0,1,2,3,4,5
run_step proxy_office_seeds "" 14400 \
  python scripts/proxy_accuracy.py --datasets office \
    --seeds 0,1,2,3,4,5
if [ -n "$(git status --porcelain -- PROXY_ACCURACY.json)" ]; then
  git add PROXY_ACCURACY.json PROXY_ACCURACY_partial.json && \
    git commit -q -m "measurement: proxy accuracy update" && \
    say "COMMITTED PROXY_ACCURACY.json"
fi
say "QUEUE DONE"
