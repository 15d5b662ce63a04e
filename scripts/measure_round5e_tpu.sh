#!/bin/bash
# Round-5e: speculative serving rows on the CALIBRATED relative-PE 2.4B
# (run only after r5c's acceptance probes clear the ~0.7 drafts/chunk
# break-even).  Requires output/large_ckpt/serving_cal
# (make_serving_ckpt --src output/large_ckpt8cal/...).
#
#   1. serving default + spec: B=10 win-8 bb=5 W4, spec_k=8
#   2. full-window apples-to-apples + spec: B=4 win-20, spec_k=8
#   3. (reference row refresh) default WITHOUT spec on the same ckpt

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r5e stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

SERV=output/large_ckpt/serving_cal
[ -d "$SERV" ] || { say "no $SERV — build it first"; exit 1; }

say "r5e stage 1: default B=10 win-8 + spec_k=8 on the calibrated ckpt"
UMGEN_BENCH_LADDER=0 UMGEN_BENCH_SERVING="$SERV" UMGEN_BENCH_SPEC_K=8 \
    UMGEN_BENCH_FRAMES=8 \
    UMGEN_BENCH_BUDGET_S=650 UMGEN_BENCH_HARD_BUDGET_S=680 \
    timeout 780 python bench.py >> "$LOG" 2>&1 || say "1 exited nonzero"

say "r5e stage 2: full 20-frame window B=4 + spec_k=8"
UMGEN_BENCH_LADDER=0 UMGEN_BENCH_SERVING="$SERV" UMGEN_BENCH_SPEC_K=8 \
    UMGEN_BENCH_BATCH=4 UMGEN_BENCH_WINDOW=20 \
    UMGEN_BENCH_FRAMES=8 \
    UMGEN_BENCH_BUDGET_S=650 UMGEN_BENCH_HARD_BUDGET_S=680 \
    timeout 780 python bench.py >> "$LOG" 2>&1 || say "2 exited nonzero"

say "r5e stage 3: default sequential on the calibrated ckpt (control row)"
UMGEN_BENCH_LADDER=0 UMGEN_BENCH_SERVING="$SERV" \
    UMGEN_BENCH_FRAMES=8 \
    UMGEN_BENCH_BUDGET_S=600 UMGEN_BENCH_HARD_BUDGET_S=620 \
    timeout 700 python bench.py >> "$LOG" 2>&1 || say "3 exited nonzero"

say "r5e done"
