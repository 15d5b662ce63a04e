#!/bin/bash
# Round-5d: retry the full-window B=5 with the TAR-family W4 weights
# (~1 GB freed; r5b missed HBM by 49.5 MB), then pay its quality bill.
# Requires output/large_ckpt/serving_tarw4 (make_serving_ckpt --tar_w4 1).

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r5d stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r5d stage 1: B=5 win-20 bb=5 W4 + tar-w4 (full window)"
OUT1=$(UMGEN_BENCH_LADDER=0 UMGEN_BENCH_BATCH=5 UMGEN_BENCH_WINDOW=20 \
    UMGEN_BENCH_BATCH_BLOCK=5 UMGEN_BENCH_TAR_W4=1 \
    UMGEN_BENCH_SERVING=output/large_ckpt/serving_tarw4 \
    UMGEN_BENCH_FRAMES=8 \
    UMGEN_BENCH_BUDGET_S=600 UMGEN_BENCH_HARD_BUDGET_S=620 \
    timeout 700 python bench.py 2>> "$LOG") || say "1 exited nonzero"
echo "$OUT1" >> "$LOG"

case "$OUT1" in
*'"value": 0.0'*|"")
    say "r5d stage 2: B=5 win-20 + tar-w4 + int4 OAR KV (last 0.3 GB)"
    UMGEN_BENCH_LADDER=0 UMGEN_BENCH_BATCH=5 UMGEN_BENCH_WINDOW=20 \
        UMGEN_BENCH_BATCH_BLOCK=5 UMGEN_BENCH_TAR_W4=1 \
        UMGEN_BENCH_OAR_KV=int4 \
        UMGEN_BENCH_FRAMES=8 \
        UMGEN_BENCH_BUDGET_S=1100 UMGEN_BENCH_HARD_BUDGET_S=1150 \
        timeout 1250 python bench.py >> "$LOG" 2>&1 \
        || say "2 exited nonzero" ;;
*)
    say "r5d stage 2 skipped (stage 1 produced a number)" ;;
esac

say "r5d stage 3: quality leg E_tar_w4_stack (N=8, 1 seed) — the bill"
timeout 3600 python scripts/measure_quant_quality.py \
    --ckpt output/large_ckpt8/step_0001200 --scale larger \
    --frames 12 --cond 4 --window 8 --sample topk \
    --scenes 8 --seeds 1 --chunk 2 \
    --configs E_tar_w4_stack >> "$LOG" 2>&1 || say "3 exited nonzero"

say "r5d done"
