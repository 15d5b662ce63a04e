#!/bin/bash
# Round-4c: follow-on TPU work after measure_round4b_tpu.sh has produced
# the window-8-trained 2.4B checkpoint + serving artifact.
#
#   1. quality budget of the lossy serving defaults at N>=8 scenes x
#      multiple seeds on the TRAINED larger-scale checkpoint
#      (VERDICT r3 task 4: demote W4 from the default if the collision
#      delta survives averaging)
#   2. win-8 batch-frontier sweep past B=10 (VERDICT r3 task 6:
#      a measured >=2.2 f/s row at win>=8) — B=12 bb=4/bb=6, falling
#      back to win-7 if the rings OOM
#
# Run AFTER r4b releases the relay.  Each bench leg has its own budget
# guard so a single OOM/compile-hang cannot eat the round.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

CKPT=output/large_ckpt8/final
[ -d "$CKPT" ] || CKPT=$(ls -d output/large_ckpt8/step_* 2>/dev/null | tail -1)

say "r4c stage 1: quality budget N=8 scenes x 3 seeds on $CKPT"
# chunk 2, not 4: chunk=4 was the one-shot OOM that killed the r4
# quantized leg (the fp config's rings at 2.1 GB/scene don't leave room
# for 4 scenes' window activations) — ADVICE r4
timeout 3600 python scripts/measure_quant_quality.py \
    --ckpt "$CKPT" --scale larger --frames 12 --cond 4 --window 8 \
    --sample topk --scenes 8 --seeds 3 --chunk 2 >> "$LOG" 2>&1 \
    || say "stage 1 exited nonzero"

say "r4c stage 2a: frontier B=12 win-8 bb=4"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_FRAMES=8 UMGEN_BENCH_BUDGET_S=600 \
    timeout 700 python bench.py >> "$LOG" 2>&1 || say "2a exited nonzero"

say "r4c stage 2b: frontier B=12 win-8 bb=6"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=6 \
    UMGEN_BENCH_FRAMES=8 UMGEN_BENCH_BUDGET_S=600 \
    timeout 700 python bench.py >> "$LOG" 2>&1 || say "2b exited nonzero"

say "r4c stage 2c: fallback B=12 win-7 bb=4 (only informative if 2a OOMed)"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=7 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_FRAMES=8 UMGEN_BENCH_BUDGET_S=600 \
    timeout 700 python bench.py >> "$LOG" 2>&1 || say "2c exited nonzero"

say "r4c stage 2d: apples-to-apples full 20-frame window on the trained ckpt (B=4, whole-batch W4)"
UMGEN_BENCH_BATCH=4 UMGEN_BENCH_WINDOW=20 \
    UMGEN_BENCH_FRAMES=8 UMGEN_BENCH_BUDGET_S=700 \
    timeout 800 python bench.py >> "$LOG" 2>&1 || say "2d exited nonzero"

say "r4c stage 2e: full 30-frame confirmation at the bench default"
UMGEN_BENCH_FRAMES=30 UMGEN_BENCH_BUDGET_S=1200 \
    timeout 1300 python bench.py >> "$LOG" 2>&1 || say "2e exited nonzero"

say "r4c done"
