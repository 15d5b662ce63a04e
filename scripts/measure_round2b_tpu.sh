#!/bin/bash
# Round-2b TPU measurements: compose the winners from measure_pending_tpu.sh.
#
# Findings so far (output/tpu_measurements.log):
#   - int4 OAR KV loses to int8 end-to-end (dequant overhead > DMA savings)
#   - W4A8 weights win ~7% at B=4 (1.406 -> 1.509 f/s)
#   - B=8 win-8 bb=2 is the best measured config: 1.678 f/s (5.24x)
#   - kernel grid: bb=4 slightly beats bb=2 at B=8 (3.36 vs 3.51 ms/step)
#
# This script measures the compositions, then a 30-frame run of the winner.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r2b stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r2b stage 1: B=8 win-8 bb=4 (int8 weights)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r2b stage 2: B=8 win-8 bb=4 + W4 weights"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 timeout 2700 python bench.py >> "$LOG" 2>&1

say "r2b stage 3: B=12 win-8 bb=4 + W4 (ring memory permitting)"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 timeout 2700 python bench.py >> "$LOG" 2>&1

say "r2b stage 4: 30-frame p50 of the best stage-1..3 config (win-8 B=8 bb=4 W4)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=30 timeout 3600 python bench.py \
    >> "$LOG" 2>&1

say "r2b done — update bench.py defaults + PERFORMANCE.md"
