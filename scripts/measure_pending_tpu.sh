#!/bin/bash
# Pending TPU measurements (PERFORMANCE.md roadmap items 1/4/6).
#
# Run when the axon relay is healthy:  bash scripts/measure_pending_tpu.sh
# Every stage is individually bounded; results append to
# output/tpu_measurements.log.  Stages are ordered safest-first; the
# whole-batch B=8 kernel shape that once wedged the relay is NOT run
# (batch-split grids only).

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "stage 1: kernel grid B=2 (v5 baseline, int4 KV, w4i4, multi-query)"
timeout 1500 python scripts/bench_decode_kernel.py \
    --versions v5,v5i4,w4i4,v5mq8,v5mqi48,w4mq8,w4mqi48 --b 2 --steps 256 --n 3 \
    >> "$LOG" 2>&1

say "stage 2: kernel grid B=4"
timeout 1500 python scripts/bench_decode_kernel.py \
    --versions v5,v5i4,w4i4,v5mq8,v5mqi48,w4mq8,w4mqi48 --b 4 --steps 256 --n 3 \
    >> "$LOG" 2>&1

say "stage 3: short-prefix shape (segment slices)"
timeout 1200 python scripts/bench_decode_kernel.py \
    --versions v5,v5i4,w4i4 --b 4 --steps 256 --n 3 --s 1032 \
    >> "$LOG" 2>&1

say "stage 4: B=8 batch-split grids (NEVER whole-batch at B=8)"
timeout 1500 python scripts/bench_decode_kernel.py \
    --versions v5bb2,v5bb4,v5i4bb2,w4i4bb2 --b 8 --steps 256 --n 3 \
    >> "$LOG" 2>&1

say "stage 5: end-to-end bench, int4 OAR KV at the default config"
UMGEN_BENCH_OAR_KV=int4 timeout 2400 python bench.py >> "$LOG" 2>&1

say "stage 6: end-to-end B=8 window-8 with batch-split bb=2"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=2 \
    timeout 2400 python bench.py >> "$LOG" 2>&1

say "stage 7: end-to-end B=6 window-12 with int4 OAR KV"
UMGEN_BENCH_BATCH=6 UMGEN_BENCH_WINDOW=12 UMGEN_BENCH_OAR_KV=int4 \
    timeout 2400 python bench.py >> "$LOG" 2>&1

say "stage 8: end-to-end w4i4 (int4 weights + int4 KV) at the default"
UMGEN_BENCH_W4=1 UMGEN_BENCH_OAR_KV=int4 timeout 2400 python bench.py \
    >> "$LOG" 2>&1

say "done — review $LOG and update bench.py defaults + PERFORMANCE.md"
