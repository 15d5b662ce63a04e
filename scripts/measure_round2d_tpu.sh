#!/bin/bash
# Round-2d TPU measurements: the B=8 KV-stream hypothesis + scale-out.
#
# At B<=4 int4 OAR KV measured as a LOSS (nibble unpack > DMA saving) —
# but at B=8 the KV stream is ~4x the weight stream, so the tradeoff may
# flip.  Also probes B=12/16 with the minimum-bytes config (the TAR rings
# cap per-chip batch; int4 rings + win-8 + W4 weights free the most HBM).

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r2d stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r2d stage 1: B=8 win-8 bb=4 + int4 OAR KV (v5i4 batch-split)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=0 UMGEN_BENCH_OAR_KV=int4 timeout 2700 python bench.py \
    >> "$LOG" 2>&1

say "r2d stage 2: B=8 win-8 bb=4 + W4 + int4 OAR KV (w4i4 batch-split)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_OAR_KV=int4 timeout 2700 python bench.py \
    >> "$LOG" 2>&1

# B=12 win-8 OOMs (r2b stage 3: 17.89G vs 15.75G HBM — rings dominate);
# win-6 cuts the rings 12.7 → 9.5 GB.
say "r2d stage 3: B=12 win-6 bb=4 + W4 + int4 OAR KV (max-batch probe)"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=6 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_OAR_KV=int4 timeout 2700 python bench.py \
    >> "$LOG" 2>&1

say "r2d stage 4: B=16 win-4 bb=4 + W4 + int4 OAR KV (throughput ceiling probe)"
UMGEN_BENCH_BATCH=16 UMGEN_BENCH_WINDOW=4 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_OAR_KV=int4 timeout 2700 python bench.py \
    >> "$LOG" 2>&1

say "r2d done"
