#!/bin/bash
# Round-3a TPU measurements — VERDICT r2 tasks 1/2/3/7:
#   * the quality/divergence evidence for the lossy serving defaults
#     (r2c stages 5/6/6b that never ran), on the trained tiny checkpoint
#   * the unfinished r2d batch-scaling grid (int4 OAR KV at B=8; B=12/16
#     minimum-bytes probes)
#   * first end-to-end speculative bench at larger scale (whole-batch)
#   * fused-kernel parity tests on the real chip
#
# Probe stages use FRAMES=6 (p50 measured stable between 4 and 30 frames,
# PERFORMANCE.md); the winning config gets a full 30-frame confirmation
# in a later batch.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r3a stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r3a stage 1: speculative acceptance + e2e wall on trained tiny ckpt (K=8)"
timeout 2400 python scripts/measure_spec_acceptance.py \
    --ckpt output/tiny_ckpt/final --frames 3 --k 8 --sample topk \
    >> "$LOG" 2>&1

say "r3a stage 2: temporal-cache vs recompute divergence (trained ckpt)"
timeout 2400 python scripts/measure_cache_divergence.py \
    --ckpt output/tiny_ckpt/final --frames 30 --cond 4 >> "$LOG" 2>&1

say "r3a stage 3: quantization quality budget (trained ckpt)"
timeout 2400 python scripts/measure_quant_quality.py \
    --ckpt output/tiny_ckpt/final --frames 30 --cond 4 >> "$LOG" 2>&1

say "r3a stage 4: fused-kernel parity tests on the real chip"
UMGEN_TEST_TPU=1 timeout 3600 python -m pytest tests/test_decode_kernel.py \
    -x -q >> "$LOG" 2>&1

say "r3a stage 5: B=8 win-8 bb=4 + int4 OAR KV (v5i4; r2d stage 1 redo)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=0 UMGEN_BENCH_OAR_KV=int4 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3a stage 6: B=8 win-8 bb=4 + W4 + int4 OAR KV (w4i4)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_OAR_KV=int4 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3a stage 7: B=12 win-6 bb=4 + W4 (int8 KV — int4 KV lost at B<=4)"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=6 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3a stage 8: B=12 win-6 bb=4 + W4 + int4 OAR KV (HBM fallback)"
UMGEN_BENCH_BATCH=12 UMGEN_BENCH_WINDOW=6 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_OAR_KV=int4 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3a stage 9: B=16 win-4 bb=4 + W4 (throughput ceiling probe)"
UMGEN_BENCH_BATCH=16 UMGEN_BENCH_WINDOW=4 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3a stage 10: spec e2e at larger scale, random weights (overhead floor):"
say "              B=4 win-8 W4 whole-batch spec_k=8"
UMGEN_BENCH_BATCH=4 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=0 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_SPEC_K=8 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3a done"
