#!/bin/bash
# Round-2c TPU measurements: recompute-mode re-measure with the current
# kernel stack (VERDICT item 8 — the old 0.89x/0.109-f/s rows predate the
# v5 flat-cache kernel and pre-split RNG), trained-tiny-checkpoint runs
# (VERDICT item 4: cache divergence; roadmap item 2: spec acceptance), and
# the TPU-only kernel test tier on the real chip.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r2c stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r2c stage 1: recompute mode, B=4, current kernel stack"
UMGEN_BENCH_TAR_MODE=recompute UMGEN_BENCH_BATCH=4 \
    timeout 3000 python bench.py >> "$LOG" 2>&1

say "r2c stage 2: recompute mode, B=2"
UMGEN_BENCH_TAR_MODE=recompute UMGEN_BENCH_BATCH=2 \
    timeout 3000 python bench.py >> "$LOG" 2>&1

say "r2c stage 4: train tiny checkpoint (300 steps, synthetic)"
timeout 3000 python -m umgen_tpu.tools.train --model_scale tiny \
    --steps 300 --batch_size 4 --window 4 --synthetic_data 8 \
    --ckpt_dir output/tiny_ckpt --save_every 300 >> "$LOG" 2>&1

say "r2c stage 5: speculative acceptance on the trained checkpoint (K=8)"
timeout 1800 python scripts/measure_spec_acceptance.py \
    --ckpt output/tiny_ckpt/final --frames 3 --k 8 --sample topk \
    >> "$LOG" 2>&1

say "r2c stage 6: temporal-cache divergence, 30 frames greedy"
timeout 2400 python scripts/measure_cache_divergence.py \
    --ckpt output/tiny_ckpt/final --frames 30 --cond 4 >> "$LOG" 2>&1

say "r2c stage 6b: compound quant quality budget on the trained checkpoint"
timeout 2400 python scripts/measure_quant_quality.py \
    --ckpt output/tiny_ckpt/final --frames 30 --cond 4 >> "$LOG" 2>&1

say "r2c stage 7: TPU-only kernel tests on the real chip"
UMGEN_TEST_TPU=1 timeout 3000 python -m pytest tests/test_decode_kernel.py \
    -q -x >> "$LOG" 2>&1

say "r2c done"
