#!/bin/bash
# Round-3b TPU measurements — follow-ups to r3a:
#   * a properly-trained tiny checkpoint (r3a stage 1 showed 0.28
#     drafts/chunk on the 300-step ckpt whose TAR loss was still ~7.5 of
#     ln(8192)=9.0 — acceptance tracks TAR confidence, so measure the
#     curve, not one undertrained point; stage-2 divergence is likewise
#     chaos-dominated on near-tie logits)
#   * per-segment acceptance (map/image vs +bbox) on that checkpoint
#   * divergence/quality re-runs where token agreement is meaningful
#   * recompute-mode phase attribution (VERDICT task 5)
#   * first on-chip run of speculative x batch-split composition

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r3b stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r3b stage 1: train tiny 3000 steps (lr 3e-4) -> output/tiny_ckpt3k"
timeout 3600 python -m umgen_tpu.tools.train --model_scale tiny \
    --steps 3000 --synthetic_data 8 --window 4 --lr 3e-4 \
    --ckpt_dir output/tiny_ckpt3k --save_every 3000 >> "$LOG" 2>&1

say "r3b stage 2: speculative acceptance on 3k ckpt (K=8, with bbox)"
timeout 2400 python scripts/measure_spec_acceptance.py \
    --ckpt output/tiny_ckpt3k/final --frames 3 --k 8 --sample topk \
    >> "$LOG" 2>&1

say "r3b stage 3: speculative acceptance on 3k ckpt (K=8, --no_bbox)"
timeout 2400 python scripts/measure_spec_acceptance.py \
    --ckpt output/tiny_ckpt3k/final --frames 3 --k 8 --sample topk \
    --no_bbox >> "$LOG" 2>&1

say "r3b stage 4: cache divergence on 3k ckpt"
timeout 2400 python scripts/measure_cache_divergence.py \
    --ckpt output/tiny_ckpt3k/final --frames 30 --cond 4 >> "$LOG" 2>&1

say "r3b stage 5: quantization quality budget on 3k ckpt"
timeout 2400 python scripts/measure_quant_quality.py \
    --ckpt output/tiny_ckpt3k/final --frames 30 --cond 4 >> "$LOG" 2>&1

say "r3b stage 6: recompute-mode phase attribution (B=4, larger)"
timeout 2700 python scripts/probe_recompute.py --batch 4 >> "$LOG" 2>&1

say "r3b stage 7: speculative x batch-split on chip (B=8 win-8 bb=4 W4 K=8)"
UMGEN_BENCH_BATCH=8 UMGEN_BENCH_WINDOW=8 UMGEN_BENCH_BATCH_BLOCK=4 \
    UMGEN_BENCH_W4=1 UMGEN_BENCH_SPEC_K=8 UMGEN_BENCH_FRAMES=6 \
    timeout 2700 python bench.py >> "$LOG" 2>&1

say "r3b done"
