#!/bin/bash
# Round-5a: the N>=8 quality certification of the lossy serving defaults
# (VERDICT r4 task 2 — "finish the quantized leg in the first hour").
#
# The exact command PERFORMANCE.md §4 prescribed, with the two r4
# failure modes fixed: chunk 2 (not the chunk-4 one-shot OOM) and
# --configs validated (a typo can no longer silently drop the quantized
# leg).  A_fp_reference always runs too (agreement needs it), so this
# one invocation yields the full fp-vs-W4A8 table at N=8 x 3 seeds.

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r5a stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

CKPT=output/large_ckpt8/final
[ -d "$CKPT" ] || CKPT=$(ls -d output/large_ckpt8/step_* 2>/dev/null | tail -1)
say "r5a stage 1: quality budget N=8 x 3 seeds, A vs D, chunk 2, on $CKPT"
timeout 7200 python scripts/measure_quant_quality.py \
    --ckpt "$CKPT" --scale larger --frames 12 --cond 4 --window 8 \
    --sample topk --scenes 8 --seeds 3 --chunk 2 \
    --configs D_w4_stack >> "$LOG" 2>&1 \
    || say "stage 1 exited nonzero"
say "r5a done"
