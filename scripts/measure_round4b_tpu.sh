#!/bin/bash
# Round-4b: train the 2.4B at the SERVING window (8 frames) so cached
# rollouts + speculative decoding run fully in-regime at any depth
# (VERDICT r3 task 2).  With the new tpe clamp (config.tpe_clamp=7 from
# train_meta.json), serving depth T=20+ never leaves the trained regime:
# ring window 8 == training window 8, tpe rows 0..7 all trained.
#
# Stages:
#   1. 30-step memory/step-time probe at window 8
#   2. full training run (2000 steps, save every 500) -> output/large_ckpt8
#   3. pre-quantize the new final into the serving artifact
#   4. acceptance at serving config (spec_k=8) + plain bench dress rehearsal

set -u
cd "$(dirname "$0")/.."
LOG=output/tpu_measurements.log
mkdir -p output
say() { echo "=== $(date -u +%H:%M:%S) $*" | tee -a "$LOG"; }

say "r4b stage 0: relay health"
timeout 300 python -c "import jax; print(jax.devices())" >> "$LOG" 2>&1 \
    || { say "relay DOWN — aborting"; exit 1; }

say "r4b stage 1: window-8 probe (30 steps, B=1, sign-SGD bf16)"
timeout 2400 python -m umgen_tpu.tools.train --model_scale larger \
    --steps 30 --batch_size 1 --window 8 --lr 3e-4 \
    --optimizer sign_sgd --param_dtype bfloat16 --remat \
    --synthetic_data 6 --ckpt_dir output/large_ckpt8 --save_every 0 \
    --log_every 5 >> "$LOG" 2>&1 \
    || { say "stage 1 FAILED (OOM or crash) — stopping"; exit 1; }

say "r4b stage 2: full window-8 training (2000 steps)"
# a timeout here is NOT fatal: stage 3 falls back to the newest step_*
# checkpoint (save_every 400) so the pipeline still ships a trained
# serving artifact inside the round budget
timeout "${R4B_TRAIN_BUDGET_S:-11000}" python -m umgen_tpu.tools.train \
    --model_scale larger \
    --steps "${R4B_STEPS:-2000}" --batch_size 1 --window 8 --lr 3e-4 \
    --optimizer sign_sgd --param_dtype bfloat16 --remat \
    --synthetic_data 6 --ckpt_dir output/large_ckpt8 --save_every 400 \
    --log_every 20 >> "$LOG" 2>&1 \
    || say "stage 2 exited nonzero (timeout or crash) — continuing with newest ckpt"

say "r4b stage 3: pre-quantize new final -> serving artifact"
# pick the newest checkpoint if the full run timed out before "final"
SRC=output/large_ckpt8/final
[ -d "$SRC" ] || SRC=$(ls -d output/large_ckpt8/step_* 2>/dev/null | tail -1)
[ -n "$SRC" ] || { say "stage 3: no checkpoint found"; exit 1; }
say "stage 3 src=$SRC"
PALLAS_AXON_POOL_IPS= JAX_PLATFORMS=cpu timeout 2400 \
    python scripts/make_serving_ckpt.py \
    --src "$SRC" \
    --dst output/large_ckpt/serving >> "$LOG" 2>&1 \
    || { say "stage 3 FAILED"; exit 1; }
# the bench conditions trained serving on the training distribution's
# scene clips at output/large_ckpt/synthetic (bench.py data_dir fallback)
mkdir -p output/large_ckpt
# -sfn: replace even a dangling symlink ([ -e ] follows links, so a
# dangling one made the old guard skip ln and the bench silently ran
# without conditioning data — ADVICE r4)
ln -sfn ../large_ckpt8/synthetic output/large_ckpt/synthetic

say "r4b stage 4a: spec acceptance at serving config (K=8, win-8, clamp)"
UMGEN_BENCH_SPEC_K=8 UMGEN_BENCH_FRAMES=8 UMGEN_BENCH_BUDGET_S=1200 \
    timeout 1400 python bench.py >> "$LOG" 2>&1

say "r4b stage 4b: plain bench dress rehearsal (driver contract timing)"
timeout 700 python bench.py >> "$LOG" 2>&1

say "r4b done"
