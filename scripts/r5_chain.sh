#!/bin/bash
# Round-5 TPU chain: wait for r5a (quality budget) to release the relay,
# then run r5b (full-window B=5 push), the tiny PE pair, and r5c
# (calibrated relative-PE 2.4B + acceptance probes) back to back.
set -u
cd "$(dirname "$0")/.."
while kill -0 "$(cat /tmp/r5a.pid 2>/dev/null)" 2>/dev/null; do sleep 30; done
bash scripts/measure_round5b_tpu.sh
bash scripts/train_tiny_pe_pair.sh
bash scripts/measure_round5c_tpu.sh
echo "=== $(date -u +%H:%M:%S) r5 chain done" >> output/tpu_measurements.log
