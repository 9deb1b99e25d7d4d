#!/bin/bash
# Train-step A/B at batch 1 (the BLD-finetune recipe batch; batch 2 exceeds
# HBM in the timing harness — see PERFORMANCE.md "Training performance").
cd "$(dirname "$0")/.."
set -x
timeout 4200 python probes/bench_train.py --batch 1              2>&1 | tail -3
timeout 4200 python probes/bench_train.py --batch 1 --no_pallas  2>&1 | tail -3
timeout 4200 python probes/bench_train.py --batch 1 --no_remat   2>&1 | tail -3
echo QUEUE2_DONE
