#!/bin/bash
# Sequential TPU probe queue. First pass warms the persistent compile cache
# (timings may be inflated if the host is busy); re-run with an idle host
# for clean numbers — compiles then hit .jax_cache.
cd "$(dirname "$0")/.."
set -x
timeout 4200 python probes/bench_train.py            2>&1 | tail -2
timeout 4200 python probes/bench_train.py --no_pallas 2>&1 | tail -2
timeout 4200 python probes/bench_train.py --no_remat  2>&1 | tail -2
timeout 4200 python probes/bench_compose_bisect.py    2>&1 | tail -12
timeout 4200 python probes/bench_forward_breakdown.py 2>&1 | tail -20
echo QUEUE_DONE
