#!/bin/bash
# End-of-round flagship eval runbook (single-tenant chip: run AFTER training
# is stopped). Usage: bash scripts/finish_round.sh /tmp/run_flagship
set -x
RUN=${1:-/tmp/run_flagship}
SCENE=${2:-/tmp/shiny_synth}

# 1. Final metrics on the latest saved PLY (test + train sets, map dumps).
timeout 3000 python scripts/eval.py -m "$RUN" -s "$SCENE" --preset refnerf \
    --skip_train 2>&1 | tail -20

# 2. Eval FPS at the published 800^2 surface (surfel + surfel2 exact).
timeout 2000 python scripts/bench_eval_fps.py -m "$RUN" -s "$SCENE" \
    --frames 10 2>&1 | tail -8

# 3. Rasterizer throughput (the driver's headline bench).
timeout 1200 python bench.py 2>&1 | tail -2
