#!/bin/bash
# End-of-round flagship eval runbook (single-tenant chip: run AFTER training
# is stopped). Usage: bash scripts/finish_round.sh <run_dir> <scene_dir> <artifacts_out>
# Fails loudly (nonzero exit) if the eval produced no metric.txt — the
# round's evidence MUST exist before anything claims it does (round-3
# VERDICT weak item 1).
set -x
RUN=${1:-/tmp/flagship_r5}
SCENE=${2:-/tmp/shiny_synth}
OUT=${3:-artifacts/run_flagship_r5}

# 1. Final metrics on the latest saved PLY (test set, map dumps).
timeout 3000 python scripts/eval.py -m "$RUN" -s "$SCENE" --preset refnerf \
    --skip_train 2>&1 | tail -20

# 2. Eval FPS at the published 800^2 surface (surfel + surfel2 exact).
timeout 2400 python scripts/bench_eval_fps.py -m "$RUN" -s "$SCENE" \
    --frames 10 2>&1 | tail -8

# 3. Rasterizer throughput (the driver's headline bench).
timeout 1200 python bench.py 2>&1 | tail -2

# 4. Distill evidence into the artifacts dir and verify it is real.
python scripts/distill_quality.py "$RUN" "$OUT"
set +x
fail=0
for f in "$OUT/QUALITY.md" "$OUT/psnr.json" "$OUT/train_log.json"; do
    [ -s "$f" ] || { echo "MISSING EVIDENCE: $f"; fail=1; }
done
if ! ls "$OUT"/metric*.txt >/dev/null 2>&1; then
    echo "MISSING EVIDENCE: $OUT/metric*.txt (eval.py did not produce metrics)"
    fail=1
fi
# Round-5 addition: the headline claim requires a LIVING env-GS cloud at the
# final mark (round-4's 28.81 was produced with a dead cloud and QUALITY.md
# hid it). The distiller prints an explicit verdict line — require ALIVE.
if ! grep -q "ALIVE" "$OUT/QUALITY.md"; then
    echo "EVIDENCE FAILURE: env-GS cloud not ALIVE at the final mark (see $OUT/QUALITY.md)"
    fail=1
fi
exit $fail
