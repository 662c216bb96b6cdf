#!/bin/bash
# Round-5 quality campaign: the combination round 4 proved out but did not
# get to run — prefix-negative hard class (fixed "hey but" 0.5 -> 0.0 and
# cut gated fp/hr to 1.83 in v21) TOGETHER with K=4 selection under the
# FAR-gated, Poisson-upper-bound selector (scripts/quality_eval.py round-4
# fix), so a FAR-weak consolidated draw can no longer win on stream luck.
# One chip, ~50 min training/selection + ~25 min held-out measurement.
# Run from the repo root:  bash scripts/run_r5_campaign.sh [DATASET_DIR]
set -eu
cd "$(dirname "$0")/.."
DATASET_DIR="${1:-/tmp/qeval-r5/data}"
mkdir -p "$DATASET_DIR" /tmp/qeval-r5/ckpt
exec python scripts/quality_eval.py \
  --train-samples 1200 --partial-samples 400 --stream-samples 2400 \
  --val-stream-samples 20000 --steps 4000 --layers 3 --layer-dim 128 \
  --mine-rounds 6 --mine-floor 0.1 --seed 0 \
  --adversarial-phrases 150 --hard-pair-boost 5 \
  --prefix-negatives 48 \
  --select-runs 4 --select-consolidate \
  --heldout-samples 800 --sliding-clips 40 \
  --stream-minutes 60 --stream-seeds 6 --calibration-seeds 2 \
  --dataset-dir "$DATASET_DIR" \
  --checkpoint-dir /tmp/qeval-r5/ckpt \
  --out reports/quality-v22-prefixneg-select4.json
