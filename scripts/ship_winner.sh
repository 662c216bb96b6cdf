#!/bin/bash
# Ship a quality-campaign winner: convert the winning checkpoint to the
# deployed ONNX artifact, replace the bundled browser model, and re-score the
# EXACT shipped file eval-only (VERDICT r4 item 3; reference deployment
# contract wakeword.py:316-332 — input [1,16,96] f32 -> output [1,1]).
#
#   bash scripts/ship_winner.sh reports/quality-v25-joint.npz v25
#
# The eval-only pass scores browser/models/hey-buddy.onnx itself through the
# runtime evaluator (scripts/quality_eval.py --eval-only *.onnx), so the
# committed numbers describe the byte-identical artifact users download —
# same discipline as reports/quality-shipped-evalonly.json (round 4).
set -eu
cd "$(dirname "$0")/.."
WINNER="${1:?usage: ship_winner.sh <winner.npz> <tag>}"
TAG="${2:?usage: ship_winner.sh <winner.npz> <tag>}"
python -m heybuddy_tpu.cli convert "$WINNER" browser/models/hey-buddy.onnx
exec python scripts/quality_eval.py \
  --eval-only browser/models/hey-buddy.onnx \
  --heldout-samples 800 --sliding-clips 40 \
  --stream-minutes 60 --stream-seeds 6 --calibration-seeds 2 \
  --far-attribution 24 --seed 0 \
  --dataset-dir /tmp/qeval-v25/data \
  --out "reports/quality-shipped-${TAG}-evalonly.json"
