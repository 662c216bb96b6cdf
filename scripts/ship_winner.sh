#!/bin/bash
# Ship a quality-campaign winner: convert the winning checkpoint to the
# deployed ONNX artifact, replace the bundled browser model, and re-score the
# EXACT shipped file eval-only (VERDICT r4 item 3; reference deployment
# contract wakeword.py:316-332 — input [1,16,96] f32 -> output [1,1]).
#
#   bash scripts/ship_winner.sh reports/quality-v25-joint.npz v25 [DATASET_DIR] [EMBEDDING]
#
# With the optional EMBEDDING argument the winner pairs with a NEW frozen
# embedding: it replaces the bundled asset (heybuddy_tpu/assets/
# embedding-pretrained.npz) and the browser speech-embedding.onnx is
# re-exported from it BEFORE the head converts, so every shipped artifact
# (bundled weights, browser embedding, head) comes from the same space.
# DATASET_DIR should be the campaign's dir so held-out caches stay warm —
# when shipping a new embedding it MUST be that campaign's dir (feature
# shards from the old space do not transfer; CLAUDE.md invariant).
#
# The eval-only pass scores browser/models/hey-buddy.onnx itself through the
# runtime evaluator (scripts/quality_eval.py --eval-only *.onnx), so the
# committed numbers describe the byte-identical artifact users download —
# same discipline as reports/quality-shipped-evalonly.json (round 4).
set -eu
cd "$(dirname "$0")/.."
WINNER="${1:?usage: ship_winner.sh <winner.npz> <tag> [dataset_dir] [embedding.npz]}"
TAG="${2:?usage: ship_winner.sh <winner.npz> <tag> [dataset_dir] [embedding.npz]}"
DATASET_DIR="${3:-/tmp/qeval-v25/data}"
EMBEDDING="${4:-}"
if [ -n "$EMBEDDING" ]; then
  cp "$EMBEDDING" heybuddy_tpu/assets/embedding-pretrained.npz
  python scripts/export_browser_assets.py browser/models
fi
python -m heybuddy_tpu.cli convert "$WINNER" browser/models/hey-buddy.onnx
exec python scripts/quality_eval.py \
  --eval-only browser/models/hey-buddy.onnx \
  --heldout-samples 800 --sliding-clips 40 \
  --stream-minutes 60 --stream-seeds 6 --calibration-seeds 2 \
  --far-attribution 24 --seed 0 \
  --dataset-dir "$DATASET_DIR" \
  --out "reports/quality-shipped-${TAG}-evalonly.json"
