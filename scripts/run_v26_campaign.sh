#!/bin/bash
# Round-5 v26 campaign: the embedding-level attack on the last open target.
#
# v25 (reports/quality-v25-joint.json) proved the fp/hr side is stable under
# target (1.33 [0.58-2.63], runs [1,1,1,2,2,1]) and localized the remaining
# FAR_adv miss (0.0875 vs 0.05) precisely:
# * the residual is SATURATED (threshold curve flat to 0.99 — no operating
#   point rescues it), and
# * it sits on UNSEEN swaps ("hey bully" 0.5, "hey putty" 0.458) and DOUBLE
#   swaps ("hate buddies" 0.583, "hate bully" 0.542) — head-level emphasis on
#   48 single-swap texts did not generalize across the collision family.
# That is a frozen-embedding representation gap — the same failure mode the
# round-3 focus cluster fixed for "hay bunny" — so v26 changes the embedding:
#
# * --embedding embedding-v8.npz: v7's recipe (8192 texts x 4 renderings,
#   NT-Xent + hard-pair margin, adversarial clusters, focus cluster on the
#   wake phrase) EXTENDED with --focus-swap-depth 48 --focus-swap-max-swaps 2
#   (24 single + 24 double swap-collision texts in the focus cluster, every
#   batch, margin-repelled from the phrase's renderings).
# * --collision-negatives 96 --collision-swap-depth 2: head channel keeps
#   v25's 48 singles and adds 48 doubles.
# * Everything else is byte-for-byte the v25 recipe (prefix negatives,
#   collision-salad streams, adversarial-clip mining, reverb positives, K=4 +
#   consolidate under the recall-gated selector).
#
# The v8 embedding invalidates every cached feature shard (CLAUDE.md
# invariant), so this uses a fresh dataset dir; expect v25's cold-cache
# wall-clock (~2 h on one v5e chip).
#
#   bash scripts/run_v26_campaign.sh /tmp/embedding-v8.npz [DATASET_DIR]
set -eu
cd "$(dirname "$0")/.."
EMBEDDING="${1:?usage: run_v26_campaign.sh <embedding-v8.npz> [DATASET_DIR]}"
DATASET_DIR="${2:-/tmp/qeval-v26/data}"
mkdir -p "$DATASET_DIR" /tmp/qeval-v26/ckpt
exec python scripts/quality_eval.py \
  --embedding "$EMBEDDING" \
  --train-samples 3200 --partial-samples 400 --stream-samples 4800 \
  --val-stream-samples 20000 --steps 6000 --layers 3 --layer-dim 128 \
  --mine-rounds 6 --mine-floor 0.1 --seed 0 \
  --adversarial-phrases 150 --hard-pair-boost 5 \
  --prefix-negatives 48 --collision-streams \
  --collision-negatives 96 --collision-swap-depth 2 \
  --mine-adversarial-clips 384 \
  --reverb-positives 384 \
  --select-runs 4 --select-consolidate \
  --heldout-samples 800 --sliding-clips 40 \
  --stream-minutes 60 --stream-seeds 6 --calibration-seeds 2 \
  --far-attribution 24 \
  --dataset-dir "$DATASET_DIR" \
  --checkpoint-dir /tmp/qeval-v26/ckpt \
  --out reports/quality-v26-embedv8.json
