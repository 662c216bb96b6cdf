#!/bin/bash
# Round-5 v25 campaign: attack BOTH means at once — the joint target
# (fp/hr <= 1.5 AND FAR_adv <= 0.05 in one run) that rounds 2-4 never hit.
#
# Evidence driving the config (QUALITY.md "Round 4 tail", VERDICT round 4):
# * fp/hr side — keep everything v23 proved: 3200 train samples
#   (~21 adversarial renderings/text), 4800 stream-window negatives,
#   collision-salad streams, prefix negatives, 6 mining rounds,
#   consolidation available. v23 measured fp/hr 1.17 [0.47-2.40] — under
#   target for the first time.
# * FAR side — v23 paid FAR_adv 0.109 because NOTHING in training targets
#   the distribution FAR_adv is measured on (augmented full-view clips of
#   near-collision texts; mining harvested stream WINDOWS only), and the
#   round-4 attribution names the class: second-word near-collisions
#   ("hate buddy" 0.625, "hey buddies" 0.625, "hey duty" 0.5). Two new
#   channels attack that mean directly:
#     --collision-negatives 48   single-swap collision texts (exactly one
#                                word swapped for a phonetic neighbor) as a
#                                rendered training emphasis class, held-out
#                                texts excluded;
#     --mine-adversarial-clips 384  per mining round, render a FRESH
#                                augmented adversarial clip pool (disjoint
#                                seeds from every held-out cache) and
#                                harvest scorers >= the floor — the
#                                clip-metric mirror of stream-FP mining.
# * FRR side — --reverb-positives 384 adds the FRR-by-SNR reverb buckets'
#   exact distribution as dedicated positive coverage (the 0.21-0.31
#   mid-SNR reverb residual, VERDICT item 5).
# * Selection — K=4 + consolidated candidate under the round-5 selector:
#   recall c2 gates lexicographically FIRST (v23's 0.975 recall can no
#   longer win), FAR gates ahead of the graded penalty, and the penalty
#   prices the Poisson upper bound of selection fp/hr (short-stream zero
#   counts can't rescue a hot candidate).
#
# ~2-2.5 h on one chip (cold caches). Run from the repo root:
#   bash scripts/run_v25_campaign.sh [DATASET_DIR]
set -eu
cd "$(dirname "$0")/.."
DATASET_DIR="${1:-/tmp/qeval-v25/data}"
mkdir -p "$DATASET_DIR" /tmp/qeval-v25/ckpt
exec python scripts/quality_eval.py \
  --train-samples 3200 --partial-samples 400 --stream-samples 4800 \
  --val-stream-samples 20000 --steps 6000 --layers 3 --layer-dim 128 \
  --mine-rounds 6 --mine-floor 0.1 --seed 0 \
  --adversarial-phrases 150 --hard-pair-boost 5 \
  --prefix-negatives 48 --collision-streams \
  --collision-negatives 48 --mine-adversarial-clips 384 \
  --reverb-positives 384 \
  --select-runs 4 --select-consolidate \
  --heldout-samples 800 --sliding-clips 40 \
  --stream-minutes 60 --stream-seeds 6 --calibration-seeds 2 \
  --far-attribution 24 \
  --dataset-dir "$DATASET_DIR" \
  --checkpoint-dir /tmp/qeval-v25/ckpt \
  --out reports/quality-v25-joint.json
