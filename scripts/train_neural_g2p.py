#!/usr/bin/env python
"""
Train the neural-G2P option (reference PretrainedPhonemizer parity,
phonemizer.py:15-50) by distillation and report held-out golden accuracy.

Training table, in priority order:
* the embedded golden lexicon (stress-stripped CMUdict truth) from
  scripts/g2p_accuracy.py, minus a held-out eval split,
* a full CMU dictionary when ``HEYBUDDY_CMUDICT`` points at one (sampled),
* the rule engine's silver labels over the bundled wordlist.

The held-out golden split is never trained on, so the reported word/phone
accuracy measures generalization to unseen words, not memorization.

Usage: python scripts/train_neural_g2p.py -o heybuddy_tpu/assets/g2p-neural.npz
"""

from __future__ import annotations

import argparse
import json
import os
import sys

sys.path.insert(0, os.path.join(os.path.dirname(__file__), ".."))
sys.path.insert(0, os.path.dirname(__file__))


def main() -> None:
    p = argparse.ArgumentParser(description=__doc__)
    p.add_argument("-o", "--out", default="g2p-neural.npz")
    p.add_argument("--steps", type=int, default=6000)
    p.add_argument("--dim", type=int, default=128)
    p.add_argument("--layers", type=int, default=2)
    p.add_argument("--lr", type=float, default=3e-4)
    p.add_argument("--seed", type=int, default=0)
    p.add_argument("--heldout-every", type=int, default=4,
                   help="hold out every Nth golden word for eval")
    p.add_argument("--cmudict-sample", type=int, default=20000,
                   help="max CMUdict entries to add when available")
    p.add_argument("--tpu", action="store_true",
                   help="train on the default backend instead of forcing CPU "
                        "(the model is tiny; CPU avoids contending for the chip)")
    p.add_argument("--json", default=None, help="write metrics JSON here")
    args = p.parse_args()

    if not args.tpu:
        import jax

        jax.config.update("jax_platforms", "cpu")

    from g2p_accuracy import GOLDEN, edit_distance
    from heybuddy_tpu.text.neural_g2p import NeuralG2P, train_neural_g2p
    from heybuddy_tpu.text.phonemizer import SimplePhonemizer, load_cmudict
    from heybuddy_tpu.text.wordlist import WORDS
    from heybuddy_tpu.utils.log import logger

    golden = sorted(GOLDEN.items())
    heldout = dict(golden[:: args.heldout_every])
    table = {w: ph.split() for w, ph in golden if w not in heldout}

    cmu = load_cmudict()
    if cmu:
        import random

        rng = random.Random(args.seed)
        words = [w for w in cmu if w not in heldout and w.isalpha()]
        for w in rng.sample(words, min(args.cmudict_sample, len(words))):
            stripped = [ph.rstrip("012") for ph in cmu[w]]
            table.setdefault(w, stripped)
        logger.info(f"CMUdict available: training table {len(table)} words")
    rule = SimplePhonemizer(use_cmudict=False)
    import re

    for w in WORDS:
        if w not in heldout:
            table.setdefault(w, re.findall(r"\[([A-Z]+)\]", rule(w)))
    logger.info(
        f"training on {len(table)} words "
        f"({len(golden) - len(heldout)} golden + silver), "
        f"holding out {len(heldout)} golden words"
    )

    model, params = train_neural_g2p(
        table, steps=args.steps, lr=args.lr, seed=args.seed,
        model=NeuralG2P(dim=args.dim, layers=args.layers),
        log_every=max(args.steps // 10, 1),
    )

    def score(pairs: dict) -> dict:
        words = sorted(pairs)
        preds = model.decode(params, words)
        exact, dist, total = 0, 0, 0
        for w, pred in zip(words, preds):
            truth = pairs[w].split() if isinstance(pairs[w], str) else pairs[w]
            exact += pred == truth
            dist += edit_distance(pred, truth)
            total += len(truth)
        return {
            "words": len(words),
            "word_accuracy": round(exact / max(len(words), 1), 4),
            "phone_error_rate": round(dist / max(total, 1), 4),
        }

    train_golden = {w: ph for w, ph in golden if w not in heldout}
    metrics = {
        "train_golden": score(train_golden),
        "heldout_golden": score(heldout),
        "config": model.config,
        "steps": args.steps,
        "table_words": len(table),
        "cmudict": bool(cmu),
    }
    logger.info(f"train-golden: {metrics['train_golden']}")
    logger.info(f"heldout-golden: {metrics['heldout_golden']}")
    model.save(params, args.out)
    logger.info(f"saved {args.out}")
    if args.json:
        with open(args.json, "w") as f:
            json.dump(metrics, f, indent=1)


if __name__ == "__main__":
    main()
