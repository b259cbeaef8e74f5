"""Beam length-penalty sweep: pick the best exponent on the validate split,
then confirm on test.

The reference claims beam improves BLEU ~7.2% over greedy (index.html report;
SURVEY §6) but ships no working beam path (the Predictor clamps it off,
reference predictor.py:163-167).  Our batched beam with length_penalty 0
shows the classic short-hypothesis bias on the hard corpus (beam-5 BLEU
0.736 < greedy 0.769, artifacts/mathtext_hard_grid) — score normalization
score/len^p is the standard fix (GNMT-style).  This sweep measures it.

Usage:
  python scripts/beam_lp_sweep.py <ckpt_dir> [--beam 5]
      [--penalties 0,0.3,0.6,1.0] [--val-batches N] [--out artifacts/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--penalties", default="0,0.3,0.6,1.0")
    ap.add_argument("--val-batches", type=int, default=None)
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--out", default=None)
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    sys.path.insert(0, repo)
    import jax

    cache_dir = os.path.join(repo, ".cache", "jax")
    os.makedirs(cache_dir, exist_ok=True)
    jax.config.update("jax_compilation_cache_dir", cache_dir)
    jax.config.update("jax_persistent_cache_min_compile_time_secs", 1.0)

    from img2latex_tpu.training.evaluator import evaluate_checkpoint
    from img2latex_tpu.training.predictor import Predictor

    # One Predictor for every variant: the beam kernel/scan runs once per
    # batch shape and the penalty only changes the host-side backtrack
    # normalization -> recompiles are limited to the small selection program.
    pred = Predictor.from_checkpoint(args.ckpt)
    penalties = [float(p) for p in args.penalties.split(",")]

    results = {"checkpoint": args.ckpt, "beam": args.beam, "val": {}, "test": {}}
    keep = ("bleu", "levenshtein", "token_accuracy", "num_images", "images_per_second")

    def run(split, lp, max_batches):
        r = evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split=split, beam_size=args.beam,
            length_penalty=lp, max_batches=max_batches, predictor=pred,
        )
        return {k: r[k] for k in keep if k in r}

    for lp in penalties:
        results["val"][str(lp)] = run("validate", lp, args.val_batches)
        print(f"val lp={lp}: {json.dumps(results['val'][str(lp)])}", flush=True)

    best = max(penalties, key=lambda p: results["val"][str(p)]["bleu"])
    results["best_penalty"] = best
    results["test"][str(best)] = run("test", best, None)
    print(f"test lp={best}: {json.dumps(results['test'][str(best)])}", flush=True)

    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(results, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
