"""Bucketed-vs-fixed evaluation artifact on a trained checkpoint.

Runs `evaluate` twice on the same split — fixed 64x800 canvas vs
aspect-ratio buckets — and records both metric sets and wall-clock.
Quality must match (bucketed decode is output-identical by construction,
tests/test_buckets.py); the throughput delta is the bucketing win on a
naturally mixed-width corpus.

Usage:
  python scripts/eval_bucketed.py <ckpt_dir> [--split test]
      [--widths 320,512,800] [--max-batches N] [--out artifacts/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--split", default="test")
    ap.add_argument("--widths", default="320,512,800")
    ap.add_argument("--max-batches", type=int, default=None)
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

    pred = Predictor.from_checkpoint(args.ckpt)
    widths = [int(w) for w in args.widths.split(",")]
    keep = ("bleu", "levenshtein", "token_accuracy", "num_images",
            "images_per_second", "decode_seconds", "bucketed")

    def run(bucket_widths):
        r = evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split=args.split,
            max_batches=args.max_batches, bucket_widths=bucket_widths,
            predictor=pred,
        )
        return {k: r[k] for k in keep if k in r}

    fixed = run(None)
    print(f"fixed   : {json.dumps(fixed)}", flush=True)
    bucketed = run(widths)
    print(f"bucketed: {json.dumps(bucketed)}", flush=True)

    out = {
        "checkpoint": args.ckpt,
        "split": args.split,
        "bucket_widths": widths,
        "fixed": fixed,
        "bucketed": bucketed,
        "bleu_delta": bucketed["bleu"] - fixed["bleu"],
    }
    print(json.dumps({"bleu_delta": out["bleu_delta"]}))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
