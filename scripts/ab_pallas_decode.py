"""Quality A/B: Pallas fast paths vs pure-XLA on a trained checkpoint.

VERDICT round-1 "weak #3": the Pallas whole-decode kernel can flip bf16
argmax ties vs the XLA scan (~1 row in 256 with random weights), and the
shipped Predictor enables it by default — so record a BLEU/Lev/acc A/B on
a real trained checkpoint before calling the fast path quality-neutral.

Runs `evaluate` on the given checkpoint 4 ways over the same split:
  xla        — use_pallas_decode=False, pallas_conv1=False (pure XLA)
  decode     — Pallas whole-decode kernel, XLA encoder
  conv1      — XLA decode, Pallas conv1
  full       — Pallas decode + conv1 (+ chain if --chain): the shipped path

Usage:
  python scripts/ab_pallas_decode.py <ckpt_dir> [--data-dir D] [--split test]
         [--beam K] [--max-batches N] [--chain] [--out artifacts/...json]
"""

from __future__ import annotations

import argparse
import json
import os
import sys


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data-dir", default=None)
    ap.add_argument("--split", default="test")
    ap.add_argument("--beam", type=int, default=0)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--batch-size", type=int, default=None)
    ap.add_argument("--chain", action="store_true",
                    help="include hardware.pallas_chain in the 'full' variant")
    ap.add_argument("--int8", action="store_true",
                    help="add an 'int8' variant (hardware.int8_encoder under "
                    "the shipped Pallas decode path)")
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

    def build(decode: bool, conv1: bool, chain: bool, int8: bool = False) -> Predictor:
        pred = Predictor.from_checkpoint(
            args.ckpt, use_pallas_conv1=conv1, use_pallas_chain=chain,
            use_int8_encoder=int8,
        )
        pred.cfg.hardware.use_pallas_decode = decode
        return pred

    variants = {
        "xla": (False, False, False, False),
        "decode": (True, False, False, False),
        "conv1": (False, True, False, False),
        "full": (True, True, args.chain, False),
    }
    if args.int8:
        # int8 conv blocks under the shipped decode path (conv1 stays the
        # exact Pallas kernel; int8 covers blocks 2..n), vs the xla baseline.
        variants["int8"] = (True, True, False, True)
    results = {}
    for name, (decode, conv1, chain, int8) in variants.items():
        pred = build(decode, conv1, chain, int8)
        r = evaluate_checkpoint(
            args.ckpt,
            data_dir=args.data_dir,
            split=args.split,
            beam_size=args.beam,
            max_batches=args.max_batches,
            batch_size=args.batch_size,
            predictor=pred,
        )
        keep = {
            k: r[k]
            for k in ("bleu", "levenshtein", "token_accuracy", "num_images",
                      "images_per_second")
            if k in r
        }
        results[name] = keep
        print(f"{name:7s}: {json.dumps(keep)}", flush=True)

    base = results["xla"]
    deltas = {
        name: {k: results[name][k] - base[k] for k in ("bleu", "levenshtein", "token_accuracy") if k in base}
        for name in results
    }
    out = {
        "checkpoint": args.ckpt,
        "split": args.split,
        "beam": args.beam,
        "chain_in_full": bool(args.chain),
        "results": results,
        "delta_vs_xla": deltas,
    }
    print(json.dumps(out["delta_vs_xla"], indent=2))
    if args.out:
        os.makedirs(os.path.dirname(args.out), exist_ok=True)
        with open(args.out, "w") as f:
            json.dump(out, f, indent=2)
        print(f"wrote {args.out}")


if __name__ == "__main__":
    main()
