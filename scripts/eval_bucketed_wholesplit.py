"""Bucketed-per-batch vs bucketed-whole-split comparison artifact (round-4
verdict next-step #6): on the natural width mix of a real corpus, run the
SAME bucketed evaluation through

  * the streaming chunked path (``predict_batch`` — host prep pipelined
    against device decode, 2 host RTTs per chunk), and
  * the resident per-bucket whole-split path
    (``Predictor.predict_split_bucketed`` — each bucket's canvases uploaded
    once, ONE lax.map dispatch + one fetch per bucket; ``--passes`` >= 2
    gives a measured steady window),

and write one JSON with both rows.  Quality must match exactly (the paths
are output-identical, tests/test_buckets.py); the delta is RTT/dispatch
economics.

Usage:
  python scripts/eval_bucketed_wholesplit.py CKPT --data-dir /tmp/mathtext_hard \
      --widths 256,384,512 --batch 256 --passes 3 \
      --out artifacts/<name>/bucketed_wholesplit_ab.json
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)

KEEP = (
    "num_images", "bleu", "levenshtein", "token_accuracy",
    "end_to_end_seconds", "decode_seconds", "compile_and_first_batch_seconds",
    "host_prep_seconds", "host_post_seconds", "cache_build_seconds",
    "setup_seconds", "steady_images", "images_per_second",
    "images_per_second_decode_only", "images_per_second_resident",
    "bucketed", "whole_split", "decode_passes",
)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--widths", default="256,384,512")
    ap.add_argument("--batch", type=int, default=256)
    ap.add_argument("--passes", type=int, default=3)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from img2latex_tpu.training.evaluator import evaluate_checkpoint
    from img2latex_tpu.training.predictor import Predictor

    pred = Predictor.from_checkpoint(args.ckpt)
    widths = [int(w) for w in args.widths.split(",")]

    def run(overrides, passes):
        r = evaluate_checkpoint(
            args.ckpt, predictor=pred, data_dir=args.data_dir,
            split=args.split, batch_size=args.batch,
            max_batches=args.max_batches, bucket_widths=widths,
            config_overrides=overrides, passes=passes,
        )
        return {k: r[k] for k in KEEP if k in r}

    perbatch = run({"data.device_cache": False}, 1)
    print("bucketed per-batch :", json.dumps(perbatch), flush=True)
    wholesplit = run({"data.device_cache": True}, args.passes)
    print("bucketed wholesplit:", json.dumps(wholesplit), flush=True)

    # The two paths run the same per-row impl but are DIFFERENT XLA programs
    # (chunked per-batch vs lax.map whole-split); bf16 reduction-order drift
    # can flip a near-tie argmax on a handful of rows on chip (measured
    # |dBLEU| 2.5e-5 on the r5 ResNet flagship).  Exact equality is asserted
    # in the f32 CPU tests (tests/test_buckets.py); here guard against real
    # divergence only.
    dbleu = abs(perbatch["bleu"] - wholesplit["bleu"])
    assert dbleu < 1e-3, (
        f"bucketed paths diverged (|dBLEU| {dbleu}): the comparison is void"
    )
    out = {
        "ckpt": args.ckpt,
        "split": args.split,
        "widths": widths,
        "batch": args.batch,
        "passes": args.passes,
        "bleu_abs_delta": dbleu,
        "bucketed_perbatch": perbatch,
        "bucketed_wholesplit": wholesplit,
        "resident_speedup_vs_perbatch_e2e": (
            wholesplit.get("images_per_second_resident", 0)
            / max(perbatch["images_per_second"], 1e-9)
        ),
        "decode_only_ratio": (
            wholesplit.get("images_per_second_decode_only", 0)
            / max(perbatch.get("images_per_second_decode_only", 1e-9), 1e-9)
        ),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
