"""On-chip whole-split resident evaluate (round-4 headline artifact).

Runs ``evaluate_checkpoint`` with ``data.device_cache`` + the whole-split
lax.map program (``Predictor._decode_split_fn``) and ``passes=2`` so the
second dispatch+fetch measures the resident regime honestly (split in HBM,
executable built).  Compare against the round-3 per-batch loop artifact
(``predictions_devicecache_cc_b1024``: resident 2,932 img/s against
decode-only 15,426 — the gap was 2 host RTTs per batch on the tunnel).

Usage:
  python scripts/eval_whole_split.py CKPT --data-dir /tmp/mathtext_hard \
      --batch 1024 --out artifacts/mathtext_hard_grid_v2/predictions_wholesplit_b1024
"""

from __future__ import annotations

import argparse
import json
import os
import sys

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--passes", type=int, default=2)
    ap.add_argument("--beam", type=int, default=0)
    ap.add_argument("--canvas-cache", default=None)
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    from img2latex_tpu.training.evaluator import evaluate_checkpoint

    overrides = {"data.device_cache": True}
    if args.canvas_cache:
        overrides["data.canvas_cache_dir"] = args.canvas_cache
    out = evaluate_checkpoint(
        args.ckpt,
        data_dir=args.data_dir,
        split=args.split,
        batch_size=args.batch,
        beam_size=args.beam,
        output_dir=args.out,
        config_overrides=overrides,
        passes=args.passes,
    )
    summary = {
        k: out[k]
        for k in (
            "num_images", "bleu", "levenshtein", "token_accuracy",
            "end_to_end_seconds", "decode_seconds",
            "compile_and_first_batch_seconds", "cache_build_seconds",
            "setup_seconds", "host_post_seconds", "steady_images",
            "images_per_second", "images_per_second_decode_only",
            "images_per_second_resident", "whole_split", "decode_passes",
        )
        if k in out
    }
    print(json.dumps(summary, indent=2))


if __name__ == "__main__":
    main()
