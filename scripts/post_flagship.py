"""Post-flagship evaluation battery: everything the quality/perf headline
needs from a trained CNN flagship checkpoint, back-to-back on the chip.

Steps (each writes into artifacts/<name>/):
  1. beam length-penalty sweep on validate -> best lp
  2. test evaluate: beam-5 at best lp (greedy already in RESULTS.json)
  3. selective-beam gating-signal A/B (logp/margin/entropy capture curves)
  4. selective-beam capture at the best signal on test (live selective path)
  5. aspect-bucketed evaluate (pipelined + consistent accounting)
  6. device-cache evaluate (split-in-HBM steady state)

Usage:
  python scripts/post_flagship.py CKPT --data-dir /tmp/mathtext_hard
      --artifacts mathtext_hard_grid_v2 [--beam 5]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
sys.path.insert(0, REPO)


def run(cmd, **kw):
    print("+", " ".join(cmd), flush=True)
    t0 = time.time()
    r = subprocess.run(cmd, **kw)
    print(f"  -> rc={r.returncode} in {time.time() - t0:.0f}s", flush=True)
    if r.returncode != 0:
        sys.exit(r.returncode)


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--artifacts", required=True)
    ap.add_argument("--beam", type=int, default=5)
    ap.add_argument("--penalties", default="0,0.5,1.0,1.5,2.0")
    ap.add_argument("--buckets", default="256,384,512",
                    help="bucket widths for the bucketed evaluate")
    ap.add_argument("--skip", default="", help="comma list of step names to skip")
    args = ap.parse_args()
    art = os.path.join(REPO, "artifacts", args.artifacts)
    os.makedirs(art, exist_ok=True)
    skip = set(args.skip.split(",")) if args.skip else set()
    py = sys.executable

    results = {}

    # 1. lp sweep on validate
    lp_file = os.path.join(art, "beam_length_penalty.json")
    if "lp" not in skip:
        run([py, os.path.join(REPO, "scripts", "beam_lp_sweep.py"), args.ckpt,
             "--beam", str(args.beam), "--penalties", args.penalties,
             "--data-dir", args.data_dir, "--out", lp_file])
    with open(lp_file) as f:
        lp_data = json.load(f)
    best_lp = lp_data["best_penalty"]
    results["best_length_penalty"] = best_lp
    results["test_beam_bestlp_from_sweep"] = lp_data["test"].get(str(best_lp))
    print("best lp:", best_lp, flush=True)

    from img2latex_tpu.training.evaluator import evaluate_checkpoint

    # 2. test beam at best lp
    if "beam" not in skip:
        out = evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split="test",
            beam_size=args.beam, length_penalty=float(best_lp),
            output_dir=os.path.join(art, "predictions_beam_bestlp"),
        )
        results["test_beam_bestlp"] = out

    # 3. gating-signal A/B
    if "signals" not in skip:
        run([py, os.path.join(REPO, "scripts", "selective_signal_ab.py"),
             args.ckpt, "--data-dir", args.data_dir, "--beam-size", str(args.beam),
             "--length-penalty", str(best_lp),
             "--out", os.path.join(art, "selective_signal_ab.json")])
        with open(os.path.join(art, "selective_signal_ab.json")) as f:
            sig = json.load(f)
        best_signal = max(
            sig["signals"],
            key=lambda s: sig["signals"][s]["0.2"]["capture"] or 0,
        )
        results["best_signal_at_frac02"] = best_signal
        print("best signal @0.2:", best_signal, flush=True)
    else:
        best_signal = "logp"

    # 4. live selective path at frac 0.2 with the best signal (product path)
    if "selective" not in skip:
        out = evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split="test",
            beam_size=args.beam, length_penalty=float(best_lp),
            output_dir=os.path.join(art, "predictions_selective02"),
            config_overrides={
                "inference.selective_beam_frac": 0.2,
                "inference.selective_signal": best_signal,
            },
        )
        results["test_selective02"] = out

    # 5. bucketed evaluate
    if "buckets" not in skip:
        widths = [int(b) for b in args.buckets.split(",")]
        out = evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split="test",
            bucket_widths=widths,
            output_dir=os.path.join(art, "predictions_bucketed"),
        )
        results["test_bucketed_greedy"] = out

    # 6. device-cache evaluate — whole-split resident program (one dispatch
    # + one fetch per split, Predictor._decode_split_fn); passes=2 so the
    # artifact carries a measured resident window, not an estimate.
    if "cache" not in skip:
        out = evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split="test",
            output_dir=os.path.join(art, "predictions_devicecache"),
            config_overrides={"data.device_cache": True},
            passes=2,
        )
        results["test_devicecache_greedy"] = out

    with open(os.path.join(art, "post_flagship.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("POST:", json.dumps({k: (v if not isinstance(v, dict) else
          {kk: v[kk] for kk in ("bleu", "images_per_second",
                                "images_per_second_decode_only") if kk in v})
          for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
