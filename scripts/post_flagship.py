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


def run(cmd, retries: int = 2, **kw):
    """Run a battery step; retry on failure (the tunneled backend's remote
    compile service drops connections ~once per multi-hour session — r5
    pipeline run 1) and raise instead of sys.exit so the caller can keep
    running the remaining steps (round 4 lost its whole battery to one
    early exit)."""
    for attempt in range(1, retries + 1):
        print("+", " ".join(cmd), f"(attempt {attempt})", flush=True)
        t0 = time.time()
        r = subprocess.run(cmd, **kw)
        print(f"  -> rc={r.returncode} in {time.time() - t0:.0f}s", flush=True)
        if r.returncode == 0:
            return
        time.sleep(30)
    raise RuntimeError(f"step failed after {retries} attempts: {' '.join(cmd)}")


def attempt(name, results, fn, retries: int = 2):
    """Run an in-process step; on persistent failure record the error and
    CONTINUE with the remaining steps instead of dying."""
    for i in range(1, retries + 1):
        try:
            results[name] = fn()
            return results[name]
        except SystemExit:
            raise
        except Exception as e:  # noqa: BLE001 - transient backend errors
            print(f"step {name} attempt {i} failed: {e!r}", flush=True)
            time.sleep(30)
    results[name] = {"error": f"failed after {retries} attempts"}
    return None


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
        try:
            run([py, os.path.join(REPO, "scripts", "beam_lp_sweep.py"), args.ckpt,
                 "--beam", str(args.beam), "--penalties", args.penalties,
                 "--data-dir", args.data_dir, "--out", lp_file])
        except RuntimeError as e:
            print(f"lp sweep failed ({e}); continuing", flush=True)
    if os.path.exists(lp_file):
        with open(lp_file) as f:
            lp_data = json.load(f)
        best_lp = lp_data["best_penalty"]
        results["test_beam_bestlp_from_sweep"] = lp_data["test"].get(str(best_lp))
    else:
        best_lp = 1.5  # the measured flagship default when the sweep is lost
        results["lp_sweep_error"] = "sweep failed; defaulted lp"
    results["best_length_penalty"] = best_lp
    print("best lp:", best_lp, flush=True)

    from img2latex_tpu.training.evaluator import evaluate_checkpoint

    # 2. test beam at best lp
    if "beam" not in skip:
        attempt("test_beam_bestlp", results, lambda: evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split="test",
            beam_size=args.beam, length_penalty=float(best_lp),
            output_dir=os.path.join(art, "predictions_beam_bestlp"),
        ))

    # 3. gating-signal A/B
    best_signal = "margin"  # shipped default (STATUS.md) if the A/B is lost
    if "signals" not in skip:
        try:
            run([py, os.path.join(REPO, "scripts", "selective_signal_ab.py"),
                 args.ckpt, "--data-dir", args.data_dir, "--beam-size", str(args.beam),
                 "--length-penalty", str(best_lp),
                 "--save-rows", os.path.join(art, "selective_rows.npz"),
                 "--out", os.path.join(art, "selective_signal_ab.json")])
            with open(os.path.join(art, "selective_signal_ab.json")) as f:
                sig = json.load(f)
            best_signal = max(
                (s for s in sig["signals"] if s != "oracle"),
                key=lambda s: sig["signals"][s]["0.2"]["capture"] or 0,
            )
            results["best_signal_at_frac02"] = best_signal
            print("best signal @0.2:", best_signal, flush=True)
        except (RuntimeError, OSError, KeyError, ValueError) as e:
            print(f"signal A/B failed ({e!r}); continuing", flush=True)
            results["signals_error"] = repr(e)

    # 4. live selective path at frac 0.2 with the best signal (product path)
    if "selective" not in skip:
        attempt("test_selective02", results, lambda: evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split="test",
            beam_size=args.beam, length_penalty=float(best_lp),
            output_dir=os.path.join(art, "predictions_selective02"),
            config_overrides={
                "inference.selective_beam_frac": 0.2,
                "inference.selective_signal": best_signal,
            },
        ))

    # 5. bucketed evaluate (passes=2: when the checkpoint config carries
    # data.device_cache the per-bucket whole-split route engages, and a
    # second pass gives the artifact a measured resident window instead of
    # a compile-inclusive-only rate — r5 lesson)
    if "buckets" not in skip:
        widths = [int(b) for b in args.buckets.split(",")]
        attempt("test_bucketed_greedy", results, lambda: evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split="test",
            bucket_widths=widths,
            output_dir=os.path.join(art, "predictions_bucketed"),
            passes=2,
        ))

    # 6. device-cache evaluate — whole-split resident program (one dispatch
    # + one fetch per split, Predictor._decode_split_fn); passes=2 so the
    # artifact carries a measured resident window, not an estimate.
    if "cache" not in skip:
        attempt("test_devicecache_greedy", results, lambda: evaluate_checkpoint(
            args.ckpt, data_dir=args.data_dir, split="test",
            output_dir=os.path.join(art, "predictions_devicecache"),
            config_overrides={"data.device_cache": True},
            passes=2,
        ))

    with open(os.path.join(art, "post_flagship.json"), "w") as f:
        json.dump(results, f, indent=2)
    print("POST:", json.dumps({k: (v if not isinstance(v, dict) else
          {kk: v[kk] for kk in ("bleu", "images_per_second",
                                "images_per_second_decode_only") if kk in v})
          for k, v in results.items()}), flush=True)


if __name__ == "__main__":
    main()
