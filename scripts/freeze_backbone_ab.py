"""Frozen-pretrained-backbone regime A/B (VERDICT r2 #3).

Reproduces the reference's resnet_lstm training regime — load a pretrained
backbone, freeze everything but layer4 + heads
(``/root/reference/img2latex/model/encoder.py:184-210``,
``configs/resnet_lstm.yaml``) — with an internally-sourced backbone (a
trained checkpoint's encoder, ``scripts/extract_backbone.py``), and A/Bs it
against from-scratch training on a FRESH corpus split.  Exercises
``model.encoder.resnet.pretrained_path`` + ``freeze_backbone`` through the
product train CLI, not a unit-test shim.

Arms:
  scratch   — random init, nothing frozen (the r2 flagship recipe)
  frozen    — pretrained backbone, freeze all but layer4 (reference regime)
  finetune  — pretrained backbone, nothing frozen (the natural third arm)

Usage:
  python scripts/freeze_backbone_ab.py --source CKPT --root /tmp/freeze_corpus
      [--train 8192] [--val 1024] [--test 1024] [--epochs 30]
      [--arms scratch,frozen,finetune] [--artifacts freeze_backbone_ab]
"""

from __future__ import annotations

import argparse
import glob
import json
import os
import shutil
import sys
import time

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("--source", required=True, help="trained resnet_lstm checkpoint")
    ap.add_argument("--root", default="/tmp/freeze_corpus")
    ap.add_argument("--workdir", default="/tmp/freeze_ab_run")
    ap.add_argument("--train", type=int, default=8192)
    ap.add_argument("--val", type=int, default=1024)
    ap.add_argument("--test", type=int, default=1024)
    ap.add_argument("--epochs", type=int, default=30)
    ap.add_argument("--seq", type=int, default=141)
    ap.add_argument("--max-tokens", type=int, default=135)
    ap.add_argument("--max-aspect", type=float, default=11.5)
    ap.add_argument("--arms", default="scratch,frozen,finetune")
    ap.add_argument("--artifacts", default="freeze_backbone_ab")
    ap.add_argument("--set", action="append", default=[], dest="extra_sets")
    args = ap.parse_args()

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

    # ---- corpus: FRESH split (different seed than the flagship's) --------
    def _split_ok(name, want):
        p = os.path.join(args.root, f"im2latex_{name}_filter.lst")
        return os.path.exists(p) and sum(1 for _ in open(p)) == want

    if not (_split_ok("train", args.train) and _split_ok("validate", args.val)
            and _split_ok("test", args.test)):
        from img2latex_tpu.data.mathtext import write_mathtext_corpus

        t0 = time.time()
        write_mathtext_corpus(
            args.root, n_train=args.train, n_val=args.val, n_test=args.test,
            seed=20260819,  # flagship used 20260816 — fresh data
            max_tokens=args.max_tokens, length_profile="im2latex",
            max_aspect=args.max_aspect,
        )
        print(f"corpus rendered in {time.time() - t0:.0f}s", flush=True)
    else:
        print("corpus already present, reusing", flush=True)

    # ---- backbone npz from the source checkpoint --------------------------
    os.makedirs(args.workdir, exist_ok=True)
    npz = os.path.join(args.workdir, "backbone.npz")
    if not os.path.exists(npz):
        from extract_backbone import extract
        import numpy as np

        flat = extract(args.source)
        np.savez(npz, **{k: v.astype(np.float32) for k, v in flat.items()})
        print(f"extracted backbone: {len(flat)} arrays", flush=True)

    os.chdir(args.workdir)
    from img2latex_tpu.cli import main as cli

    base_sets = [
        f"data.data_dir={args.root}",
        "data.batch_size=128",
        f"data.max_seq_length={args.seq}",
        "data.augment=false",
        "data.device_cache=true",
        "data.device_cache_grayscale=true",
        "data.eval_batch_size_multiplier=2",
        "data.max_eval_batch_size=256",
        "model.name=resnet_lstm",
        "model.memory=grid",
        "model.embedding_dim=256",
        "model.decoder.hidden_dim=384",
        "model.decoder.dropout=0.2",
        f"inference.max_length={args.seq}",
        f"training.epochs={args.epochs}",
        "training.early_stopping_patience=8",
        "hardware.compute_dtype=bfloat16",
    ]
    arm_sets = {
        "scratch": [],
        "frozen": [
            f"model.encoder.resnet.pretrained_path={npz}",
            "model.encoder.resnet.freeze_backbone=true",
        ],
        "finetune": [f"model.encoder.resnet.pretrained_path={npz}"],
    }

    results = {}
    for arm in args.arms.split(","):
        exp = f"freeze_ab_{arm}"
        argv = ["train"]
        for s in base_sets + arm_sets[arm] + [f"training.experiment_name={exp}"] + args.extra_sets:
            argv += ["--set", s]
        t0 = time.time()
        rc = cli(argv)
        mins = (time.time() - t0) / 60
        print(f"arm {arm}: train rc={rc} in {mins:.1f} min", flush=True)
        if rc != 0:
            sys.exit(rc)
        exp_dir = sorted(glob.glob(os.path.join("outputs", exp + "*")))[-1]
        ckpt = os.path.join(exp_dir, "checkpoints")
        rc = cli(["evaluate", ckpt, "--split", "test", "--output-dir",
                  os.path.join(exp_dir, "predictions_greedy")])
        with open(os.path.join(exp_dir, "predictions_greedy", "predictions.json")) as f:
            metrics = json.load(f)["metrics"]
        with open(os.path.join(exp_dir, "metrics", "metrics.json")) as f:
            curve = json.load(f)
        results[arm] = {
            "test_greedy": {k: metrics[k] for k in ("bleu", "levenshtein", "token_accuracy")},
            "epochs_ran": len(curve.get("steps", {})),
            "train_minutes": round(mins, 1),
            "curve": {
                e: {k: v for k, v in row.items()
                    if k in ("train_loss", "val_loss", "val_accuracy", "val_bleu")}
                for e, row in curve.get("steps", {}).items()
            },
        }

    art = os.path.join(repo, "artifacts", args.artifacts)
    os.makedirs(art, exist_ok=True)
    summary = {
        "question": ("does the reference's frozen-pretrained-backbone regime "
                     "(freeze all but layer4) work end-to-end through the "
                     "product config path, and how does it trade against "
                     "from-scratch and full finetune?"),
        "source_backbone": args.source,
        "corpus": {"train": args.train, "val": args.val, "test": args.test,
                   "seed": 20260819, "note": "fresh split, disjoint seed from the flagship"},
        "recipe": "resnet_lstm grid embed256 hidden384 bf16 device_cache, plateau LR, early-stop 8",
        "arms": results,
    }
    with open(os.path.join(art, "RESULTS.json"), "w") as f:
        json.dump(summary, f, indent=2)
    for arm in results:
        exp_dir = sorted(glob.glob(os.path.join("outputs", f"freeze_ab_{arm}*")))[-1]
        shutil.copy(os.path.join(exp_dir, "metrics", "metrics.json"),
                    os.path.join(art, f"metrics_{arm}.json"))
    print("RESULTS:", json.dumps({a: r["test_greedy"] for a, r in results.items()}))
    print(f"artifacts -> {art}", flush=True)


if __name__ == "__main__":
    main()
