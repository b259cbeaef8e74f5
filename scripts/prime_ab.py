"""Cache-priming A/B on the real chip (round-4 verdict next-step #3).

Three fresh subprocesses, one artifact:

  1. ``prime``   — AOT-compile the evaluate executables into a NEW
                   compilation cache dir (``img2latex_tpu prime``);
  2. ``primed``  — a fresh-process whole-split evaluate against that cache:
                   its ``compile_and_first_batch_seconds`` is the WARM
                   first-call cost a deployment restart pays after priming;
  3. ``cold``    — (optional, ``--with-cold``) the identical evaluate
                   against an empty cache dir: the unprimed baseline.

Each subprocess is sequential (one TPU user at a time — STATUS.md) and the
children bump ``jax_persistent_cache_min_compile_time_secs`` down to 0 only
on CPU (on the chip the 1 s default already admits every real program).

Usage:
  python scripts/prime_ab.py CKPT --data-dir /tmp/mathtext_hard \
      --batch 1024 --out artifacts/prime_ab.json [--with-cold]
"""

from __future__ import annotations

import argparse
import json
import os
import subprocess
import sys
import tempfile
import time

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

EVAL_CHILD = """
import json, sys
sys.path.insert(0, {repo!r})
from img2latex_tpu.training.evaluator import evaluate_checkpoint
out = evaluate_checkpoint(
    {ckpt!r}, data_dir={data!r}, split={split!r}, batch_size={batch},
    max_batches={max_batches},
    config_overrides={{"data.device_cache": True,
                       "hardware.compilation_cache_dir": {cache!r}}},
    passes=2,
)
print("EVALROW " + json.dumps({{k: out[k] for k in (
    "num_images", "bleu", "compile_and_first_batch_seconds",
    "end_to_end_seconds", "decode_seconds", "setup_seconds",
    "cache_build_seconds", "images_per_second_resident") if k in out}}))
"""


def run_child(code: str, label: str):
    t0 = time.time()
    r = subprocess.run([sys.executable, "-c", code], capture_output=True,
                       text=True)
    wall = time.time() - t0
    row = None
    for line in r.stdout.splitlines():
        if line.startswith("EVALROW "):
            row = json.loads(line[len("EVALROW "):])
    print(f"[{label}] rc={r.returncode} wall={wall:.0f}s", flush=True)
    if r.returncode != 0:
        print(r.stderr[-3000:], flush=True)
        raise SystemExit(f"{label} child failed")
    return {"label": label, "subprocess_wall_seconds": wall, "eval": row,
            "stderr_tail": r.stderr[-500:]}


def cache_stat(d):
    files = bytes_ = 0
    for root, _, fs in os.walk(d):
        for f in fs:
            files += 1
            bytes_ += os.path.getsize(os.path.join(root, f))
    return {"files": files, "bytes": bytes_}


def main() -> None:
    ap = argparse.ArgumentParser()
    ap.add_argument("ckpt")
    ap.add_argument("--data-dir", required=True)
    ap.add_argument("--split", default="test")
    ap.add_argument("--batch", type=int, default=1024)
    ap.add_argument("--max-batches", type=int, default=None)
    ap.add_argument("--split-batches", type=int, default=None,
                    help="n_batches of the whole-split program to prime "
                         "(default: num split images // batch)")
    ap.add_argument("--with-cold", action="store_true")
    ap.add_argument("--out", required=True)
    args = ap.parse_args()

    n_b = args.split_batches
    if n_b is None:
        lst = os.path.join(args.data_dir, f"im2latex_{args.split}_filter.lst")
        n_rows = sum(1 for _ in open(lst))
        if args.max_batches is not None:
            n_rows = min(n_rows, args.max_batches * args.batch)
        n_b = n_rows // args.batch
    cache = tempfile.mkdtemp(prefix="prime_ab_cache_")

    rows = []
    t0 = time.time()
    r = subprocess.run(
        [sys.executable, "-m", "img2latex_tpu", "prime", args.ckpt,
         "--batch-sizes", str(args.batch),
         "--split-batches", str(n_b), "--split-batch-size", str(args.batch),
         "--set", f"hardware.compilation_cache_dir={cache}",
         "--out", os.path.join(cache, "prime_report.json")],
        capture_output=True, text=True, cwd=REPO,
    )
    prime_wall = time.time() - t0
    print(f"[prime] rc={r.returncode} wall={prime_wall:.0f}s", flush=True)
    if r.returncode != 0:
        print(r.stderr[-3000:], flush=True)
        raise SystemExit("prime failed")
    with open(os.path.join(cache, "prime_report.json")) as f:
        prime_report = json.load(f)
    rows.append({"label": "prime", "subprocess_wall_seconds": prime_wall,
                 "report": prime_report, "cache_after": cache_stat(cache)})

    child = EVAL_CHILD.format(
        repo=REPO, ckpt=args.ckpt, data=args.data_dir, split=args.split,
        batch=args.batch, max_batches=args.max_batches, cache=cache,
    )
    rows.append({**run_child(child, "primed"), "cache_after": cache_stat(cache)})

    if args.with_cold:
        cold_cache = tempfile.mkdtemp(prefix="prime_ab_cold_")
        child_cold = EVAL_CHILD.format(
            repo=REPO, ckpt=args.ckpt, data=args.data_dir, split=args.split,
            batch=args.batch, max_batches=args.max_batches, cache=cold_cache,
        )
        rows.append({**run_child(child_cold, "cold"),
                     "cache_after": cache_stat(cold_cache)})

    out = {
        "ckpt": args.ckpt,
        "batch": args.batch,
        "split_batches": n_b,
        "cache_dir": cache,
        "rows": rows,
        "contract": (
            "primed.eval.compile_and_first_batch_seconds is the restart "
            "cost after `img2latex_tpu prime` — it must sit at the warm "
            "(deserialize) bound of artifacts/compile_cache_ab.json, not "
            "the cold remote-compile bound"
        ),
    }
    os.makedirs(os.path.dirname(os.path.abspath(args.out)), exist_ok=True)
    with open(args.out, "w") as f:
        json.dump(out, f, indent=2)
    print("wrote", args.out, flush=True)


if __name__ == "__main__":
    main()
